from .ema import ema_alpha, ema_update
from .losses import (
    cross_entropy2d,
    cross_entropy2d_valid_mean,
    distillation_loss,
    l1_loss,
    laplacian2d,
    lsgan_d_loss,
    lsgan_g_loss,
    ohem_cross_entropy,
    seg_edge_loss,
)
from .metrics import RunningScore, confusion_update, scores_from_confusion
from .mixing import crdomix, dacs_crossmix, sample_half_classes, selection_to_pixel_mask
from .photometric import diga_photometric, gaussian_blur, photometric_chain
from .prototypes import (
    Centroids,
    bilateral_consensus,
    centroid_distance,
    centroid_weight,
    masked_class_means,
    update_centroids,
)
from .resize import (
    resize_bilinear,
    resize_nearest,
    resize_nearest_nhwc,
    upsample2x_nearest,
)
