from . import label_maps, synthetic
from .datasets import (
    SegDataset,
    bdd_dataset,
    cityscapes_dataset,
    collate,
    EpochShuffleSampler,
    gta5_dataset,
    mapillary_dataset,
    read_list,
    synthia_dataset,
)
from .normalize import IMG_MEAN_BGR, denormalize_image, normalize_image
from .pipeline import BatchLoader, device_prefetch
from .transforms import (
    CenterCrop,
    Compose,
    RandomCrop,
    RandomHorizontallyFlip,
    RandomSizedAndCrop,
)
