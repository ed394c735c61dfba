"""diga_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for domain-adaptive,
domain-generalized, and semi-supervised semantic segmentation.

Re-designed from scratch with the capability surface of fy-vision/DiGA
(CVPR 2023): stage-wise training with an image-domain translator,
symmetric-distillation warm-up, prototype-based threshold-free pseudo-label
self-training, and two-scale max-merge evaluation.

Layout conventions (TPU-first, not a port):
  * images are NHWC float32/bfloat16, BGR, mean-subtracted, /128 scaled
    (matching the reference protocol: reference CityLoader.py:104-107)
  * labels are (B, H, W) int32 trainIds with 255 = ignore
  * all train-step compute runs inside a single jitted function over a
    1-axis ``jax.sharding.Mesh('data')``; BN stats and gradients reduce
    across the mesh automatically under GSPMD.
"""

__version__ = "0.1.0"
