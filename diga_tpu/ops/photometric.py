"""On-device photometric augmentation (the reference's kornia chain).

The reference builds kornia Sequential(ColorJitter(b=.4,c=.4,s=.2,h=.1,
p=.5), RandomGrayscale(p=.3), RandomGaussianBlur(3x3, sigma=2, p=.8),
RandomSharpness(.5, p=.3)) and blends ``beta*norm(aug(x)) + (1-beta)*x``
(reference: train_DiGA_gta2city_warm_up.py:105-111,233).

Here the chain runs INSIDE the jitted train step on device: the whole
augmentation fuses into a handful of VPU passes, instead of the
reference's separate kornia kernel launches and host round-trips.

Design deviation (documented): the reference feeds kornia tensors in the
model's normalized space, where kornia's [0,1]-image assumptions are
off-distribution.  We de-normalize to unit RGB, apply photometric ops in
their natural space, and re-normalize — same augmentation family and
strengths, but with well-defined semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.normalize import IMG_MEAN_BGR

# model space: BGR, (x*255-ish - mean)/128
_MEAN = jnp.asarray(np.asarray(IMG_MEAN_BGR) / 255.0)  # BGR in unit space

# luma weights in BGR channel order
_GRAY_W_BGR = jnp.asarray([0.114, 0.587, 0.299])


def to_unit(x_norm: jnp.ndarray) -> jnp.ndarray:
    """model space -> unit BGR [~0,1]."""
    return (x_norm * 128.0 / 255.0) + _MEAN


def to_model(x_unit: jnp.ndarray) -> jnp.ndarray:
    return (x_unit - _MEAN) * (255.0 / 128.0)


def _rgb_from_bgr(x):
    return x[..., ::-1]


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rangec = maxc - minc
    s = jnp.where(maxc > 0, rangec / jnp.maximum(maxc, 1e-8), 0.0)
    safe_range = jnp.maximum(rangec, 1e-8)
    rc = (maxc - r) / safe_range
    gc = (maxc - g) / safe_range
    bc = (maxc - b) / safe_range
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(rangec == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _gauss_kernel(ksize: int, sigma: float) -> np.ndarray:
    ax = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _gauss_kernel_2d(ksize: int, sigma: float) -> np.ndarray:
    k = _gauss_kernel(ksize, sigma)
    return np.outer(k, k)


def gaussian_blur(x: jnp.ndarray, ksize: int = 3, sigma: float = 2.0) -> jnp.ndarray:
    """Depthwise gaussian blur on NHWC with reflect padding."""
    c = x.shape[-1]
    k2 = jnp.asarray(_gauss_kernel_2d(ksize, sigma))
    kern = jnp.zeros((ksize, ksize, 1, c), x.dtype).at[:, :, 0, :].set(k2[..., None])
    pad = ksize // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _per_image(p_apply, rng, b):
    return jax.random.uniform(rng, (b, 1, 1, 1)) < p_apply


def photometric_chain(
    x_unit_bgr: jnp.ndarray,
    rng: jax.Array,
    *,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.2,
    hue: float = 0.1,
    p_jitter: float = 0.5,
    p_gray: float = 0.3,
    p_blur: float = 0.8,
    p_sharp: float = 0.3,
    sharpness: float = 0.5,
    with_sharpness: bool = True,
) -> jnp.ndarray:
    """Apply the DiGA photometric stack to a unit-range BGR NHWC batch."""
    b = x_unit_bgr.shape[0]
    keys = jax.random.split(rng, 10)
    x = x_unit_bgr

    # --- color jitter (per-image random order approximated as fixed order) ---
    apply_j = _per_image(p_jitter, keys[0], b)
    bf = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    cf = jax.random.uniform(keys[2], (b, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    sf = jax.random.uniform(keys[3], (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    hf = jax.random.uniform(keys[4], (b, 1, 1, 1), minval=-hue, maxval=hue)

    xj = jnp.clip(x * bf, 0.0, 1.0)
    mean_gray = jnp.mean(
        jnp.sum(xj * _GRAY_W_BGR, axis=-1, keepdims=True), axis=(1, 2), keepdims=True
    )
    xj = jnp.clip((xj - mean_gray) * cf + mean_gray, 0.0, 1.0)
    gray = jnp.sum(xj * _GRAY_W_BGR, axis=-1, keepdims=True)
    xj = jnp.clip(gray + (xj - gray) * sf, 0.0, 1.0)
    hsv = _rgb_to_hsv(_rgb_from_bgr(xj))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hf[..., 0]) % 1.0)
    xj = _rgb_from_bgr(_hsv_to_rgb(hsv))
    x = jnp.where(apply_j, xj, x)

    # --- random grayscale ---
    apply_g = _per_image(p_gray, keys[5], b)
    gray3 = jnp.sum(x * _GRAY_W_BGR, axis=-1, keepdims=True) * jnp.ones_like(x)
    x = jnp.where(apply_g, gray3, x)

    # --- gaussian blur ---
    apply_b = _per_image(p_blur, keys[6], b)
    x = jnp.where(apply_b, gaussian_blur(x, 3, 2.0), x)

    # --- "sharpness" (kornia-0.5.8 semantics: blend TOWARD the 3x3-smoothed
    # degenerate image, f~U(0,.5) — i.e. a mild local smoothing, not a
    # sharpen; kornia's _blend_one(input, degenerate, f) = input +
    # f*(degenerate-input)) ---
    if with_sharpness:
        apply_s = _per_image(p_sharp, keys[7], b)
        factor = jax.random.uniform(keys[8], (b, 1, 1, 1), minval=0.0, maxval=sharpness)
        smooth = jnp.clip(gaussian_blur(x, 3, 1.0), 0.0, 1.0)
        sharp = x + (smooth - x) * factor
        x = jnp.where(apply_s, sharp, x)

    return x


def kornia_photometric_chain(x: jnp.ndarray, rng: jax.Array, *,
                             p_jitter: float = 0.5,
                             with_sharpness: bool = True) -> jnp.ndarray:
    """Reference-faithful variant: the kornia-0.5.8 chain applied DIRECTLY
    to model-normalized tensors, like the reference does (warm_up.py:105-111
    feeds ``sdatav`` — BGR, (raw-mean)/128, range ~[-2, 1.2] — straight
    into kornia ops that assume unit-range RGB).

    Reconstructed kornia 0.5.8 semantics (kornia/enhance/adjust.py +
    augmentation generators; kornia itself is not installable here):
      * ColorJitter(0.4, 0.4, 0.2, 0.1, p=.5): per-forward RANDOM ORDER of
        the four jitters; brightness ADDITIVE f~U(-.4,.4) then clamp[0,1];
        contrast multiplicative f~U(.6,1.4) then clamp[0,1]; saturation /
        hue via HSV on the channel order AS GIVEN (i.e. kornia's "R" is
        this pipeline's B — the reference never flips), no clamp.
      * RandomGrayscale(p=.3): (.299,.587,.114) dotted with the (BGR!)
        channels as given.
      * RandomGaussianBlur((3,3),(2,2),p=.8): reflect border, no clamp.
      * RandomSharpness(.5, p=.3): degenerate = 3x3
        [[1,1,1],[1,5,1],[1,1,1]]/13 conv CLAMPED to [0,1]; interior
        pixels blended TOWARD it — kornia's _blend_one(input, result, f)
        is out = x + f*(degenerate - x) with f~U(0,.5) (a mild smoothing,
        not a sharpen — kornia 0.5.8 swaps the PIL/TF blend argument
        order), border rows/cols kept, no clamp on the blend result.
    The clamps to [0,1] on a ~[-2,1.2]-range input are exactly the
    off-distribution behavior ops/photometric.py's default avoids; this
    variant exists to reproduce the reference bit-for-bit in spirit for
    parity runs (StepConfig.photometric='kornia').
    """
    b = x.shape[0]
    keys = jax.random.split(rng, 12)

    bf = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=-0.4, maxval=0.4)
    cf = jax.random.uniform(keys[2], (b, 1, 1, 1), minval=0.6, maxval=1.4)
    sf = jax.random.uniform(keys[3], (b, 1, 1, 1), minval=0.8, maxval=1.2)
    hf = jax.random.uniform(keys[4], (b, 1, 1, 1), minval=-0.1, maxval=0.1)

    def j_brightness(v):
        return jnp.clip(v + bf, 0.0, 1.0)

    def j_contrast(v):
        return jnp.clip(v * cf, 0.0, 1.0)

    def j_saturation(v):
        hsv = _rgb_to_hsv(v)
        hsv = hsv.at[..., 1].set(hsv[..., 1] * sf[..., 0])
        return _hsv_to_rgb(hsv)

    def j_hue(v):
        hsv = _rgb_to_hsv(v)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + hf[..., 0]) % 1.0)
        return _hsv_to_rgb(hsv)

    # random order of the four jitters, shared across the batch (kornia
    # samples one torch.randperm(4) per forward)
    order = jax.random.permutation(keys[0], 4)
    xj = x
    for slot in range(4):
        xj = jax.lax.switch(order[slot],
                            [j_brightness, j_contrast, j_saturation, j_hue], xj)
    x = jnp.where(_per_image(p_jitter, keys[5], b), xj, x)

    # grayscale with RGB weights on the as-given (BGR) channels
    w_as_given = jnp.asarray([0.299, 0.587, 0.114])
    gray3 = jnp.sum(x * w_as_given, axis=-1, keepdims=True) * jnp.ones_like(x)
    x = jnp.where(_per_image(0.3, keys[6], b), gray3, x)

    x = jnp.where(_per_image(0.8, keys[7], b), gaussian_blur(x, 3, 2.0), x)

    # kornia-0.5.8 "sharpness": blend toward the CLAMPED degenerate image
    # (out = x + f*(degenerate - x)), interior only, no clamp on the blend
    if with_sharpness:
        factor = jax.random.uniform(keys[9], (b, 1, 1, 1), minval=0.0, maxval=0.5)
        k_sharp = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
        c = x.shape[-1]
        kern = jnp.zeros((3, 3, 1, c), x.dtype).at[:, :, 0, :].set(k_sharp[..., None])
        degenerate = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        degenerate = jnp.clip(degenerate, 0.0, 1.0)
        sharp = x + factor * (degenerate - x)
        interior = jnp.zeros(x.shape[1:3], bool).at[1:-1, 1:-1].set(True)
        sharp = jnp.where(interior[None, :, :, None], sharp, x)
        x = jnp.where(_per_image(0.3, keys[8], b), sharp, x)
    return x


def diga_photometric(x_norm: jnp.ndarray, rng: jax.Array, beta: float,
                     variant: str = "diga", *, p_jitter: float = 0.5,
                     with_sharpness: bool = True) -> jnp.ndarray:
    """Full reference behavior: blend the augmented view at strength beta.

    reference: sdatav_aug = beta * norm(extra_aug(x)) + (1-beta) * x
    (train_DiGA_gta2city_warm_up.py:233, beta 0.4 warm-up / 0.3 ST), with
    norm = (v - 0.5) / 0.5 (utils.py:142-156, mean=std=0.5).

    ``variant='diga'`` (default): well-defined-space chain — de-normalize
    to unit BGR, augment, re-normalize to model space (the documented
    deviation).  ``variant='kornia'``: the reference-faithful chain on the
    normalized tensor itself, including the trailing 2x-1 "norm".

    Per-stage knobs (reference deltas): ``p_jitter`` — Synthia warm-up uses
    ColorJitter p=0.7 (Synthia/...warm_up.py:108), everything else 0.5;
    ``with_sharpness`` — the DG chain comments RandomSharpness out
    (train_DiGA_DG.py:114), all other stages include it.
    """
    x32 = x_norm.astype(jnp.float32)
    if variant == "kornia":
        aug = kornia_photometric_chain(x32, rng, p_jitter=p_jitter,
                                       with_sharpness=with_sharpness)
        return beta * (2.0 * aug - 1.0) + (1.0 - beta) * x32
    unit = jnp.clip(to_unit(x32), 0.0, 1.0)
    aug = photometric_chain(unit, rng, p_jitter=p_jitter,
                            with_sharpness=with_sharpness)
    return beta * to_model(aug) + (1.0 - beta) * x32
