"""Shape-static resize ops matching torch interpolation semantics.

DiGA's protocol depends on ``align_corners=True`` bilinear resizes
(reference: train_DiGA_gta2city_warm_up.py:173-176,350;
evaluate_val.py:79-84), which ``jax.image.resize`` does not implement.

TPU-first design: bilinear interpolation is expressed as two small dense
matmuls (separable row/column interpolation matrices built at trace time),
which XLA maps straight onto the MXU instead of a VPU-bound gather chain.
The matrices are numpy constants — no dynamic shapes, fully differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(in_size: int, out_size: int, align_corners: bool = True) -> jnp.ndarray:
    """(out_size, in_size) row-interpolation matrix, computed ON DEVICE.

    align_corners=True: src = o * (in-1)/(out-1)
    align_corners=False: src = (o + 0.5) * in/out - 0.5  (clamped)

    Bilinear weights have the closed form relu(1 - |src_o - i|) (the two
    adjacent cells get 1-f and f; everything else is clipped to 0), so the
    matrix is a tiny iota computation instead of a baked numpy constant —
    full-res eval matrices reach 8 MB, which overflowed the remote
    compiler's request limit when embedded as literals.
    """
    if out_size == 1:
        src = jnp.zeros((1,), jnp.float32) if align_corners else jnp.clip(
            jnp.full((1,), 0.5 * in_size - 0.5, jnp.float32), 0, in_size - 1)
    else:
        o = jax.lax.broadcasted_iota(jnp.float32, (out_size, 1), 0)[:, 0]
        if align_corners:
            src = o * ((in_size - 1) / (out_size - 1))
        else:
            src = jnp.clip(o * (in_size / out_size) + (0.5 * in_size / out_size - 0.5),
                           0, in_size - 1)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - i))


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = True,
                    compute_dtype=None) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) arrays via separable matmuls.

    ``compute_dtype=None`` (default) runs the interpolation matmuls in
    fp32 regardless of input dtype: bf16 interpolation WEIGHTS would
    visibly shift eval logits and break mIoU parity, so every
    protocol-level resize (evaluator, losses, pseudo-labels) stays fp32.

    Backbone-INTERNAL resizes under a bf16 compute dtype (HRNet exchange
    units) may pass ``compute_dtype=jnp.bfloat16``: inputs/weights in
    bf16 with fp32 MXU accumulation (``preferred_element_type``).  This
    avoids materializing an f32 copy of the activation and the
    f32<->bf16 tile-layout conversion copies around every fuse unit
    (measured on the semiseg step trace); the ~2^-8 relative weight
    error is within the bf16 compute noise the network already carries.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x[0] if squeeze else x
    dtype = x.dtype
    cd = jnp.float32 if compute_dtype is None else compute_dtype
    xf = x.astype(cd)
    # HIGHEST keeps fp32 MXU accumulation in the f32 path; for bf16
    # inputs the accumulator is pinned via preferred_element_type instead
    prec = jax.lax.Precision.HIGHEST
    kw = dict(precision=prec, preferred_element_type=jnp.float32)
    if h != oh:
        Ah = _interp_matrix(h, oh, align_corners).astype(cd)
        xf = jnp.einsum("oh,bhwc->bowc", Ah, xf, **kw).astype(cd)
    if w != ow:
        Aw = _interp_matrix(w, ow, align_corners).astype(cd)
        xf = jnp.einsum("ow,bhwc->bhoc", Aw, xf, **kw).astype(cd)
    out = xf.astype(dtype)
    return out[0] if squeeze else out


@functools.lru_cache(maxsize=256)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') index rule: floor(o * in/out)."""
    o = np.arange(out_size, dtype=np.float64)
    idx = np.floor(o * (in_size / out_size)).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize for label/mask arrays.  Works on (..., H, W) or NHWC.

    For (B, H, W) int labels the trailing dims are H, W.  For NHWC float
    images pass ``channels_last=True`` via ``resize_nearest_nhwc``.
    """
    oh, ow = out_hw
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (oh, ow):
        return x
    ih = jnp.asarray(_nearest_index(h, oh))
    iw = jnp.asarray(_nearest_index(w, ow))
    out = jnp.take(x, ih, axis=-2)
    return jnp.take(out, iw, axis=-1)


def resize_nearest_nhwc(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize for NHWC tensors (e.g. decoder 2x upsampling)."""
    oh, ow = out_hw
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (oh, ow):
        return x
    ih = jnp.asarray(_nearest_index(h, oh))
    iw = jnp.asarray(_nearest_index(w, ow))
    out = jnp.take(x, ih, axis=-3)
    return jnp.take(out, iw, axis=-2)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample of NHWC (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
