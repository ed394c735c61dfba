"""Auxiliary tensor utilities (reference C22, util/utils.py misc).

These round out the reference's utility surface: clamped one-hot labels,
FDA-style Fourier amplitude exchange, adaptive instance normalization,
CutMix boxes, and block masking.  All fixed-shape and jittable; the
random pieces take explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE = 255


def label_one_hot(labels: jnp.ndarray, num_classes: int = 19) -> jnp.ndarray:
    """(B, H, W) labels -> (B, H, W, C) clamped one-hot in [1e-4, 1].

    reference: util/utils.py:118-123 (ignore rows become all-1e-4).
    """
    ids = jnp.where(labels == IGNORE, num_classes, labels)
    oh = jax.nn.one_hot(ids, num_classes + 1, dtype=jnp.float32)[..., :num_classes]
    return jnp.clip(oh, 1e-4, 1.0)


def fourier_exchange(src: jnp.ndarray, trg: jnp.ndarray, L: float = 0.01) -> jnp.ndarray:
    """FDA: swap the low-frequency FFT amplitude corners of src with trg.

    NHWC images; returns src-content/trg-style composite (reference:
    util/utils.py:222-253, corner-window rule :213-220).
    """
    x = jnp.moveaxis(src.astype(jnp.float32), -1, 1)  # NCHW for fft over (-2,-1)
    y = jnp.moveaxis(trg.astype(jnp.float32), -1, 1)
    fx = jnp.fft.fftn(x, axes=(-2, -1))
    fy = jnp.fft.fftn(y, axes=(-2, -1))
    amp_x, pha_x = jnp.abs(fx), jnp.angle(fx)
    amp_y = jnp.abs(fy)

    _, _, h, w = x.shape
    b = int(jnp.floor(min(h, w) * L))
    if b > 0:
        mask = jnp.zeros((h, w), bool)
        mask = mask.at[:b, :b].set(True).at[:b, w - b:].set(True)
        mask = mask.at[h - b:, :b].set(True).at[h - b:, w - b:].set(True)
        amp_x = jnp.where(mask, amp_y, amp_x)
    out = jnp.fft.ifftn(amp_x * jnp.exp(1j * pha_x), axes=(-2, -1)).real
    return jnp.moveaxis(out, 1, -1).astype(src.dtype)


def calc_mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """Per-image per-channel spatial mean/std of NHWC features
    (reference: util/utils.py:195-203)."""
    mean = jnp.mean(feat, axis=(1, 2), keepdims=True)
    var = jnp.var(feat, axis=(1, 2), keepdims=True)
    return mean, jnp.sqrt(var + eps)


def adaptive_instance_normalization(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """AdaIN: re-style content features with style statistics
    (reference: util/utils.py:184-193)."""
    c_mean, c_std = calc_mean_std(content)
    s_mean, s_std = calc_mean_std(style)
    return (content - c_mean) / c_std * s_std + s_mean


def rand_bbox(rng: jax.Array, hw: tuple[int, int], lam: float = 0.5):
    """CutMix box (x1, y1, x2, y2) with area ratio sqrt(1-lam)
    (reference: util/utils.py:166-182).  Static shapes: returns a float
    mask instead of Python ints so it composes under jit."""
    h, w = hw
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cut_w = (w * cut_rat).astype(jnp.int32)
    kx, ky = jax.random.split(rng)
    cx = jax.random.randint(kx, (), 0, w)
    cy = jax.random.randint(ky, (), 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)).astype(jnp.float32)
    return mask


def generate_block_mask(rng: jax.Array, shape_bhw: tuple[int, int, int],
                        block: int = 64, ratio: float = 0.5) -> jnp.ndarray:
    """Random block (patch) mask, nearest-upsampled to full resolution
    (reference: util/utils.py:74-81).  Returns (B, H, W) float 0/1."""
    b, h, w = shape_bhw
    gh, gw = max(1, round(h / block)), max(1, round(w / block))
    coarse = (jax.random.uniform(rng, (b, gh, gw)) > ratio).astype(jnp.float32)
    from .resize import resize_nearest

    return resize_nearest(coarse, (h, w))
