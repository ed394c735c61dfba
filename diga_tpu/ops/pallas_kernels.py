"""Pallas TPU kernels for the hot fused ops (SURVEY.md §2.4).

``distillation_loss_pallas`` fuses the symmetric-distillation forward
(teacher softmax, student log-softmax, cross-entropy reduce, cross-view
weighting) into one VMEM pass per tile, and supplies a custom VJP that
recomputes softmax from logits instead of saving XLA's softmax residuals
— for the warm-up crop (6 x 512 x 896 x 19 fp32) that removes ~400 MB of
residual HBM traffic per step.

Semantics identical to ops.losses.distillation_loss (reference:
util/loss.py:125-143); the equivalence test diffs both on random tensors.

Layout: class logits live on the lane dimension (K <= 128, zero-padded by
Mosaic); pixels tile the sublane dimension in blocks of ``BLOCK_P`` rows.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_P = 1024  # pixel rows per tile


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _fwd_kernel(t_ref, s_ref, out_ref, acc_ref, *, n_valid, n_blocks):
    """Accumulate sum over pixels of sum_k -softmax(t) * log_softmax(s)."""
    bi = pl.program_id(0)

    @pl.when(bi == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    t = t_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    q = jax.nn.softmax(t, axis=-1)
    ls = jax.nn.log_softmax(s, axis=-1)
    per_pixel = jnp.sum(-q * ls, axis=-1, keepdims=True)  # (BLOCK_P, 1) — 2D for Mosaic
    # mask padded tail rows of the final block
    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_P, 1), 0)
    valid = (bi * BLOCK_P + row) < n_valid
    acc_ref[0, 0] += jnp.sum(jnp.where(valid, per_pixel, 0.0))

    @pl.when(bi == n_blocks - 1)
    def _():
        out_ref[0, 0] = acc_ref[0, 0]


def _ce_sum(teacher_logits: jnp.ndarray, student_logits: jnp.ndarray) -> jnp.ndarray:
    """sum over all pixels of CE(softmax(teacher), student) via Pallas."""
    k = teacher_logits.shape[-1]
    t = teacher_logits.reshape(-1, k)
    s = student_logits.reshape(-1, k)
    n = t.shape[0]
    n_pad = -n % BLOCK_P
    if n_pad:
        t = jnp.pad(t, ((0, n_pad), (0, 0)))
        s = jnp.pad(s, ((0, n_pad), (0, 0)))
    n_blocks = t.shape[0] // BLOCK_P

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid=n, n_blocks=n_blocks),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_P, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=_interpret(),
    )(t, s)
    return out[0, 0]


def _bwd_kernel(t_ref, s_ref, g_ref, ds_ref, *, coeff):
    """d/ds of sum(-softmax(t) * log_softmax(s)) = softmax(s) - softmax(t)."""
    t = t_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    g = g_ref[0, 0]
    ds = (jax.nn.softmax(s, axis=-1) - jax.nn.softmax(t, axis=-1)) * (g * coeff)
    ds_ref[:] = ds.astype(ds_ref.dtype)


def _ce_sum_grad(teacher_logits, student_logits, g, coeff):
    k = teacher_logits.shape[-1]
    shape = student_logits.shape
    t = teacher_logits.reshape(-1, k)
    s = student_logits.reshape(-1, k)
    n = t.shape[0]
    n_pad = -n % BLOCK_P
    if n_pad:
        t = jnp.pad(t, ((0, n_pad), (0, 0)))
        s = jnp.pad(s, ((0, n_pad), (0, 0)))
    n_blocks = t.shape[0] // BLOCK_P
    g2 = jnp.asarray(g, jnp.float32).reshape(1, 1)

    ds = pl.pallas_call(
        functools.partial(_bwd_kernel, coeff=coeff),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_P, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_P, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_P, k), student_logits.dtype),
        interpret=_interpret(),
    )(t, s, g2)
    return ds[:n].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def distillation_loss_pallas(teacher_logits, student_logits, scale=0.5):
    """Fused symmetric cross-view distillation (teacher is stop-gradient).

    Equivalent to ops.losses.distillation_loss: inputs are the 2B-batch
    [clean; augmented] logit stacks.
    """
    b = teacher_logits.shape[0] // 2
    npix = b * math.prod(teacher_logits.shape[1:-1])
    # teacher clean -> student aug (weight 1)
    t0 = _ce_sum(teacher_logits[:b], student_logits[b:]) / npix
    # teacher aug -> student clean (weight scale)
    t1 = _ce_sum(teacher_logits[b:], student_logits[:b]) / npix * scale
    return t0 + t1


def _fwd(teacher_logits, student_logits, scale):
    out = distillation_loss_pallas(teacher_logits, student_logits, scale)
    return out, (teacher_logits, student_logits)


def _bwd(scale, res, g):
    teacher_logits, student_logits = res
    b = teacher_logits.shape[0] // 2
    npix = b * math.prod(teacher_logits.shape[1:-1])
    ds_aug = _ce_sum_grad(teacher_logits[:b], student_logits[b:], g, 1.0 / npix)
    ds_clean = _ce_sum_grad(teacher_logits[b:], student_logits[:b], g, scale / npix)
    ds = jnp.concatenate([ds_clean, ds_aug], axis=0)
    return jnp.zeros_like(teacher_logits), ds


distillation_loss_pallas.defvjp(_fwd, _bwd)
