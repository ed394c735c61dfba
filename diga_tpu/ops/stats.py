"""Normalization statistics without f32 activation materialization.

Computing mean and mean-of-squares over an f32 *cast* of a bf16
activation makes XLA materialize the f32 copy (the cast feeds two
consumers) — measured as multi-ms ``convert_multiply_fusion`` ops
producing f32 activation-sized tuples in the warm-up step trace.

Instead, both reductions consume the ORIGINAL bf16 tensor (already
resident) with f32 accumulators: the square is computed in the input
dtype and fuses into the reduce's input fusion, so no new activation-
sized tensor exists.  Precision: at f32 compute this is bit-identical
to the cast-first form; at bf16 compute the squares lose ~2^-9 relative
precision before the f32 accumulation — below bf16's own quantization
noise on the normalized output.

(A variadic single-pass ``lax.reduce`` emitting (Σx, Σx²) was measured
at ~2x total step time on the v5e remote compiler — it lowers to a
generic reduction loop, not the vectorized add-reduce.  Don't retry.)

Reductions stay in native NHWC layout (channels in the lanes); group /
instance shaping happens on the tiny per-channel results afterwards.
"""

from __future__ import annotations

import jax.numpy as jnp


def sums_and_squares(x: jnp.ndarray, axes: tuple[int, ...],
                     mask: jnp.ndarray | None = None):
    """(Σx, Σx²) over ``axes`` with f32 accumulation.

    ``mask`` (broadcastable, {0,1}) zeroes invalid positions first — exact
    in any float dtype.
    """
    if mask is not None:
        x = x * mask.astype(x.dtype)
    s = jnp.sum(x, axis=axes, dtype=jnp.float32)
    s2 = jnp.sum(x * x, axis=axes, dtype=jnp.float32)
    return s, s2
