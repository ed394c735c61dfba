"""Pallas GroupNorm for the inference path.

Eval-step attribution (docs/PERF.md) shows the two-scale evaluator's
single biggest non-conv cost is the six ASPP-head GroupNorm stat
reductions: XLA lowers each to a ``convert_reduce_fusion`` running at
~30-50 GB/s on the batch-1 odd-spatial eval shapes — ~18 ms of the
~60 ms/img forward.  This module reimplements the same math
(ops/stats.sums_and_squares + the group fold in
models/resnet_deeplab.FusedGroupNorm) as two Pallas passes that stream
the activation through VMEM at HBM bandwidth:

  1. ``_stats_kernel``: per-channel (Σx, Σx²) with f32 accumulators,
     pixels tiled on the sublane axis, channels on the lanes (native
     NHWC — no transpose);
  2. tiny [b, c] group fold in plain jnp (identical formula to
     FusedGroupNorm, epsilon 1e-5 = torch nn.GroupNorm, reference
     seg_model_noaux.py:140-214);
  3. ``_norm_kernel``: y = x * mul + add with the per-(image, channel)
     vectors broadcast from VMEM.

Forward-only (no custom VJP): wired into the inference/eval model as an
OPT-IN (``DeepLabV2(gn_impl='pallas')`` / ``--extra eval_gn_impl=pallas``)
— the train step keeps the XLA form, whose backward XLA already fuses
well.  Equivalence vs FusedGroupNorm is pinned by
tests/test_pallas_kernels.py::TestPallasGroupNorm.

MEASURED A/B (v5e, two-scale 1024x2048 eval): 71.3 ms/img vs 62.6 for
the XLA form — the Pallas pair streams the activation through HBM twice
(stats pass + normalize pass), while XLA's seemingly-slow stat reduce is
followed by a normalize that FUSES into its consumers, so the activation
is only re-read once.  Kept opt-in as the measured record of the attempt
(docs/PERF.md "measured dead ends"); a win here would need a single
fused stats+normalize kernel with the whole (image, group) slab resident
in VMEM, which the 256-channel head tensors at full-res eval exceed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 1024  # pixel rows per tile (x c channels on the lanes)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stats_kernel(x_ref, s_ref, s2_ref, *, n_valid):
    """Accumulate per-channel (Σx, Σx²) over pixel-row blocks."""
    bi = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)  # [BLOCK_ROWS, c]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = (bi * BLOCK_ROWS + row) < n_valid
    x = jnp.where(valid, x, 0.0)
    ps = jnp.sum(x, axis=0, keepdims=True)        # [1, c]
    ps2 = jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(bi == 0)
    def _():
        s_ref[:] = ps
        s2_ref[:] = ps2

    @pl.when(bi > 0)
    def _():
        s_ref[:] += ps
        s2_ref[:] += ps2


def _norm_kernel(x_ref, mul_ref, add_ref, o_ref):
    o_ref[:] = x_ref[:] * mul_ref[:] + add_ref[:]


def _channel_stats(x2d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Σx, Σx²) per channel of a [rows, c] tensor, f32 accumulation."""
    n, c = x2d.shape
    n_pad = -n % BLOCK_ROWS
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)))
    n_blocks = x2d.shape[0] // BLOCK_ROWS
    s, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, n_valid=n),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2d)
    return s[0], s2[0]


def _apply_affine(x2d: jnp.ndarray, mul: jnp.ndarray, add: jnp.ndarray) -> jnp.ndarray:
    """x * mul + add with [1, c] row vectors, streamed through VMEM."""
    n, c = x2d.shape
    n_pad = -n % BLOCK_ROWS
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)))
    n_blocks = x2d.shape[0] // BLOCK_ROWS
    y = pl.pallas_call(
        _norm_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, c), x2d.dtype),
        interpret=_interpret(),
    )(x2d, mul, add)
    return y[:n]


def group_norm_pallas(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      num_groups: int = 32, epsilon: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC ``x`` — same math as FusedGroupNorm.__call__.

    scale/bias are the per-channel affine params (f32).  Normalization
    arithmetic stays in ``x.dtype`` with f32 scalars, exactly like the
    XLA form.
    """
    b, h, w, c = x.shape
    g = num_groups
    cg = c // g
    n = float(h * w * cg)
    outs = []
    for i in range(b):  # batch-1 eval path; tiny static loop otherwise
        x2d = x[i].reshape(h * w, c)
        s_c, s2_c = _channel_stats(x2d)
        mu = jnp.sum(s_c.reshape(g, cg), axis=-1) / n           # [g]
        var = jnp.maximum(jnp.sum(s2_c.reshape(g, cg), axis=-1) / n - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + epsilon)                       # [g]
        mu_c = jnp.repeat(mu, cg)                                # [c]
        inv_s = jnp.repeat(inv, cg) * scale
        mul = inv_s.astype(x.dtype).reshape(1, c)
        add = (bias - mu_c * inv_s).astype(x.dtype).reshape(1, c)
        outs.append(_apply_affine(x2d, mul, add).reshape(h, w, c))
    return jnp.stack(outs, axis=0)
