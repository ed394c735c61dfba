"""Shared normalization modules that avoid f32 activation materialization.

``flax.linen.BatchNorm`` computes its batch statistics on an f32 *cast*
of the activation; under a bf16 compute dtype XLA materializes that f32
copy (the cast feeds both the mean and the mean-of-squares reductions).
Measured in the warm-up step trace as multi-ms ``multiply_convert_fusion``
ops emitting f32 activation-sized tuples for every train-mode BN in the
stem/layer1/layer2 of the DeepLab backbone (and every BN in HRNet).

``BatchNorm2D`` below is a drop-in replacement with the exact variable
layout of ``nn.BatchNorm`` (params ``scale``/``bias``, batch_stats
``mean``/``var``, all f32) whose statistics come from
``ops.stats.sums_and_squares`` — two reductions over the ORIGINAL bf16
tensor with f32 accumulators, so no activation-sized f32 tensor is ever
created.  Formulas match torch ``_BatchNorm`` exactly: biased batch variance
(use_fast_variance form E[x²]−E[x]²) for normalization, UNBIASED
variance (Bessel factor n/(n−1)) stored in the running stats, running
stats lerped with ``momentum`` (flax convention: torch momentum 0.1 ==
flax 0.9), eps inside the rsqrt.  This differs from flax's
``nn.BatchNorm`` (which stores the biased var) — torch semantics are
what the reference's eval-mode BN consumes.

The optional ``mask`` (+ static ``n_valid``) restricts statistics to
valid positions of a zero-padded feature map and re-zeroes pads on the
way out — used by the space-to-batch path (ops/space_to_batch.py) where
grids are padded to a multiple of the dilation factor; masking keeps the
padded computation equal (to float tolerance) to the dilated original.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BatchNorm2D(nn.Module):
    """BatchNorm over NHWC axis (0,1,2); nn.BatchNorm variable layout.

    ``features`` (optional) is the LOGICAL channel count when the input
    arrives physically zero-padded on the channel axis (the HRNet branch
    channel-padding knob, models/hrnet_ocr.py ``pad_to``): variables keep
    the logical size so checkpoints are layout-independent; at apply the
    affine/stats are zero-padded functionally (scale 0, bias 0, mean 0,
    var 1), which maps padded channels to exactly 0 and leaves valid
    channels bit-compatible with the unpadded module.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    features: int | None = None

    @nn.compact
    def __call__(self, x, train: bool, mask: jnp.ndarray | None = None,
                 n_valid: float | None = None):
        c_phys = x.shape[-1]
        c = self.features if self.features is not None else c_phys
        dp = c_phys - c  # physical zero-padding on the channel axis
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if mask is not None and n_valid is None:
            # a masked call MUST say how many positions are valid; dividing
            # by the padded count would silently shrink the statistics
            raise ValueError("BatchNorm2D: mask requires n_valid")
        if train:
            from jax.ad_checkpoint import checkpoint_name

            from ..ops.stats import sums_and_squares

            s, s2 = sums_and_squares(x, (0, 1, 2), mask)
            if n_valid is None:
                n_valid = float(x.shape[0] * x.shape[1] * x.shape[2])
            mean = s / n_valid
            var = jnp.maximum(s2 / n_valid - mean * mean, 0.0)
            # named for remat policies: saving these (C,)-sized stats lets
            # a policy'd nn.remat skip re-reducing the full activation in
            # the backward recompute (see HRNet.remat_policy).  A no-op
            # identity under no/plain remat.
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
            if not self.is_initializing():
                m = self.momentum
                # torch _BatchNorm stores the UNBIASED variance (n/(n-1))
                # in running_var while normalizing with the biased one
                # (seg_model_noaux.py:63-76 consumes these in eval mode).
                # n_valid is a Python float at the call sites, but under
                # nn.remat it arrives as a TRACER (jax.checkpoint treats
                # all array-like args as dynamic), so the factor must be
                # computed trace-safely; XLA constant-folds it whenever
                # n_valid is concrete.
                n = jnp.asarray(n_valid, jnp.float32)
                bessel = jnp.where(n > 1.0, n / jnp.maximum(n - 1.0, 1.0), 1.0)
                # batch stats were reduced at the PHYSICAL width; only the
                # logical slice is stored (padded channels are all-zero)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean[:c]
                ra_var.value = m * ra_var.value + (1 - m) * var[:c] * bessel
        else:
            mean, var = ra_mean.value, ra_var.value

        scale_a, bias_a = scale, bias
        if dp:
            if mean.shape[0] != c_phys:  # eval mode: stored stats are logical
                mean = jnp.pad(mean, (0, dp))
                var = jnp.pad(var, (0, dp), constant_values=1.0)
            scale_a = jnp.pad(scale, (0, dp))
            bias_a = jnp.pad(bias, (0, dp))
        y = (x - mean.astype(self.dtype)) * (
            jax.lax.rsqrt(var + self.epsilon).astype(self.dtype)
            * scale_a.astype(self.dtype)
        ) + bias_a.astype(self.dtype)
        if mask is not None:
            # keep the "pads are zero before every 3x3 conv" invariant
            # (1x1 convs and relu preserve zeros; BN does not)
            y = y * mask.astype(y.dtype)
        return y
