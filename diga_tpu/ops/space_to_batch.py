"""Stage-hoisted space-to-batch for dilated convolution stacks.

A stride-1 conv with dilation ``d`` only ever connects pixels whose
coordinates are congruent mod ``d``.  Splitting the feature map into the
d*d strided subgrids therefore turns the dilated conv into a DENSE 3x3
conv over a (d*d*B)-image batch of (H/d, W/d) maps — and every other op
inside a ResNet stage (1x1 conv, BatchNorm, ReLU, residual add) is
pointwise or per-pixel, so the whole stage commutes with the transform.

XLA's own SpaceToBatchConverter performs this per-convolution, inserting
tiled-layout copies between every block of layer3/layer4 (measured: the
top copy shapes in the warm-up step HLO, ~140 copies over the dilated
stages).  Hoisting the transform to the stage boundary does it ONCE per
stage; the inner convs are plain dense convs that XLA lowers directly to
the MXU with no relayouts.

Semantics: exact.  With H % d == 0 and 'same' zero padding, subgrid-space
padding of (k-1)/2 corresponds 1:1 to original-space padding of
(k-1)/2*d — both read zeros at the same logical taps.  BatchNorm batch
statistics reduce over (batch, H, W), and the transform only permutes
that reduction set.

Reference architecture being accelerated: ResNetMulti layer3 (dilation 2)
/ layer4 (dilation 4), seg_model_noaux.py:230-231.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_batch(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*f*f, H/f, W/f, C]; subgrid (h%f, w%f) major over B.

    Requires H % f == 0 and W % f == 0 (asserted statically).
    """
    b, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, f"spatial {h}x{w} not divisible by {f}"
    # h = i*f + pi, w = j*f + pj  ->  (B, i, pi, j, pj, C)
    x = x.reshape(b, h // f, f, w // f, f, c)
    # -> (B, pi, pj, i, j, C): batch-major B keeps per-image subgrids together
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * f * f, h // f, w // f, c)


def batch_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of ``space_to_batch``."""
    bff, hf, wf, c = x.shape
    assert bff % (f * f) == 0
    b = bff // (f * f)
    x = x.reshape(b, f, f, hf, wf, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # (B, i, pi, j, pj, C)
    return x.reshape(b, hf * f, wf * f, c)
