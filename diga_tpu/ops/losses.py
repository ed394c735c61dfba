"""Segmentation / distillation / GAN losses.

All losses take NHWC logits and (B, H, W) int labels with 255 = ignore,
and are pure jittable functions.  Reference semantics:
  * cross_entropy2d        — util/loss.py:48-62
  * distillation_loss      — util/loss.py:125-143
  * OhemCrossEntropy       — util/loss.py:65-122
  * LSGAN / L1 / seg-edge  — train_domain_translator.py:262-325, loss.py:206-229
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE = 255


def _nll_map(logits: jnp.ndarray, labels: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel negative log-likelihood of the true class + valid mask.

    Implemented as a one-hot masked reduce, NOT take_along_axis: on TPU
    the gather (and its scatter backward) dominated the whole loss-side
    cost in the step profile; the one-hot select is a fused VPU pass.
    """
    k = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != IGNORE
    oh = jax.nn.one_hot(jnp.where(valid, labels, k), k, dtype=logp.dtype)
    nll = -jnp.sum(oh * logp, axis=-1)
    return nll, valid


def cross_entropy2d(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Masked 2D cross entropy.

    Faithful to the reference normalization (util/loss.py:56-62): the sum
    of NLL over *valid* pixels is divided by the count of ALL pixels
    (``mask = target >= 0`` passes everything, ignored or not).
    """
    nll, valid = _nll_map(logits, labels)
    return jnp.sum(nll) / labels.size


def cross_entropy2d_valid_mean(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CE averaged over valid pixels only (the textbook normalization)."""
    nll, valid = _nll_map(logits, labels)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def distillation_loss(
    teacher_logits: jnp.ndarray, student_logits: jnp.ndarray, scale: float = 0.5
) -> jnp.ndarray:
    """Symmetric cross-view map distillation.

    Inputs are the concatenated two-view batch [clean; augmented] of size
    2B.  Teacher soft targets from one view supervise the student's other
    view; the augmented->clean direction is down-weighted by ``scale``
    (reference: util/loss.py:125-143).
    """
    q = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    q = jax.lax.stop_gradient(q)
    logp = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    b2 = teacher_logits.shape[0]
    b = b2 // 2
    q0, q1 = q[:b], q[b:]
    s0, s1 = logp[:b], logp[b:]
    # teacher clean -> student aug (weight 1); teacher aug -> student clean (scale)
    t0 = jnp.mean(jnp.sum(-q0 * s1, axis=-1))
    t1 = jnp.mean(jnp.sum(-q1 * s0, axis=-1)) * scale
    return t0 + t1


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    thresh: float = 0.7,
    min_kept: int = 100_000,
) -> jnp.ndarray:
    """Online hard-example mining CE (SYNTHIA variant's seg loss).

    Keeps pixels whose predicted probability of the true class is below
    max(thresh, prob of the min_kept-th hardest valid pixel), then means
    their CE.  Shape-static reimplementation of util/loss.py:89-108: the
    dynamic sort-select is replaced by a top-k style threshold lookup with
    invalid pixels pushed to +inf.
    """
    nll_map, valid_map = _nll_map(logits, labels)
    valid = valid_map.reshape(-1)
    nll = nll_map.reshape(-1)
    # prob of the true class; invalid pixels have nll 0 -> prob 1, but they
    # are masked out of both the sort (below) and the kept set
    prob = jnp.exp(-nll)

    prob_sorted = jnp.sort(jnp.where(valid, prob, jnp.inf))
    n_valid = jnp.sum(valid)
    # reference: min_value = pred[min(min_kept, numel-1)] over valid pixels
    k = jnp.minimum(jnp.asarray(min_kept, jnp.int32), jnp.maximum(n_valid - 1, 0))
    min_value = prob_sorted[k]
    min_value = jnp.where(jnp.isfinite(min_value), min_value, 0.0)
    threshold = jnp.maximum(min_value, thresh)

    keep = valid & (prob < threshold)
    total = jnp.sum(jnp.where(keep, nll, 0.0))
    return total / jnp.maximum(jnp.sum(keep), 1)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def lsgan_d_loss(real_scores: list[jnp.ndarray], fake_scores: list[jnp.ndarray]) -> jnp.ndarray:
    """LSGAN discriminator loss over multi-scale patch outputs.

    reference: train_domain_translator.py:262-282 (MSE to 1 for real,
    0 for fake, summed over the 3 scales).
    """
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss += jnp.mean((r.astype(jnp.float32) - 1.0) ** 2)
        loss += jnp.mean(f.astype(jnp.float32) ** 2)
    return loss


def lsgan_g_loss(fake_scores: list[jnp.ndarray]) -> jnp.ndarray:
    """LSGAN generator loss (MSE to 1 on fake patch scores)."""
    loss = 0.0
    for f in fake_scores:
        loss += jnp.mean((f.astype(jnp.float32) - 1.0) ** 2)
    return loss


def _laplacian_kernel2d(ksize: int) -> jnp.ndarray:
    """kornia-style 2D laplacian: all-ones with center 1 - k*k."""
    k = jnp.ones((ksize, ksize), dtype=jnp.float32)
    k = k.at[ksize // 2, ksize // 2].set(1.0 - ksize * ksize)
    return k


def laplacian2d(x: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Per-channel 5x5 laplacian with reflect padding on NHWC input.

    Matches kornia.laplacian as used by seg_edge_loss (util/loss.py:217,222).
    """
    c = x.shape[-1]
    k = _laplacian_kernel2d(ksize)
    kern = jnp.zeros((ksize, ksize, 1, c), x.dtype).at[:, :, 0, :].set(k[..., None])
    pad = ksize // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def seg_edge_loss(rgb_out: jnp.ndarray, rgb_in: jnp.ndarray, segm: jnp.ndarray) -> jnp.ndarray:
    """Edge-preservation L1 on semantic boundaries (translator G loss).

    reference: util/loss.py:206-229.  ``segm`` is (B, H, W) labels; NHWC
    images.
    """
    seg = segm.astype(jnp.float32)[..., None]
    seg_edges = (jnp.abs(laplacian2d(seg)) > 0.1).astype(jnp.float32)
    seg_edges = jnp.broadcast_to(seg_edges, rgb_in.shape)
    return l1_loss(rgb_in * seg_edges, rgb_out * seg_edges)
