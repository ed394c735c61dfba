"""Cross-domain mixture (CrDoMix) and DACS CutMix — vectorized, fixed-shape.

The reference builds these masks with a Python loop over the batch and
``torch.unique``/``random.sample`` per image (train_DiGA_gta2city_warm_up
.py:239-261, ..._self_training.py:306-325) — a host sync every step.
Here the same distribution is produced with fixed shapes inside jit:

  * per-image class presence is a (B, C+1) bitmask (slot C = ignore)
  * "sample half of the present classes" == top-(n//2) of iid uniform
    scores restricted to present classes — identical in distribution to
    ``random.sample(present, n//2)``
  * the ignore slot is always force-selected (reference :249-250)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE = 255


def class_presence(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, C+1) float presence mask; slot C is the ignore class."""
    ids = jnp.where(labels == IGNORE, num_classes, labels)
    onehot = jax.nn.one_hot(ids, num_classes + 1, dtype=jnp.float32)
    return (jnp.sum(onehot, axis=(1, 2)) > 0).astype(jnp.float32)


def sample_half_classes(
    labels: jnp.ndarray, rng: jax.Array, num_classes: int
) -> jnp.ndarray:
    """(B, C+1) 0/1 selection of ~half the present classes, + ignore.

    Distributionally equal to the reference's
    ``random.sample(unique(labels), len//2)`` then force-append 255.
    """
    present = class_presence(labels, num_classes)  # (B, C+1)
    n_present = jnp.sum(present, axis=-1, keepdims=True)  # counts incl. ignore
    k = jnp.floor(n_present / 2.0)

    scores = jax.random.uniform(rng, present.shape)
    scores = jnp.where(present > 0, scores, -jnp.inf)
    # rank scores descending; select the k highest per image
    order = jnp.argsort(-scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1).astype(jnp.float32)
    selected = (ranks < k) & (present > 0)
    # force-include the ignore slot (reference :249-250)
    selected = selected.at[:, num_classes].set(True)
    return selected.astype(jnp.float32)


def selection_to_pixel_mask(
    labels: jnp.ndarray, selected: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """(B, H, W) float mask: 1 where the pixel's class was selected.

    One-hot contraction instead of take_along_axis: per-pixel gathers are
    a TPU anti-pattern (this op was the #2 cost in the step profile).
    """
    ids = jnp.where(labels == IGNORE, num_classes, labels).astype(jnp.int32)
    oh = jax.nn.one_hot(ids, num_classes + 1, dtype=selected.dtype)
    return jnp.sum(oh * selected[:, None, None, :], axis=-1)


def crdomix(
    translated: jnp.ndarray,
    source_aug: jnp.ndarray,
    source_labels: jnp.ndarray,
    rng: jax.Array,
    num_classes: int,
) -> jnp.ndarray:
    """Composite: translated image where mask=0, source view where mask=1.

    reference: train_DiGA_gta2city_warm_up.py:239-261
    """
    selected = sample_half_classes(source_labels, rng, num_classes)
    mask = selection_to_pixel_mask(source_labels, selected, num_classes)[..., None]
    return translated * (1.0 - mask) + source_aug * mask


def dacs_crossmix(
    target_img: jnp.ndarray,
    source_img: jnp.ndarray,
    source_labels: jnp.ndarray,
    target_pseudo: jnp.ndarray,
    rng: jax.Array,
    num_classes: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DACS-style class-paste: source pixels+labels into the target.

    Returns (mixed image, mixed label).  reference:
    train_DiGA_gta2city_self_training.py:306-325.
    """
    selected = sample_half_classes(source_labels, rng, num_classes)
    mask = selection_to_pixel_mask(source_labels, selected, num_classes)
    mixed = target_img * (1.0 - mask[..., None]) + source_img * mask[..., None]
    mixed_label = jnp.where(mask > 0, source_labels, target_pseudo).astype(jnp.int32)
    return mixed, mixed_label
