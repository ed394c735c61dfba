"""Tests for auxiliary ops (C22): FDA swap, AdaIN, one-hot, masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.ops.extras import (
    adaptive_instance_normalization,
    fourier_exchange,
    generate_block_mask,
    label_one_hot,
    rand_bbox,
)

RNG = np.random.default_rng(0)


def test_label_one_hot_clamped():
    lbl = jnp.asarray([[[0, 255], [3, 18]]])
    oh = label_one_hot(lbl, 19)
    assert oh.shape == (1, 2, 2, 19)
    np.testing.assert_allclose(np.asarray(oh[0, 0, 1]), 1e-4)  # ignore row
    assert float(oh[0, 0, 0, 0]) == 1.0
    assert float(oh[0, 1, 1, 18]) == 1.0
    assert float(oh.min()) == pytest.approx(1e-4, rel=1e-5)


def test_fourier_exchange_swaps_low_freq():
    src = jnp.asarray(RNG.normal(size=(1, 64, 64, 3)).astype(np.float32))
    trg = jnp.asarray(RNG.normal(size=(1, 64, 64, 3)).astype(np.float32))
    out = fourier_exchange(src, trg, L=0.1)
    assert out.shape == src.shape
    # real output, changed from src; the DC AMPLITUDE comes from trg while
    # its sign (phase) stays src's — so compare magnitudes
    assert not np.allclose(np.asarray(out), np.asarray(src))
    np.testing.assert_allclose(
        np.abs(np.asarray(out).mean(axis=(1, 2))),
        np.abs(np.asarray(trg).mean(axis=(1, 2))),
        atol=1e-3,
    )


def test_adain_transfers_stats():
    content = jnp.asarray(RNG.normal(size=(1, 8, 8, 4)).astype(np.float32)) * 3 + 1
    style = jnp.asarray(RNG.normal(size=(1, 8, 8, 4)).astype(np.float32)) * 0.5 - 2
    out = adaptive_instance_normalization(content, style)
    np.testing.assert_allclose(
        np.asarray(out).mean(axis=(1, 2)), np.asarray(style).mean(axis=(1, 2)), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out).std(axis=(1, 2)), np.asarray(style).std(axis=(1, 2)), atol=1e-2)


def test_rand_bbox_area():
    mask = rand_bbox(jax.random.PRNGKey(0), (64, 64), lam=0.5)
    assert mask.shape == (64, 64)
    frac = float(mask.mean())
    assert 0.0 <= frac <= 0.5 + 1e-6  # clipped box <= sqrt(0.5)^2


def test_block_mask_blocks():
    m = generate_block_mask(jax.random.PRNGKey(1), (2, 64, 64), block=32, ratio=0.5)
    assert m.shape == (2, 64, 64)
    assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}
    # 2x2 coarse grid -> each 32x32 block is constant
    blk = np.asarray(m)[0, :32, :32]
    assert blk.min() == blk.max()
