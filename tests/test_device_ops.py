"""Tests for on-device ops: photometric aug, CrDoMix/DACS mixing, prototypes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.ops import (
    Centroids,
    bilateral_consensus,
    centroid_distance,
    centroid_weight,
    crdomix,
    dacs_crossmix,
    diga_photometric,
    masked_class_means,
    sample_half_classes,
    selection_to_pixel_mask,
    update_centroids,
)

RNG = np.random.default_rng(7)


class TestPhotometric:
    def test_shape_dtype_and_blend(self):
        x = RNG.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5
        out = diga_photometric(jnp.asarray(x), jax.random.PRNGKey(0), beta=0.4)
        assert out.shape == x.shape
        # blend keeps output near the input at small beta
        assert float(jnp.mean(jnp.abs(out - x))) < 1.0

    def test_beta_zero_is_identity(self):
        x = RNG.normal(size=(1, 16, 16, 3)).astype(np.float32)
        out = diga_photometric(jnp.asarray(x), jax.random.PRNGKey(1), beta=0.0)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)

    def test_randomness_over_keys(self):
        x = RNG.normal(size=(1, 16, 16, 3)).astype(np.float32)
        a = diga_photometric(jnp.asarray(x), jax.random.PRNGKey(1), beta=0.4)
        b = diga_photometric(jnp.asarray(x), jax.random.PRNGKey(2), beta=0.4)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestMixing:
    def _labels(self, b=4, h=16, w=16, classes=(0, 3, 7, 255)):
        lbl = np.zeros((b, h, w), dtype=np.int32)
        for i, c in enumerate(classes):
            lbl[:, :, i * (w // len(classes)):(i + 1) * (w // len(classes))] = c
        return jnp.asarray(lbl)

    def test_ignore_always_selected(self):
        lbl = self._labels()
        for seed in range(5):
            sel = sample_half_classes(lbl, jax.random.PRNGKey(seed), 19)
            assert np.all(np.asarray(sel[:, 19]) == 1.0)

    def test_half_of_present_selected(self):
        lbl = self._labels()  # 4 present classes per image (incl ignore)
        sel = sample_half_classes(lbl, jax.random.PRNGKey(0), 19)
        sel_np = np.asarray(sel)
        # k = 4 // 2 = 2 selected among present + forced ignore slot
        present = {0, 3, 7, 19}
        for bi in range(sel_np.shape[0]):
            chosen = set(np.nonzero(sel_np[bi])[0])
            assert chosen <= present
            assert 19 in chosen
            assert len(chosen) in (2, 3)  # 2 if ignore was sampled, else 2+forced

    def test_pixel_mask_matches_selection(self):
        lbl = self._labels(b=2)
        sel = sample_half_classes(lbl, jax.random.PRNGKey(3), 19)
        mask = selection_to_pixel_mask(lbl, sel, 19)
        mask_np, sel_np, lbl_np = map(np.asarray, (mask, sel, lbl))
        ids = np.where(lbl_np == 255, 19, lbl_np)
        np.testing.assert_array_equal(mask_np, sel_np[np.arange(2)[:, None, None], ids])

    def test_crdomix_composites(self):
        lbl = self._labels(b=2)
        translated = jnp.zeros((2, 16, 16, 3))
        source = jnp.ones((2, 16, 16, 3))
        out = crdomix(translated, source, lbl, jax.random.PRNGKey(0), 19)
        vals = np.unique(np.asarray(out))
        assert set(vals) <= {0.0, 1.0}

    def test_dacs_label_paste(self):
        lbl = self._labels(b=2)
        pseudo = jnp.full((2, 16, 16), 11, jnp.int32)
        timg = jnp.zeros((2, 16, 16, 3))
        simg = jnp.ones((2, 16, 16, 3))
        mixed, mixed_lbl = dacs_crossmix(timg, simg, lbl, pseudo, jax.random.PRNGKey(0), 19)
        m = np.asarray(mixed[..., 0])
        ml = np.asarray(mixed_lbl)
        # where image came from source, the label must be the source label
        np.testing.assert_array_equal(ml[m == 1.0], np.asarray(lbl)[m == 1.0])
        np.testing.assert_array_equal(ml[m == 0.0], 11)


class TestPrototypes:
    def test_masked_means_against_numpy_loop(self):
        b, h, w, c, k = 2, 8, 8, 6, 5
        feat = RNG.normal(size=(b, h, w, c)).astype(np.float32)
        logits = RNG.normal(size=(b, h, w, k)).astype(np.float32)
        labels = RNG.integers(0, k, size=(b, h, w)).astype(np.int32)
        vectors, valid = masked_class_means(
            jnp.asarray(feat), jnp.asarray(logits), jnp.asarray(labels), min_pixels=5
        )
        pred = logits.argmax(-1)
        for bi in range(b):
            for t in range(k):
                m = (pred[bi] == t) & (labels[bi] == t)
                if m.sum() == 0:
                    assert not bool(valid[bi, t])
                    continue
                ref = feat[bi][m].mean(0)
                np.testing.assert_allclose(np.asarray(vectors[bi, t]), ref, atol=1e-5)
                assert bool(valid[bi, t]) == (m.sum() >= 5)

    def test_centroid_distance_matches_norm(self):
        feat = RNG.normal(size=(1, 4, 4, 8)).astype(np.float32)
        cents = RNG.normal(size=(3, 8)).astype(np.float32)
        d = np.asarray(centroid_distance(jnp.asarray(feat), jnp.asarray(cents)))
        ref = np.linalg.norm(feat[..., None, :] - cents, axis=-1)
        np.testing.assert_allclose(d, ref, atol=1e-4)

    def test_update_mean_then_ema(self):
        cent = Centroids.create(3, 4)
        v = np.zeros((1, 3, 4), np.float32)
        v[0, 1] = 2.0
        valid = np.zeros((1, 3), bool)
        valid[0, 1] = True
        cent = update_centroids(cent, jnp.asarray(v), jnp.asarray(valid))
        # first observation in mean mode: (0*0 + 2)/1 = 2
        np.testing.assert_allclose(np.asarray(cent.vectors[1]), 2.0)
        np.testing.assert_allclose(np.asarray(cent.counts), [0, 1, 0])
        # ema mode (start_mean=False): tiny momentum moves barely
        v2 = np.zeros((1, 3, 4), np.float32)
        v2[0, 1] = 4.0
        cent2 = update_centroids(cent, jnp.asarray(v2), jnp.asarray(valid), start_mean=False)
        expected = 2.0 * (1 - 1e-4) + 1e-4 * 4.0
        np.testing.assert_allclose(np.asarray(cent2.vectors[1]), expected, rtol=1e-6)

    def test_consensus_masks_disagreement(self):
        pseudo = jnp.asarray(RNG.integers(0, 3, size=(1, 8, 8)).astype(np.int32))
        w = jax.nn.one_hot(pseudo, 3)  # prototype label == pseudo everywhere
        out = bilateral_consensus(pseudo, w)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(pseudo))
        # flip prototype argmax -> all 255
        w2 = jax.nn.one_hot((pseudo + 1) % 3, 3)
        out2 = bilateral_consensus(pseudo, w2)
        assert np.all(np.asarray(out2) == 255)

    def test_weight_is_softmax(self):
        feat = RNG.normal(size=(1, 4, 4, 8)).astype(np.float32)
        cents = RNG.normal(size=(3, 8)).astype(np.float32)
        w = np.asarray(centroid_weight(jnp.asarray(feat), jnp.asarray(cents)))
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
