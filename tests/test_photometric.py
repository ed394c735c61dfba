"""Photometric-chain correctness: HSV round-trip, blur vs scipy, model/unit
space round-trip, per-image apply gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.ops.photometric import (
    _hsv_to_rgb,
    _rgb_to_hsv,
    gaussian_blur,
    photometric_chain,
    to_model,
    to_unit,
)

RNG = np.random.default_rng(9)


class TestColorSpaces:
    def test_hsv_roundtrip(self):
        rgb = jnp.asarray(RNG.uniform(0.05, 0.95, size=(1, 16, 16, 3)).astype(np.float32))
        back = _hsv_to_rgb(_rgb_to_hsv(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    def test_hsv_matches_colorsys(self):
        import colorsys

        vals = [(0.2, 0.5, 0.9), (0.9, 0.1, 0.3), (0.5, 0.5, 0.5)]
        for r, g, b in vals:
            hsv = np.asarray(_rgb_to_hsv(jnp.asarray([[[[r, g, b]]]])))[0, 0, 0]
            ref = colorsys.rgb_to_hsv(r, g, b)
            np.testing.assert_allclose(hsv, ref, atol=1e-6)

    def test_unit_model_roundtrip(self):
        x = jnp.asarray(RNG.normal(size=(1, 8, 8, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(to_model(to_unit(x))), np.asarray(x),
                                   atol=1e-5)


class TestBlur:
    def test_matches_scipy_reflect(self):
        from scipy import ndimage

        x = RNG.normal(size=(1, 16, 20, 2)).astype(np.float32)
        ours = np.asarray(gaussian_blur(jnp.asarray(x), ksize=3, sigma=2.0))
        # build the same truncated 3x3 kernel and correlate with reflect pad
        ax = np.arange(3) - 1.0
        k = np.exp(-0.5 * (ax / 2.0) ** 2)
        k = k / k.sum()
        k2 = np.outer(k, k)
        for c in range(2):
            ref = ndimage.correlate(x[0, :, :, c], k2, mode="mirror")
            np.testing.assert_allclose(ours[0, :, :, c], ref, atol=1e-5)


class TestChainGating:
    def test_p_zero_is_identity(self):
        x = jnp.asarray(RNG.uniform(0.1, 0.9, size=(2, 16, 16, 3)).astype(np.float32))
        out = photometric_chain(x, jax.random.PRNGKey(0), p_jitter=0.0,
                                p_gray=0.0, p_blur=0.0, p_sharp=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_grayscale_p1_makes_channels_equal(self):
        x = jnp.asarray(RNG.uniform(0.1, 0.9, size=(1, 8, 8, 3)).astype(np.float32))
        out = np.asarray(photometric_chain(
            x, jax.random.PRNGKey(0), p_jitter=0.0, p_gray=1.0,
            p_blur=0.0, p_sharp=0.0))
        np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
        np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-6)


class TestKorniaFaithfulVariant:
    """VERDICT r1 #6: reference-faithful kornia-0.5.8 chain on normalized
    tensors (ops/photometric.py kornia_photometric_chain)."""

    def test_runs_and_differs_from_default(self):
        from diga_tpu.ops.photometric import diga_photometric

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
        k = jax.random.PRNGKey(0)
        out_d = diga_photometric(x, k, 0.4, "diga")
        out_k = diga_photometric(x, k, 0.4, "kornia")
        assert out_d.shape == out_k.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out_d)))
        assert np.all(np.isfinite(np.asarray(out_k)))
        # the two chains are intentionally different distributions
        assert float(jnp.max(jnp.abs(out_d - out_k))) > 1e-3

    def test_beta_zero_is_identity(self):
        from diga_tpu.ops.photometric import diga_photometric

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)).astype(np.float32))
        out = diga_photometric(x, jax.random.PRNGKey(1), 0.0, "kornia")
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_clamps_reproduce_reference_range(self):
        """kornia branch output = beta*(2*aug-1)+(1-beta)*x; with aug
        partially clamped to [0,1], the aug term is bounded [-1, 1]."""
        from diga_tpu.ops.photometric import kornia_photometric_chain

        rng = np.random.default_rng(2)
        # model-space range roughly [-2, 1.2]
        x = jnp.asarray((rng.normal(size=(4, 16, 24, 3)) * 1.2).astype(np.float32))
        k = jax.random.PRNGKey(2)
        out = np.asarray(kornia_photometric_chain(x, k))
        assert np.all(np.isfinite(out))

    def test_step_config_wires_variant(self):
        import dataclasses as dc

        from diga_tpu.configs.presets import (DataConfig, EvalConfig,
                                              ExperimentConfig, TrainConfig)
        from diga_tpu.train.build import make_step_config

        cfg = ExperimentConfig(
            name="x", stage="dg", data=DataConfig(), train=TrainConfig(),
            eval=EvalConfig(), extra={"photometric": "kornia"})
        assert make_step_config(cfg).photometric == "kornia"

    def test_sharpness_blends_toward_degenerate(self):
        """kornia 0.5.8's _blend_one(input, degenerate, f) moves TOWARD the
        3x3-smoothed image (a mild blur) — the TV/PIL argument order would
        sharpen instead (ADVICE r2 medium finding)."""
        from diga_tpu.ops.photometric import kornia_photometric_chain

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, size=(1, 24, 32, 3)).astype(np.float32))
        # find a key whose sharpness gate fires for the single image
        for seed in range(40):
            k = jax.random.PRNGKey(seed)
            keys = jax.random.split(k, 12)
            fired = bool(np.asarray(
                jax.random.uniform(keys[8], (1, 1, 1, 1)) < 0.3)[0, 0, 0, 0])
            if not fired:
                continue
            out = np.asarray(kornia_photometric_chain(
                x, k, p_jitter=0.0, with_sharpness=True))
            base = np.asarray(kornia_photometric_chain(
                x, k, p_jitter=0.0, with_sharpness=False))
            # recompute the degenerate from the pre-sharpness tensor
            kern = np.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
            from scipy import ndimage
            deg = np.stack([ndimage.correlate(base[0, :, :, c], kern,
                                              mode="constant")
                            for c in range(3)], axis=-1)[None]
            deg = np.clip(deg, 0.0, 1.0)
            interior = np.s_[:, 1:-1, 1:-1, :]
            d_out = np.abs(out - deg)[interior]
            d_base = np.abs(base - deg)[interior]
            changed = np.abs(out - base)[interior] > 1e-7
            if changed.sum() == 0:   # factor drew ~0
                continue
            # blended pixels moved toward the degenerate, never past it
            assert (d_out[changed] <= d_base[changed] + 1e-6).all()
            return
        pytest.fail("sharpness gate never fired in 40 seeds")

    def test_dg_omits_sharpness(self):
        """The DG reference chain comments RandomSharpness out
        (train_DiGA_DG.py:114) — build_dg_step's config must drop it."""
        from diga_tpu.configs.presets import get_preset
        from diga_tpu.train.build import make_step_config

        assert make_step_config(get_preset("dg_gta5")).with_sharpness is False
        assert make_step_config(get_preset("gta2city_warmup")).with_sharpness is True
        assert make_step_config(get_preset("synthia2city_warmup")).p_jitter == 0.7
