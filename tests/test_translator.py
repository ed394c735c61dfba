"""Translator models + GAN train-step tests (tiny dims, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from diga_tpu.models.translator import Discriminator, ImgDecoder, ImgEncoder
from diga_tpu.models.convert_translator import (
    decoder_from_torch,
    decoder_to_torch,
    discriminator_from_torch,
    discriminator_to_torch,
    encoder_from_torch,
    encoder_to_torch,
)
from diga_tpu.train.steps_translator import (
    TranslatorConfig,
    build_translator_step,
    create_translator_state,
)

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

CROP = (32, 64)


def tiny_modules():
    return {
        "enc_s": ImgEncoder(dim=8, n_downsample=2, n_res=1),
        "enc_t": ImgEncoder(dim=8, n_downsample=2, n_res=1),
        "dec_s2t": ImgDecoder(dim=32, n_upsample=2, n_res=1),
        "dec_t2s": ImgDecoder(dim=32, n_upsample=2, n_res=1),
        "dis_s2t": Discriminator(dim=8, n_layer=2, num_scales=2),
        "dis_t2s": Discriminator(dim=8, n_layer=2, num_scales=2),
    }


class TestTranslatorModels:
    def test_encoder_decoder_shapes(self):
        enc = ImgEncoder(dim=8, n_downsample=2, n_res=1)
        dec = ImgDecoder(dim=32, n_upsample=2, n_res=1)
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((1, *CROP, 3))
        ep = enc.init(k, x)["params"]
        z = enc.apply({"params": ep}, x)
        assert z.shape == (1, CROP[0] // 4, CROP[1] // 4, 32)
        dp = dec.init(k, z)["params"]
        y = dec.apply({"params": dp}, z)
        assert y.shape == (1, *CROP, 3)
        assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh range

    def test_discriminator_multiscale(self):
        dis = Discriminator(dim=8, n_layer=2, num_scales=3)
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((2, *CROP, 3))
        dp = dis.init(k, x)["params"]
        outs = dis.apply({"params": dp}, x)
        assert len(outs) == 3
        assert outs[0].shape[0] == 2
        # each scale halves the input (4x4 stride-2 convs on pooled input)
        assert outs[1].shape[1] <= outs[0].shape[1]

    def test_converter_roundtrip(self):
        k = jax.random.PRNGKey(1)
        x = jnp.zeros((1, *CROP, 3))
        enc = ImgEncoder(dim=8, n_downsample=2, n_res=2)
        ep = jax.tree_util.tree_map(np.asarray, enc.init(k, x)["params"])
        sd = encoder_to_torch(ep, n_downsample=2, n_res=2)
        ep2 = encoder_from_torch(sd, n_downsample=2, n_res=2)
        for a, b in zip(jax.tree_util.tree_leaves(ep), jax.tree_util.tree_leaves(ep2)):
            np.testing.assert_array_equal(np.asarray(a), b)

        dec = ImgDecoder(dim=32, n_upsample=2, n_res=2)
        z = enc.apply({"params": ep}, x)
        dp = jax.tree_util.tree_map(np.asarray, dec.init(k, z)["params"])
        sd = decoder_to_torch(dp, n_upsample=2, n_res=2)
        dp2 = decoder_from_torch(sd, n_upsample=2, n_res=2)
        for a, b in zip(jax.tree_util.tree_leaves(dp), jax.tree_util.tree_leaves(dp2)):
            np.testing.assert_array_equal(np.asarray(a), b)

        dis = Discriminator(dim=8, n_layer=2, num_scales=2)
        pp = jax.tree_util.tree_map(np.asarray, dis.init(k, x)["params"])
        sd = discriminator_to_torch(pp, num_scales=2, n_layer=2)
        pp2 = discriminator_from_torch(sd, num_scales=2, n_layer=2)
        for a, b in zip(jax.tree_util.tree_leaves(pp), jax.tree_util.tree_leaves(pp2)):
            np.testing.assert_array_equal(np.asarray(a), b)


class TestTranslatorStep:
    def test_gan_step_runs_and_improves_d(self):
        modules = tiny_modules()
        opt = optax.adam(1e-4, b1=0.5, b2=0.999)
        state = create_translator_state(modules, opt, jax.random.PRNGKey(0), CROP)
        step = jax.jit(build_translator_step(modules, opt, TranslatorConfig(lambda_percep=0.0)))
        rr = np.random.default_rng(0)
        batch = {
            "s_img": jnp.asarray(rr.normal(size=(2, *CROP, 3)).astype(np.float32) * 0.3),
            "s_lbl": jnp.asarray(rr.integers(0, 19, size=(2, *CROP)).astype(np.int32)),
            "t_img": jnp.asarray(rr.normal(size=(2, *CROP, 3)).astype(np.float32) * 0.3),
        }
        d_losses = []
        for _ in range(5):
            state, m = step(state, batch)
            d_losses.append(float(m["loss_d_s2t"]))
            assert np.isfinite(float(m["loss_g"]))
        assert d_losses[-1] < d_losses[0]  # D learns real-vs-fake quickly

    def test_fused_step_exact_vs_reference(self):
        """The single-pass (vjp + batched D/decoder applies) step must
        reproduce the reference-shaped two-forward step: the translator has
        no batch-coupled or stochastic op, so the math is identical and
        only float reassociation (different conv batch tiling) remains.
        SGD keeps that noise proportional — Adam's mhat/sqrt(vhat) is
        sign-like for near-zero grads and would amplify 1e-6 gradient
        noise into full-magnitude update flips."""
        modules = tiny_modules()
        opt = optax.sgd(1e-2)
        rr = np.random.default_rng(1)
        batch = {
            "s_img": jnp.asarray(rr.normal(size=(2, *CROP, 3)).astype(np.float32) * 0.3),
            "s_lbl": jnp.asarray(rr.integers(0, 19, size=(2, *CROP)).astype(np.int32)),
            "t_img": jnp.asarray(rr.normal(size=(2, *CROP, 3)).astype(np.float32) * 0.3),
        }
        results = {}
        for fuse in (False, True):
            state = create_translator_state(modules, opt, jax.random.PRNGKey(0), CROP)
            cfg = TranslatorConfig(lambda_percep=0.0, fuse=fuse)
            step = jax.jit(build_translator_step(modules, opt, cfg))
            state, m = step(state, batch)
            results[fuse] = (state, m)
        m0, m1 = results[False][1], results[True][1]
        for key in m0:
            np.testing.assert_allclose(float(m0[key]), float(m1[key]),
                                       rtol=1e-4, atol=1e-5, err_msg=key)
        for a, b in zip(jax.tree_util.tree_leaves(results[False][0].params),
                        jax.tree_util.tree_leaves(results[True][0].params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-6)
