"""VGG19 feature-extractor + perceptual-loss parity tests (CPU, tiny).

Covers the previously untested models/vgg.py surface (VERDICT r3 missing
#2): converter + tap-by-tap forward parity against a functional-torch
replay of the reference's Vgg19 slices (util/loss.py:173-203), the
VGGLoss value incl. the >1024-width AvgPool halving loop
(util/loss.py:10-25), and the translator step's lambda_percep>0 path
(train_domain_translator.py:178,294,324) with its fused-vs-reference
exactness and remat auto-enable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn.functional as F

from diga_tpu.models.vgg import VGG19Features, vgg19_from_torch, vgg_perceptual_loss

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

# torchvision vgg19.features conv channel plan with pool positions
# (reference Vgg19 slices cover features[0:30] = conv1_1 .. relu5_1)
PLAN = [64, 64, "P", 128, 128, "P", 256, 256, 256, 256, "P",
        512, 512, 512, 512, "P", 512, 512, 512, 512, "P"]
CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]


def random_vgg19_state_dict(seed=0):
    """Random-weight torchvision-layout vgg19 features state_dict."""
    rr = np.random.default_rng(seed)
    sd = {}
    in_ch = 3
    ci = 0
    for item in PLAN:
        if item == "P":
            continue
        fan_in = in_ch * 9
        w = (rr.normal(size=(item, in_ch, 3, 3)) / np.sqrt(fan_in)).astype(np.float32)
        b = (rr.normal(size=(item,)) * 0.01).astype(np.float32)
        sd[f"features.{CONV_IDS[ci]}.weight"] = torch.from_numpy(w)
        sd[f"features.{CONV_IDS[ci]}.bias"] = torch.from_numpy(b)
        in_ch = item
        ci += 1
    return sd


def torch_vgg19_taps(sd, x_nchw):
    """Functional-torch replay of the reference Vgg19 slice structure:
    taps after relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1
    (util/loss.py:180-196 slices features[0:2],[2:7],[7:12],[12:21],[21:30]).
    """
    taps = []
    tap_after_relu = {1, 3, 5, 9, 13}
    x = x_nchw
    relu_i = 0
    ci = 0
    for item in PLAN:
        if item == "P":
            x = F.max_pool2d(x, 2, 2)
            continue
        w = sd[f"features.{CONV_IDS[ci]}.weight"]
        b = sd[f"features.{CONV_IDS[ci]}.bias"]
        x = F.relu(F.conv2d(x, w, b, padding=1))
        ci += 1
        relu_i += 1
        if relu_i in tap_after_relu:
            taps.append(x)
        if relu_i == 13:
            break  # reference slices stop at relu5_1 (features[21:30])
    return taps


class TestVGG19Parity:
    def test_converter_and_forward_taps_match_torch(self):
        sd = random_vgg19_state_dict(0)
        params = vgg19_from_torch(sd)
        vgg = VGG19Features(dtype=jnp.float32)

        rr = np.random.default_rng(1)
        x = rr.normal(size=(2, 32, 64, 3)).astype(np.float32)
        taps_jax = vgg.apply({"params": params}, jnp.asarray(x))
        with torch.no_grad():
            taps_t = torch_vgg19_taps(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
        assert len(taps_jax) == len(taps_t) == 5
        for i, (a, b) in enumerate(zip(taps_jax, taps_t)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
                rtol=1e-4, atol=1e-4, err_msg=f"tap {i}")

    def test_perceptual_loss_value_matches_torch(self):
        sd = random_vgg19_state_dict(2)
        params = vgg19_from_torch(sd)
        vgg = VGG19Features(dtype=jnp.float32)
        va = lambda x: vgg.apply({"params": params}, x)

        rr = np.random.default_rng(3)
        x = rr.normal(size=(1, 32, 64, 3)).astype(np.float32) * 0.3
        y = rr.normal(size=(1, 32, 64, 3)).astype(np.float32) * 0.3
        got = float(vgg_perceptual_loss(va, jnp.asarray(x), jnp.asarray(y)))

        weights = [1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0]
        with torch.no_grad():
            tx = torch_vgg19_taps(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
            ty = torch_vgg19_taps(sd, torch.from_numpy(y.transpose(0, 3, 1, 2)))
            want = sum(w * torch.mean(torch.abs(a - b))
                       for w, a, b in zip(weights, tx, ty))
        np.testing.assert_allclose(got, float(want), rtol=1e-4, atol=1e-5)

    def test_downsample_guard_halves_wide_inputs(self):
        """The reference halves inputs with AvgPool2d(2) while width > 1024
        (util/loss.py:19-20); exercised here with a small max_w so the loop
        fires twice without a 1024-wide tensor."""
        sd = random_vgg19_state_dict(4)
        params = vgg19_from_torch(sd)
        vgg = VGG19Features(dtype=jnp.float32)
        va = lambda x: vgg.apply({"params": params}, x)

        rr = np.random.default_rng(5)
        x = rr.normal(size=(1, 64, 128, 3)).astype(np.float32) * 0.3
        y = rr.normal(size=(1, 64, 128, 3)).astype(np.float32) * 0.3
        got = float(vgg_perceptual_loss(va, jnp.asarray(x), jnp.asarray(y),
                                        max_w=32))
        # manual halving twice (128 -> 64 -> 32), then the plain loss
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
        for _ in range(2):
            xt = F.avg_pool2d(xt, 2, 2)
            yt = F.avg_pool2d(yt, 2, 2)
        x2 = jnp.asarray(xt.numpy().transpose(0, 2, 3, 1))
        y2 = jnp.asarray(yt.numpy().transpose(0, 2, 3, 1))
        want = float(vgg_perceptual_loss(va, x2, y2, max_w=32))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_perceptual_target_is_detached(self):
        """Gradient flows into x only — y is stop_gradient'ed like the
        reference's y_vgg[i].detach() (util/loss.py:24)."""
        sd = random_vgg19_state_dict(6)
        params = vgg19_from_torch(sd)
        vgg = VGG19Features(dtype=jnp.float32)
        va = lambda x: vgg.apply({"params": params}, x)

        rr = np.random.default_rng(7)
        x = jnp.asarray(rr.normal(size=(1, 32, 32, 3)).astype(np.float32) * 0.3)
        y = jnp.asarray(rr.normal(size=(1, 32, 32, 3)).astype(np.float32) * 0.3)
        gx, gy = jax.grad(lambda a, b: vgg_perceptual_loss(va, a, b),
                          argnums=(0, 1))(x, y)
        assert float(jnp.max(jnp.abs(gx))) > 0
        np.testing.assert_array_equal(np.asarray(gy), 0.0)


class TestTranslatorPerceptualPath:
    def _setup(self):
        from diga_tpu.models.translator import Discriminator, ImgDecoder, ImgEncoder

        crop = (32, 64)
        modules = {
            "enc_s": ImgEncoder(dim=8, n_downsample=2, n_res=1),
            "enc_t": ImgEncoder(dim=8, n_downsample=2, n_res=1),
            "dec_s2t": ImgDecoder(dim=32, n_upsample=2, n_res=1),
            "dec_t2s": ImgDecoder(dim=32, n_upsample=2, n_res=1),
            "dis_s2t": Discriminator(dim=8, n_layer=2, num_scales=2),
            "dis_t2s": Discriminator(dim=8, n_layer=2, num_scales=2),
        }
        sd = random_vgg19_state_dict(8)
        vgg_params = vgg19_from_torch(sd)
        vgg = VGG19Features(dtype=jnp.float32)
        vgg_apply = lambda params, x: vgg.apply({"params": params}, x)
        rr = np.random.default_rng(9)
        batch = {
            "s_img": jnp.asarray(rr.normal(size=(2, *crop, 3)).astype(np.float32) * 0.3),
            "s_lbl": jnp.asarray(rr.integers(0, 19, size=(2, *crop)).astype(np.int32)),
            "t_img": jnp.asarray(rr.normal(size=(2, *crop, 3)).astype(np.float32) * 0.3),
        }
        return crop, modules, vgg_params, vgg_apply, batch

    def test_percep_step_fused_matches_reference_shape(self):
        """Full translator step with lambda_percep=0.1 under SGD: the
        single-pass fused step must match the reference-shaped two-forward
        step (remat auto-ON for both via TranslatorConfig.remat=None)."""
        from diga_tpu.train.steps_translator import (
            TranslatorConfig,
            build_translator_step,
            create_translator_state,
        )

        crop, modules, vgg_params, vgg_apply, batch = self._setup()
        opt = optax.sgd(1e-2)
        results = {}
        for fuse in (False, True):
            state = create_translator_state(modules, opt, jax.random.PRNGKey(0),
                                            crop, vgg_params=vgg_params)
            cfg = TranslatorConfig(lambda_percep=0.1, remat=None, fuse=fuse)
            step = jax.jit(build_translator_step(modules, opt, cfg, vgg_apply))
            state, m = step(state, batch)
            assert np.isfinite(float(m["loss_g"]))
            results[fuse] = (state, m)
        m0, m1 = results[False][1], results[True][1]
        for key in m0:
            np.testing.assert_allclose(float(m0[key]), float(m1[key]),
                                       rtol=1e-4, atol=1e-5, err_msg=key)
        for a, b in zip(jax.tree_util.tree_leaves(results[False][0].params),
                        jax.tree_util.tree_leaves(results[True][0].params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-6)

    def test_percep_term_changes_generator_grads(self):
        """lambda_percep>0 must actually contribute: generator params after
        one step differ from the lambda_percep=0 run (same seed/batch)."""
        from diga_tpu.train.steps_translator import (
            TranslatorConfig,
            build_translator_step,
            create_translator_state,
        )

        crop, modules, vgg_params, vgg_apply, batch = self._setup()
        opt = optax.sgd(1e-2)
        outs = {}
        for lam in (0.0, 0.1):
            state = create_translator_state(modules, opt, jax.random.PRNGKey(0),
                                            crop, vgg_params=vgg_params)
            cfg = TranslatorConfig(lambda_percep=lam)
            step = jax.jit(build_translator_step(
                modules, opt, cfg, vgg_apply if lam > 0 else None))
            state, _ = step(state, batch)
            outs[lam] = state.params
        diffs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                 for a, b in zip(jax.tree_util.tree_leaves(outs[0.0]["enc_s"]),
                                 jax.tree_util.tree_leaves(outs[0.1]["enc_s"]))]
        assert max(diffs) > 0
