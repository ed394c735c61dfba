"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.ops.losses import distillation_loss
from diga_tpu.ops.pallas_kernels import distillation_loss_pallas

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

RNG = np.random.default_rng(3)


class TestDistillPallas:
    def _inputs(self, b=2, h=8, w=16, k=19):
        t = RNG.normal(size=(2 * b, h, w, k)).astype(np.float32)
        s = RNG.normal(size=(2 * b, h, w, k)).astype(np.float32)
        return jnp.asarray(t), jnp.asarray(s)

    def test_forward_matches_lax(self):
        t, s = self._inputs()
        ours = float(distillation_loss_pallas(t, s, 0.5))
        ref = float(distillation_loss(t, s, 0.5))
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_grad_matches_lax(self):
        t, s = self._inputs(b=1, h=4, w=8)
        g_ours = jax.grad(lambda s: distillation_loss_pallas(t, s, 0.5))(s)
        g_ref = jax.grad(lambda s: distillation_loss(t, s, 0.5))(s)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   atol=1e-5, rtol=1e-4)

    def test_teacher_grad_is_zero(self):
        t, s = self._inputs(b=1, h=4, w=8)
        g_t = jax.grad(lambda t: distillation_loss_pallas(t, s, 0.5))(t)
        np.testing.assert_array_equal(np.asarray(g_t), 0.0)

    def test_nonaligned_pixel_count(self):
        # pixel count not a multiple of BLOCK_P exercises the masked tail
        t, s = self._inputs(b=1, h=7, w=13)
        ours = float(distillation_loss_pallas(t, s, 0.5))
        ref = float(distillation_loss(t, s, 0.5))
        assert ours == pytest.approx(ref, rel=1e-5)


class TestPallasGroupNorm:
    """group_norm_pallas vs the XLA FusedGroupNorm math (interpret mode)."""

    def _ref(self, x, scale, bias, g=32, eps=1e-5):
        # the FusedGroupNorm formula (models/resnet_deeplab.py), jnp form
        b, h, w, c = x.shape
        cg = c // g
        xf = x.astype(jnp.float32)
        s_c = jnp.sum(xf, axis=(1, 2))
        s2_c = jnp.sum(xf * xf, axis=(1, 2))
        n = float(h * w * cg)
        mu = jnp.sum(s_c.reshape(b, g, cg), axis=-1) / n
        var = jnp.maximum(jnp.sum(s2_c.reshape(b, g, cg), axis=-1) / n - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        mu_c = jnp.repeat(mu, cg, axis=1)
        inv_s = jnp.repeat(inv, cg, axis=1) * scale[None]
        mul = inv_s.astype(x.dtype)
        add = (bias[None] - mu_c * inv_s).astype(x.dtype)
        return x * mul[:, None, None, :] + add[:, None, None, :]

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("shape", [(1, 17, 29, 256), (2, 8, 16, 64)])
    def test_matches_fused_groupnorm(self, dtype, shape):
        from diga_tpu.ops.pallas_gn import group_norm_pallas

        b, h, w, c = shape
        g = 32
        x = jnp.asarray(RNG.normal(size=shape), dtype)
        scale = jnp.asarray(RNG.normal(size=(c,)).astype(np.float32) * 0.1 + 1.0)
        bias = jnp.asarray(RNG.normal(size=(c,)).astype(np.float32) * 0.1)
        ours = group_norm_pallas(x, scale, bias, g)
        ref = self._ref(x, scale, bias, g)
        assert ours.dtype == x.dtype
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), np.asarray(ref, np.float32),
            atol=tol, rtol=tol)

    def test_model_site_equivalence(self):
        # through the actual FusedGroupNorm module, impl='pallas' vs 'xla'
        from diga_tpu.models.resnet_deeplab import FusedGroupNorm

        x = jnp.asarray(RNG.normal(size=(1, 9, 13, 256)).astype(np.float32))
        mod_x = FusedGroupNorm(num_groups=32, dtype=jnp.float32, impl="xla")
        v = mod_x.init(jax.random.PRNGKey(0), x)
        y_x = mod_x.apply(v, x)
        y_p = FusedGroupNorm(num_groups=32, dtype=jnp.float32,
                             impl="pallas").apply(v, x)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=1e-5, rtol=1e-5)
