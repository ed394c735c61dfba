"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.ops.losses import distillation_loss
from diga_tpu.ops.pallas_kernels import distillation_loss_pallas

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
