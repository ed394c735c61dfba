"""BatchNorm2D unit tests (models/norms.py).

Pins the r5 regression: the Bessel (unbiased running-var) factor must be
trace-safe — under ``nn.remat`` the ``n_valid`` argument arrives as a
TRACER (jax.checkpoint treats array-like args as dynamic), and the r4
implementation's Python ``if n_valid > 1`` raised
TracerBoolConversionError in every remat'd masked-s2b program (the
production gta2city_selftrain preset).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diga_tpu.models.norms import BatchNorm2D


def _run(module, x, *args):
    variables = module.init(jax.random.PRNGKey(0), x, True, *args)
    y, mut = module.apply(variables, x, True, *args, mutable=["batch_stats"])
    return y, mut["batch_stats"]


class TestBessel:
    def test_running_var_is_unbiased(self):
        """Stored var carries torch's n/(n-1); normalization stays biased."""
        rr = np.random.default_rng(0)
        x = jnp.asarray(rr.normal(size=(2, 4, 6, 3)).astype(np.float32))
        bn = BatchNorm2D(momentum=0.0)  # running stats = this batch's stats
        _, stats = _run(bn, x)
        n = 2 * 4 * 6
        flat = np.asarray(x, np.float64).reshape(-1, 3)
        np.testing.assert_allclose(stats["var"], flat.var(0) * n / (n - 1),
                                   rtol=1e-5)
        np.testing.assert_allclose(stats["mean"], flat.mean(0), rtol=1e-5,
                                   atol=1e-6)

    def test_traced_n_valid_under_remat(self):
        """remat'd module with mask + n_valid == un-remat'd (the regression:
        the r4 Bessel branch raised TracerBoolConversionError here)."""
        rr = np.random.default_rng(1)
        x = jnp.asarray(rr.normal(size=(2, 4, 6, 3)).astype(np.float32))
        mask = jnp.ones((1, 4, 6, 1), jnp.float32).at[:, 3:].set(0.0)
        n_valid = float(2 * 3 * 6)

        class Wrapped(nn.Module):
            remat: bool = False

            @nn.compact
            def __call__(self, x, train, mask, n_valid):
                cls = nn.remat(BatchNorm2D, static_argnums=(2,)) if self.remat \
                    else BatchNorm2D
                return cls(name="bn")(x, train, mask, n_valid)

        def loss(module):
            variables = module.init(jax.random.PRNGKey(0), x, True, mask, n_valid)

            def f(params):
                y, mut = module.apply(
                    {**variables, "params": params}, x, True, mask, n_valid,
                    mutable=["batch_stats"])
                return jnp.sum(y * y), mut["batch_stats"]

            (val, stats), grads = jax.value_and_grad(f, has_aux=True)(
                variables["params"])
            return val, stats, grads

        v0, s0, g0 = loss(Wrapped(remat=False))
        v1, s1, g1 = loss(Wrapped(remat=True))
        np.testing.assert_allclose(v0, v1, rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), s0, s1)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
            g0, g1)

    def test_n_valid_one_keeps_var_finite(self):
        """n==1: Bessel factor pinned to 1 (no division by zero)."""
        x = jnp.ones((1, 1, 1, 2), jnp.float32) * 3.0
        bn = BatchNorm2D(momentum=0.0)
        _, stats = _run(bn, x)
        assert np.all(np.isfinite(np.asarray(stats["var"])))


class TestMaskGuards:
    def test_mask_without_n_valid_raises(self):
        x = jnp.ones((1, 2, 2, 1), jnp.float32)
        mask = jnp.ones((1, 2, 2, 1), jnp.float32)
        with pytest.raises(ValueError, match="n_valid"):
            BatchNorm2D().init(jax.random.PRNGKey(0), x, True, mask, None)
