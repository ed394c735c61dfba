"""fastconv custom-VJP equivalence with lax conv (fwd + both grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.ops.fastconv import conv_same_s1, _plain_conv

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("dilation", [1, 2, 4, 6])
def test_forward_and_grads_match_lax(dilation):
    x = jnp.asarray(RNG.normal(size=(2, 13, 17, 8)).astype(np.float32))
    w = jnp.asarray((RNG.normal(size=(3, 3, 8, 4)) * 0.1).astype(np.float32))

    y_fast = conv_same_s1(x, w, dilation)
    y_ref = _plain_conv(x, w, dilation)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-5)

    def loss_fast(x, w):
        return jnp.sum(jnp.sin(conv_same_s1(x, w, dilation)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_plain_conv(x, w, dilation)))

    gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=1e-4, rtol=1e-4)
