"""Stage-hoisted space-to-batch: exactness against the dilated formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diga_tpu.ops.space_to_batch import batch_to_space, space_to_batch

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


class TestTransform:
    def test_roundtrip(self):
        rr = np.random.default_rng(0)
        x = jnp.asarray(rr.normal(size=(2, 8, 12, 5)).astype(np.float32))
        for f in (2, 4):
            y = space_to_batch(x, f)
            assert y.shape == (2 * f * f, 8 // f, 12 // f, 5)
            np.testing.assert_array_equal(batch_to_space(y, f), x)

    def test_nested_roundtrip(self):
        rr = np.random.default_rng(1)
        x = jnp.asarray(rr.normal(size=(3, 16, 8, 2)).astype(np.float32))
        y = space_to_batch(space_to_batch(x, 2), 2)
        np.testing.assert_array_equal(batch_to_space(batch_to_space(y, 2), 2), x)

    def test_subgrids_are_strided_slices(self):
        x = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
        y = space_to_batch(x, 2)
        # batch index pi*2 + pj holds x[pi::2, pj::2]
        for pi in range(2):
            for pj in range(2):
                np.testing.assert_array_equal(
                    y[pi * 2 + pj], x[0, pi::2, pj::2, :]
                )

    @pytest.mark.parametrize("dilation", [2, 4])
    def test_dilated_conv_equivalence(self, dilation):
        """dense conv on subgrids == dilated conv on the original grid."""
        rr = np.random.default_rng(dilation)
        x = jnp.asarray(rr.normal(size=(2, 16, 24, 6)).astype(np.float32))
        w = jnp.asarray(rr.normal(size=(3, 3, 6, 4)).astype(np.float32))
        dn = ("NHWC", "HWIO", "NHWC")
        pad = dilation
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        )
        xs = space_to_batch(x, dilation)
        ys = jax.lax.conv_general_dilated(
            xs, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        )
        got = batch_to_space(ys, dilation)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_nested_equals_dilation4(self):
        """two f=2 hops make a dilation-4 conv dense (the layer4 path)."""
        rr = np.random.default_rng(7)
        x = jnp.asarray(rr.normal(size=(1, 16, 16, 3)).astype(np.float32))
        w = jnp.asarray(rr.normal(size=(3, 3, 3, 2)).astype(np.float32))
        dn = ("NHWC", "HWIO", "NHWC")
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((4, 4), (4, 4)),
            rhs_dilation=(4, 4), dimension_numbers=dn,
        )
        xs = space_to_batch(space_to_batch(x, 2), 2)
        ys = jax.lax.conv_general_dilated(
            xs, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        )
        got = batch_to_space(batch_to_space(ys, 2), 2)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestModelEquivalence:
    @pytest.mark.parametrize(
        "hw",
        [
            (64, 128),  # layer3 grid 8x16: /4, pure transform path
            (72, 104),  # grid 10x14: even but not /4 -> masked layer4 pad
            (80, 88),   # grid 11x12: odd H -> masked pads at both hops
        ],
    )
    def test_deeplab_s2b_matches_dilated(self, hw):
        """full model: s2b=True == s2b=False (same params), train + eval."""
        from diga_tpu.models.resnet_deeplab import DeepLabV2

        rng = jax.random.PRNGKey(0)
        kw = dict(num_classes=7, layers=(1, 1, 2, 1))
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, *hw, 3)).astype(np.float32)
        )
        m_ref = DeepLabV2(s2b=False, **kw)
        m_s2b = DeepLabV2(s2b=True, **kw)
        variables = m_ref.init({"params": rng, "dropout": rng}, x, train=False)

        for train in (False, True):
            outs_ref, mut_ref = m_ref.apply(
                variables, x, train=train, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            outs_s2b, mut_s2b = m_s2b.apply(
                variables, x, train=train, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            for a, b in zip(outs_ref, outs_s2b):
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4),
                mut_ref["batch_stats"], mut_s2b["batch_stats"],
            )

    @pytest.mark.parametrize("hw", [(64, 128), (80, 88)])
    def test_deeplab_s2b_grads_match(self, hw):
        from diga_tpu.models.resnet_deeplab import DeepLabV2

        rng = jax.random.PRNGKey(0)
        kw = dict(num_classes=5, layers=(1, 1, 1, 1))
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, *hw, 3)).astype(np.float32)
        )
        m_ref = DeepLabV2(s2b=False, **kw)
        m_s2b = DeepLabV2(s2b=True, **kw)
        variables = m_ref.init({"params": rng, "dropout": rng}, x, train=False)

        def loss(params, model):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
            )[0]
            return jnp.mean(out[2] ** 2)

        g_ref = jax.grad(loss)(variables["params"], m_ref)
        g_s2b = jax.grad(loss)(variables["params"], m_s2b)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
            g_ref, g_s2b,
        )

    def test_remat_masked_s2b_grad_compiles(self):
        """remat x masked-s2b: n_valid reaches BatchNorm2D as a TRACER
        (jax.checkpoint makes float args dynamic) — the r4 Bessel branch
        raised TracerBoolConversionError in exactly this combination (the
        production gta2city_selftrain program; caught by bench.py r5)."""
        from diga_tpu.models.resnet_deeplab import DeepLabV2

        rng = jax.random.PRNGKey(0)
        kw = dict(num_classes=5, layers=(1, 1, 1, 1))
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 40, 72, 3)).astype(np.float32)
        )  # layer3 grid 5x9: odd -> masked s2b path
        m_ref = DeepLabV2(s2b=True, remat=False, **kw)
        m_rmt = DeepLabV2(s2b=True, remat=True, **kw)
        variables = m_ref.init({"params": rng, "dropout": rng}, x, train=False)

        def loss_and_stats(params, model):
            def f(p):
                outs, mut = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    x, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                return jnp.mean(outs[2] ** 2), mut["batch_stats"]

            (val, stats), grads = jax.value_and_grad(f, has_aux=True)(params)
            return val, stats, grads

        v0, s0, g0 = loss_and_stats(variables["params"], m_ref)
        v1, s1, g1 = loss_and_stats(variables["params"], m_rmt)
        np.testing.assert_allclose(v0, v1, rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
            s0, s1,
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
            g0, g1,
        )

    def test_odd_shapes_keep_output_shape(self):
        """masked-pad path preserves the dilated path's output shapes."""
        from diga_tpu.models.resnet_deeplab import DeepLabV2

        rng = jax.random.PRNGKey(0)
        m = DeepLabV2(num_classes=5, layers=(1, 1, 1, 1), s2b=True)
        x = jnp.zeros((1, 72, 104, 3), jnp.float32)  # layer3 grid 10x14 (not /4)
        variables = m.init({"params": rng, "dropout": rng}, x, train=False)
        outs = m.apply(variables, x, train=False)
        assert outs[2].shape == (1, 10, 14, 5)

    def test_param_tree_identical(self):
        """both paths produce byte-identical variable trees (ckpt interop)."""
        from diga_tpu.models.resnet_deeplab import DeepLabV2

        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 80, 88, 3), jnp.float32)
        kw = dict(num_classes=5, layers=(1, 1, 1, 1))
        v_ref = DeepLabV2(s2b=False, **kw).init({"params": rng, "dropout": rng}, x)
        v_s2b = DeepLabV2(s2b=True, **kw).init({"params": rng, "dropout": rng}, x)
        p_ref = jax.tree_util.tree_structure(v_ref)
        p_s2b = jax.tree_util.tree_structure(v_s2b)
        assert p_ref == p_s2b
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), v_ref, v_s2b
        )
