"""HRNet+OCR model tests (tiny arch for CPU speed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.models.hrnet_ocr import HRNet, HRNetOCR, OCRHead

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

TINY = {
    "stem_channels": 8,
    "stage1_blocks": 1,
    "stage1_channels": 8,
    "stages": [
        (1, 1, (8, 16)),
        (1, 1, (8, 16, 32)),
        (1, 1, (8, 16, 32, 64)),
    ],
    "ocr_mid_channels": 32,
    "ocr_key_channels": 16,
}


class TestHRNet:
    def test_backbone_concat_channels(self):
        model = HRNet(arch=TINY)
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 64, 96, 3))
        variables = model.init(k, x, train=False)
        out = model.apply(variables, x, train=False)
        # 1/4 resolution, concat of all branch channels
        assert out.shape == (1, 16, 24, 8 + 16 + 32 + 64)

    def test_partial_remat_matches(self):
        """remat granularity is a memory/recompute dial only: full, partial
        (stage tuple), and no remat produce identical outputs and grads."""
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))

        def loss_of(model, variables):
            def f(params):
                out, _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return f

        base = HRNet(arch=TINY, remat=False)
        variables = base.init(k, x, train=False)
        ref_val, ref_grad = jax.value_and_grad(loss_of(base, variables))(
            variables["params"])
        for remat in (True, ("stage3", "stage4"), ("stage2",)):
            m = HRNet(arch=TINY, remat=remat)
            val, grad = jax.value_and_grad(loss_of(m, variables))(
                variables["params"])
            assert np.allclose(float(val), float(ref_val), rtol=1e-6)
            for a, b in zip(jax.tree_util.tree_leaves(ref_grad),
                            jax.tree_util.tree_leaves(grad)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)

    def test_remat_policy_bn_stats_matches(self):
        """remat_policy='bn_stats' (save the (C,)-sized train-mode BN
        stats across the remat boundary, skipping the full-activation
        re-reduction in the backward recompute) is numerically a no-op:
        outputs, grads, and the updated running stats all match plain
        remat exactly."""
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

        def run(model, variables):
            def f(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2), mut
            (val, mut), grad = jax.value_and_grad(f, has_aux=True)(
                variables["params"])
            return val, grad, mut["batch_stats"]

        base = HRNet(arch=TINY, remat=True)
        variables = base.init(k, x, train=False)
        ref = run(base, variables)
        got = run(HRNet(arch=TINY, remat=True, remat_policy="bn_stats"),
                  variables)
        assert np.allclose(float(got[0]), float(ref[0]), rtol=1e-6)
        for part_ref, part_got in zip(ref[1:], got[1:]):
            for a, b in zip(jax.tree_util.tree_leaves(part_ref),
                            jax.tree_util.tree_leaves(part_got)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)

    def test_channel_padding_matches(self):
        """pad_to (channel-padded compute layout, the TPU lane-occupancy
        experiment — docs/PERF.md semiseg attribution) is numerically the
        unpadded model: same param/stat shapes (checkpoints are
        layout-independent), same outputs, grads, and running stats.
        pad_to=32 pads the 8/16-ch TINY branches to 32 and leaves the
        32/64-ch branches alone (mixed padded/unpadded fusion convs).

        Compared in float64 where the transformation is BIT-exact.  In
        f32 the padded convs reassociate their channel reductions
        (~1e-7 seeds) and this random-init tiny net's BN chains amplify
        that to O(1) over 3 stages (measured ~20x per BN+fuse layer) —
        float noise, not semantics, so f32 comparison is meaningless
        here."""
        k = jax.random.PRNGKey(0)
        jax.config.update("jax_enable_x64", True)
        try:
            x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3),
                                  dtype=jnp.float64)
            base = HRNet(arch=TINY, dtype=jnp.float64)
            padded = HRNet(arch=TINY, dtype=jnp.float64, pad_to=32)
            variables = base.init(k, x, train=False)
            v_pad = padded.init(k, x, train=False)
            assert jax.tree_util.tree_map(jnp.shape, variables) == \
                jax.tree_util.tree_map(jnp.shape, v_pad)
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64), variables)

            def run(model):
                def f(params):
                    out, mut = model.apply(
                        {"params": params,
                         "batch_stats": variables["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])
                    return jnp.sum(out ** 2), mut
                (val, mut), grad = jax.value_and_grad(f, has_aux=True)(
                    variables["params"])
                return val, grad, mut["batch_stats"]

            ref, got = run(base), run(padded)
            assert np.allclose(float(got[0]), float(ref[0]), rtol=1e-12)
            for part_ref, part_got in zip(ref[1:], got[1:]):
                for a, b in zip(jax.tree_util.tree_leaves(part_ref),
                                jax.tree_util.tree_leaves(part_got)):
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                               rtol=1e-10, atol=1e-12)
            # eval mode consumes the (logical-width) running stats
            e_ref = base.apply(variables, x, train=False)
            e_got = padded.apply(variables, x, train=False)
            np.testing.assert_allclose(np.asarray(e_got), np.asarray(e_ref),
                                       rtol=1e-10, atol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_train_updates_bn(self):
        model = HRNet(arch=TINY)
        k = jax.random.PRNGKey(0)
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(k, x, train=False)
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after))


class TestOCR:
    def test_head_outputs(self):
        head = OCRHead(num_classes=5, mid_channels=32, key_channels=16)
        k = jax.random.PRNGKey(0)
        feats = jnp.ones((2, 8, 12, 24))
        variables = head.init({"params": k, "dropout": k}, feats, train=False)
        aux, logits, aug = head.apply(variables, feats, train=False)
        assert aux.shape == (2, 8, 12, 5)
        assert logits.shape == (2, 8, 12, 5)
        assert aug.shape == (2, 8, 12, 32)

    def test_full_model(self):
        model = HRNetOCR(num_classes=19, arch_name="tiny")
        # patch in the tiny arch through module attribute resolution
        import diga_tpu.models.hrnet_ocr as H

        H.W32 = TINY  # arch_name != 'w48' falls back to W32 slot
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init({"params": k, "dropout": k}, x, train=False)
        feats, aux, logits, aug = model.apply(variables, x, train=False)
        assert logits.shape == (1, 16, 16, 19)
        assert aux.shape == (1, 16, 16, 19)
        assert feats.shape[-1] == 8 + 16 + 32 + 64
