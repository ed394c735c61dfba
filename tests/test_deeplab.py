"""DeepLabv2-ResNet101 model tests: shapes, OS8 geometry, param groups,
frozen-BN behavior, and torch-parity of the ceil-mode maxpool."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.models.resnet_deeplab import (
    DeepLabV2,
    head_param_mask,
    max_pool_ceil,
)

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


@pytest.fixture(scope="module")
def tiny_model():
    # 2 blocks per stage keeps init/apply fast while exercising every path
    model = DeepLabV2(num_classes=19, layers=(2, 2, 2, 2))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 65, 129, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    return model, variables


class TestMaxPoolCeil:
    @pytest.mark.parametrize("h,w", [(256, 448), (129, 225), (33, 57), (17, 17)])
    def test_matches_torch(self, h, w):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(0).normal(size=(1, h, w, 4)).astype(np.float32)
        ours = np.asarray(max_pool_ceil(jnp.asarray(x), 3, 2, 1))
        ref = torch.nn.MaxPool2d(3, 2, 1, ceil_mode=True)(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, ref)


class TestDeepLab:
    def test_output_shapes_os8(self, tiny_model):
        model, variables = tiny_model
        x = jnp.zeros((2, 65, 129, 3), jnp.float32)
        shallow, deep, logits, feat = model.apply(variables, x, train=False)
        # conv1 /2 -> 33x65; maxpool ceil -> 17x33; layer2 /2 -> 9x17
        assert shallow.shape == (2, 9, 17, 512)
        assert deep.shape == (2, 9, 17, 2048)       # layers 3/4 dilated, stride 1
        assert logits.shape == (2, 9, 17, 19)
        assert feat.shape == (2, 9, 17, 256)

    def test_train_mode_updates_batch_stats(self, tiny_model):
        model, variables = tiny_model
        x = jnp.ones((1, 33, 33, 3), jnp.float32)
        out, mutated = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )
        assert changed

    def test_param_groups(self, tiny_model):
        _, variables = tiny_model
        mask = head_param_mask(variables["params"])
        labels = set(jax.tree_util.tree_leaves(mask))
        assert labels == {"backbone", "head", "frozen"}
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, label in flat:
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            if "frozen_bn" in keys:
                assert label == "frozen", keys
            elif keys.startswith("head"):
                assert label == "head", keys
            else:
                assert label == "backbone", keys

    def test_param_count_full_r101(self):
        # full ResNet-101 DeepLabv2: backbone ~42.6M + head; sanity band
        model = DeepLabV2(num_classes=19)
        x = jnp.zeros((1, 33, 33, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x, train=False)
        )
        n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
        assert 55e6 < n < 75e6, f"param count {n/1e6:.1f}M out of expected band"

    def test_dropout_only_in_train(self, tiny_model):
        model, variables = tiny_model
        x = jnp.ones((1, 33, 33, 3), jnp.float32) * 0.3
        a = model.apply(variables, x, train=False)[2]
        b = model.apply(variables, x, train=False)[2]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
