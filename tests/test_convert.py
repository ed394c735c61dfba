"""Torch<->flax weight converter roundtrip tests (tiny-depth model)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.models.convert import (
    merge_pretrained_backbone,
    segmodel_from_torch,
    segmodel_to_torch,
)
from diga_tpu.models.resnet_deeplab import DeepLabV2

LAYERS = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def variables():
    model = DeepLabV2(num_classes=19, layers=LAYERS)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 33, 65, 3), jnp.float32)
    return model.init({"params": k, "dropout": k}, x, train=False)


def test_roundtrip_params(variables):
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = segmodel_to_torch(params, stats, layers=LAYERS)
    # every exported tensor is torch-shaped (convs are O,I,kh,kw)
    assert sd["layer0.0.weight"].shape == (64, 3, 7, 7)
    assert sd["final.head.1.weight"].shape == (19, 256, 1, 1)
    p2, s2 = segmodel_from_torch(sd, layers=LAYERS)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = dict(
        ("/".join(str(getattr(q, "key", q)) for q in path), v)
        for path, v in jax.tree_util.tree_flatten_with_path(p2)[0]
    )
    for path, v in flat1:
        key = "/".join(str(getattr(q, "key", q)) for q in path)
        np.testing.assert_array_equal(flat2[key], np.asarray(v), err_msg=key)


def test_merge_backbone_keeps_head(variables):
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = segmodel_to_torch(params, stats, layers=LAYERS)
    # simulate the pretrained-backbone file: strip the head like the
    # reference's load rule (seg_model_noaux.py:330-335)
    sd_bb = {k: v * 2.0 for k, v in sd.items() if not k.startswith("final.")}
    p_bb, s_bb = segmodel_from_torch(sd_bb, layers=LAYERS)
    merged_p, merged_s = merge_pretrained_backbone(params, stats, p_bb, s_bb)
    np.testing.assert_array_equal(
        merged_p["conv1"]["kernel"], np.asarray(params["conv1"]["kernel"]) * 2.0
    )
    np.testing.assert_array_equal(
        merged_p["head"]["classifier"]["kernel"],
        np.asarray(params["head"]["classifier"]["kernel"]),
    )
