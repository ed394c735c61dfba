"""HRNet+OCR converter roundtrip (tiny arch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.models.convert_hrnet import hrnet_ocr_from_torch, hrnet_ocr_to_torch
from diga_tpu.models.hrnet_ocr import HRNetOCR
import diga_tpu.models.hrnet_ocr as H

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


def test_roundtrip():
    H.W32 = TINY
    model = HRNetOCR(num_classes=7, arch_name="tiny")
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": k, "dropout": k}, x, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = hrnet_ocr_to_torch(params, stats, arch=TINY)
    assert sd["hrnet.conv1.weight"].shape == (8, 3, 3, 3)
    assert "ocrnet.segmentation_classes.0.weight" in sd

    p2, s2 = hrnet_ocr_from_torch(sd, arch=TINY)

    flat1 = {
        "/".join(str(getattr(q, "key", q)) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    flat2 = {
        "/".join(str(getattr(q, "key", q)) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(p2)[0]
    }
    assert set(flat1) == set(flat2)
    for key in flat1:
        np.testing.assert_array_equal(flat1[key], flat2[key], err_msg=key)

    # batch_stats too
    sflat1 = {
        "/".join(str(getattr(q, "key", q)) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(stats)[0]
    }
    sflat2 = {
        "/".join(str(getattr(q, "key", q)) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(s2)[0]
    }
    assert set(sflat1) == set(sflat2)
