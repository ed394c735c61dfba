"""Torch-functional parity for the HRNet-W48+OCR forward (tiny arch).

VERDICT r1 #4b: the HRNet+OCR model previously had only shape/converter
tests — this diffs our flax forward against a pure-torch replay of the
reference math (hrnet_module.py + ocrnet_module.py), weights via
convert_hrnet, the same gate style as the DeepLab torch parity tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import diga_tpu.models.hrnet_ocr as H
from diga_tpu.models.convert_hrnet import hrnet_ocr_to_torch
from diga_tpu.models.hrnet_ocr import HRNetOCR
from diga_tpu.models.torch_replay import hrnet_ocr_forward_torch

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

TINY = {
    "stem_channels": 8,
    "stage1_blocks": 2,
    "stage1_channels": 8,
    "stages": [
        (1, 2, (8, 16)),
        (2, 1, (8, 16, 32)),
        (1, 1, (8, 16, 32, 64)),
    ],
    "ocr_mid_channels": 32,
    "ocr_key_channels": 16,
}


def _nhwc(v):
    return v.detach().numpy().transpose(0, 2, 3, 1)


def test_hrnet_ocr_forward_matches_torch_replay(monkeypatch):
    pytest.importorskip("torch")
    import torch

    monkeypatch.setattr(H, "W32", TINY)
    model = HRNetOCR(num_classes=7, arch_name="tiny")
    k = jax.random.PRNGKey(3)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
    variables = model.init({"params": k, "dropout": k}, jnp.asarray(x), train=False)

    # perturb batch_stats away from init so BN math is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a)
                         + rng.normal(size=a.shape).astype(np.float32) * 0.01)
        if a.ndim == 1 else np.asarray(a),
        variables["batch_stats"],
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    feats_j, aux_j, logits_j, aug_j = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)

    sd = hrnet_ocr_to_torch(params, stats, TINY)
    with torch.no_grad():
        feats_t, aux_t, logits_t, aug_t = hrnet_ocr_forward_torch(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), TINY, num_classes=7)

    tol = dict(atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feats_j), _nhwc(feats_t), **tol)
    np.testing.assert_allclose(np.asarray(aux_j), _nhwc(aux_t), **tol)
    np.testing.assert_allclose(np.asarray(logits_j), _nhwc(logits_t), **tol)
    np.testing.assert_allclose(np.asarray(aug_j), _nhwc(aug_t), **tol)
