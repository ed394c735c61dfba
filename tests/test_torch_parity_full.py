"""End-to-end architecture parity: our flax DeepLabv2 (tiny depth) vs a
pure-torch functional replay of the reference computation, through the
weight converter.  Any conv/BN/pool/ASPP/SE semantic mismatch shows up as
a logits diff here."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.models.convert import segmodel_to_torch
from diga_tpu.models.resnet_deeplab import DeepLabV2
from diga_tpu.models.torch_replay import segmodel_forward_torch

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'

LAYERS = (1, 1, 1, 1)


def test_full_forward_matches_torch_replay():
    pytest.importorskip("torch")
    import torch

    model = DeepLabV2(num_classes=19, layers=LAYERS)
    k = jax.random.PRNGKey(7)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 65, 129, 3)).astype(np.float32)
    variables = model.init({"params": k, "dropout": k}, jnp.asarray(x), train=False)

    # perturb batch_stats away from init so BN math is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rng.normal(size=a.shape).astype(np.float32) * 0.01
        if a.ndim == 1 else np.asarray(a),
        variables["batch_stats"],
    )
    stats = jax.tree_util.tree_map(np.abs, stats)  # keep variances positive
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    _, _, logits_jax, feat_jax = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)

    sd = segmodel_to_torch(params, stats, layers=LAYERS)
    logits_t, feat_t = segmodel_forward_torch(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), layers=LAYERS)

    np.testing.assert_allclose(
        np.asarray(logits_jax),
        logits_t.detach().numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(feat_jax),
        feat_t.detach().numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )
