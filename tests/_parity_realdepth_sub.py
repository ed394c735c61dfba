"""Subprocess body for test_torch_parity_realdepth.

Run in a FRESH python (same rationale as _selftrain_sub.py: keep the
big XLA CPU compile out of the long pytest process).  Compares the flax
DeepLabv2 at the REAL composition (3, 4, 23, 3) against the pure-torch
replay of the reference math, weights via the converter.

Prints "RESULT logits=<maxabs> feat=<maxabs>" on success.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from diga_tpu.models.convert import segmodel_to_torch
    from diga_tpu.models.resnet_deeplab import DeepLabV2
    from diga_tpu.models.torch_replay import segmodel_forward_torch
    import torch

    layers = (3, 4, 23, 3)
    model = DeepLabV2(num_classes=19, layers=layers)
    k = jax.random.PRNGKey(7)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 65, 129, 3)).astype(np.float32)
    variables = model.init({"params": k, "dropout": k}, jnp.asarray(x), train=False)

    stats = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a)
                         + rng.normal(size=a.shape).astype(np.float32) * 0.01)
        if a.ndim == 1 else np.asarray(a),
        variables["batch_stats"],
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    _, _, logits_jax, feat_jax = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    logits_jax = np.asarray(logits_jax)
    feat_jax = np.asarray(feat_jax)

    sd = segmodel_to_torch(params, stats, layers=layers)
    with torch.no_grad():
        logits_t, feat_t = segmodel_forward_torch(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), layers=layers)

    d_logits = float(np.max(np.abs(
        logits_jax - logits_t.numpy().transpose(0, 2, 3, 1))))
    d_feat = float(np.max(np.abs(
        feat_jax - feat_t.numpy().transpose(0, 2, 3, 1))))
    print(f"RESULT logits={d_logits:.3e} feat={d_feat:.3e}")


if __name__ == "__main__":
    main()
