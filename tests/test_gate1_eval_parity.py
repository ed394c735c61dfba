"""BASELINE gate-#1 harness, exercised end-to-end on fixtures (VERDICT r1 #5).

Role-keyed weights -> our jitted two-scale evaluator over 50 synthetic
val images -> confusion matrix compared for EQUALITY against a
pure-torch replay of the reference eval pipeline on the same images.
With real reference checkpoints this same CLI
(`parity_check --vs_torch_replay`) is the mIoU-parity gate.
"""

import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


def test_gate1_confusion_matches_torch_replay(tmp_path, monkeypatch):
    from diga_tpu.cli.parity_check import main as parity_main
    from diga_tpu.configs import presets
    from diga_tpu.data import synthetic
    from diga_tpu.models.convert import segmodel_to_torch
    from diga_tpu.models.resnet_deeplab import DeepLabV2
    from diga_tpu.utils.checkpoint import export_role_keyed

    layers = (1, 1, 1, 1)
    city_root = str(tmp_path / "city")
    val_img, val_lbl = synthetic.make_cityscapes_fixture(
        city_root, n=50, h=48, w=96, split="val")

    # random-but-realistic tiny model exported role-keyed
    model = DeepLabV2(num_classes=19, layers=layers)
    k = jax.random.PRNGKey(11)
    rng = np.random.default_rng(11)
    variables = model.init({"params": k, "dropout": k},
                           jnp.zeros((1, 48, 96, 3)), train=False)
    stats = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(a)
                         + rng.normal(size=a.shape).astype(np.float32) * 0.01)
        if a.ndim == 1 else np.asarray(a),
        variables["batch_stats"])
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    wdir = str(tmp_path / "weights")
    export_role_keyed(wdir, {"student": segmodel_to_torch(params, stats, layers)})

    p0 = presets.get_preset("gta2city_warmup")
    tiny = dataclasses.replace(
        p0,
        data=dataclasses.replace(p0.data, target_root=city_root,
                                 val_img_list=val_img, val_lbl_list=val_lbl),
        train=dataclasses.replace(p0.train, crop_hw=(48, 96),
                                  compute_dtype="float32", remat=False),
        eval=presets.EvalConfig(out_hw=(48, 96), ds_hw=(24, 48)),
        extra={"layers": layers},
    )
    monkeypatch.setitem(presets.PRESETS, "tiny_gate1", tiny)

    conf_ours, conf_torch, disagree = parity_main([
        "--preset", "tiny_gate1", "--weight_dir", wdir,
        "--vs_torch_replay", "--eval_limit", "50",
    ])
    assert conf_ours.sum() == conf_torch.sum() > 0
    # argmax flips from float reassociation only: require bit-equality of
    # >= 99.9% of pixels and near-identical confusion matrices
    assert disagree < 1e-3
    gap = np.abs(conf_ours - conf_torch).sum()
    assert gap <= max(2, int(conf_ours.sum() * 2e-3)), (
        f"confusion gap {gap} of {conf_ours.sum()}")
