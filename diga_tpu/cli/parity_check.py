"""Activation/mIoU parity harness against reference checkpoints.

BASELINE.md gate 1: load a reference-trained ``student.pth``, (a) diff our
flax DeepLabv2 forward against a pure-torch functional replay of the
reference computation on the SAME weights (models/torch_replay.py), then
(b) run the two-scale evaluator on N Cityscapes val images and print the
per-class IoU table for comparison with the reference's evaluate_val.py.

Usage:
  python -m diga_tpu.cli.parity_check --preset gta2city_warmup \
      --weight_dir <dir with student.pth> [--eval_limit 50] [--skip_eval]
"""

from __future__ import annotations

import numpy as np

from .common import base_parser, get_config


def activation_parity(weight_dir: str, num_classes: int = 19,
                      layers=(3, 4, 23, 3)) -> float:
    """Max |logits_flax - logits_torch_replay| on a random input."""
    import jax.numpy as jnp
    import torch

    from ..models.convert import load_torch_state_dict, segmodel_from_torch
    from ..models.resnet_deeplab import DeepLabV2
    from ..models.torch_replay import segmodel_forward_torch

    sd = load_torch_state_dict(f"{weight_dir}/student.pth")
    params, stats = segmodel_from_torch(sd, layers)
    model = DeepLabV2(num_classes=num_classes, layers=tuple(layers))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 129, 225, 3)).astype(np.float32)
    _, _, logits_jax, _ = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    logits_t, _ = segmodel_forward_torch(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), layers=tuple(layers),
        num_classes=num_classes)
    diff = float(np.max(np.abs(
        np.asarray(logits_jax) - logits_t.detach().numpy().transpose(0, 2, 3, 1))))
    print(f"activation parity: max |logits_flax - logits_torch| = {diff:.2e}")
    return diff


def eval_confusion_vs_torch(cfg, weight_dir: str, eval_limit: int = 50):
    """BASELINE gate-#1 harness: run the SAME role-keyed weights through
    (a) our jitted two-scale evaluator and (b) a pure-torch replay of the
    reference eval pipeline (evaluate_val.py:60-89: bilinear
    align_corners=True down/up-sampling, elementwise max merge, argmax,
    bincount confusion), over the SAME preprocessed val images, and
    return both confusion matrices plus the fraction of disagreeing
    pixels (float-reassociation argmax flips only; must be ~0).
    """
    import torch
    import torch.nn.functional as F

    from ..data import cityscapes_dataset
    from ..eval.evaluator import TwoScaleEvaluator
    from ..models.convert import load_torch_state_dict
    from ..models.torch_replay import segmodel_forward_torch
    from ..train.build import build_experiment

    layers = tuple(cfg.extra.get("layers", (3, 4, 23, 3)))
    ncls = cfg.eval.num_classes
    out_hw, ds_hw = tuple(cfg.eval.out_hw), tuple(cfg.eval.ds_hw)

    state, _, eval_apply, _ = build_experiment(cfg, load_weight_dir=weight_dir)
    ds = cityscapes_dataset(cfg.data.target_root, cfg.data.val_img_list,
                            cfg.data.val_lbl_list, split="val", resize_hw=out_hw)
    ev = TwoScaleEvaluator(lambda img: eval_apply(state, img), num_classes=ncls,
                           out_hw=out_hw, ds_hw=ds_hw)
    sd = load_torch_state_dict(f"{weight_dir}/student.pth")

    conf_torch = np.zeros((ncls, ncls), np.int64)
    preds_ours, preds_torch, labels = [], [], []
    n = min(eval_limit or len(ds), len(ds))
    for i in range(n):
        s = ds[i]
        img = s["image"][None]
        lbl = s["label"][None].astype(np.int32)
        preds_ours.append(np.asarray(ev.update(img, lbl)))
        labels.append(lbl)

        # torch replay of the reference eval math on the same tensors
        with torch.no_grad():
            x = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
            x_ds = F.interpolate(x, ds_hw, mode="bilinear", align_corners=True)
            logits, _ = segmodel_forward_torch(sd, x, layers=layers, num_classes=ncls)
            logits_ds, _ = segmodel_forward_torch(sd, x_ds, layers=layers, num_classes=ncls)
            up = lambda v: F.interpolate(v, out_hw, mode="bilinear", align_corners=True)
            merged = torch.maximum(up(logits), up(logits_ds))
            pred = merged.argmax(1).numpy()
        preds_torch.append(pred)
        mask = (lbl >= 0) & (lbl < ncls)
        conf_torch += np.bincount(
            ncls * lbl[mask].astype(np.int64) + pred[mask],
            minlength=ncls * ncls).reshape(ncls, ncls)

    conf_ours = np.asarray(ev.score.confusion, np.int64)
    disagree = float(np.mean([np.mean(a != b)
                              for a, b in zip(preds_ours, preds_torch)]))
    print(f"gate-1: {n} images, pixel disagreement vs torch replay = "
          f"{disagree:.2e}; confusion L1 gap = "
          f"{np.abs(conf_ours - conf_torch).sum()} / {conf_ours.sum()} pixels")
    return conf_ours, conf_torch, disagree


def main(argv=None):
    p = base_parser("DiGA-TPU parity check vs reference checkpoints")
    p.add_argument("--weight_dir", type=str, required=True)
    p.add_argument("--skip_eval", action="store_true",
                   help="only run the activation diff (no dataset needed)")
    p.add_argument("--vs_torch_replay", action="store_true",
                   help="gate-1: compare the full two-scale eval confusion "
                        "matrix against the torch replay on the same images")
    args = p.parse_args(argv)
    cfg = get_config(args)

    activation_parity(args.weight_dir, cfg.train.num_classes,
                      tuple(cfg.extra.get("layers", (3, 4, 23, 3))))
    if args.vs_torch_replay:
        conf_ours, conf_torch, disagree = eval_confusion_vs_torch(
            cfg, args.weight_dir, args.eval_limit or 50)
        if not disagree < 1e-3:  # not `assert` — must survive python -O
            raise SystemExit(
                f"gate-1 FAILED: two-scale eval disagrees with the torch "
                f"replay on {disagree:.2%} of pixels (threshold 0.1%)")
        return conf_ours, conf_torch, disagree
    if args.skip_eval:
        return

    from .evaluate_val import main as eval_main

    eval_args = ["--preset", args.preset, "--weight_dir", args.weight_dir]
    if args.eval_limit:
        eval_args += ["--eval_limit", str(args.eval_limit)]
    for field in ("target_root", "val_img_list", "val_lbl_list"):
        v = getattr(args, field)
        if v:
            eval_args += [f"--{field}", v]
    return eval_main(eval_args)


if __name__ == "__main__":
    main()
