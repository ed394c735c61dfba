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


def activation_parity(weight_dir: str, num_classes: int = 19) -> float:
    """Max |logits_flax - logits_torch_replay| on a random input."""
    import jax.numpy as jnp
    import torch

    from ..models.convert import load_torch_state_dict, segmodel_from_torch
    from ..models.resnet_deeplab import DeepLabV2
    from ..models.torch_replay import segmodel_forward_torch

    sd = load_torch_state_dict(f"{weight_dir}/student.pth")
    params, stats = segmodel_from_torch(sd)
    model = DeepLabV2(num_classes=num_classes)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 129, 225, 3)).astype(np.float32)
    _, _, logits_jax, _ = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    logits_t, _ = segmodel_forward_torch(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    diff = float(np.max(np.abs(
        np.asarray(logits_jax) - logits_t.detach().numpy().transpose(0, 2, 3, 1))))
    print(f"activation parity: max |logits_flax - logits_torch| = {diff:.2e}")
    return diff


def main(argv=None):
    p = base_parser("DiGA-TPU parity check vs reference checkpoints")
    p.add_argument("--weight_dir", type=str, required=True)
    p.add_argument("--skip_eval", action="store_true",
                   help="only run the activation diff (no dataset needed)")
    args = p.parse_args(argv)
    cfg = get_config(args)

    activation_parity(args.weight_dir, cfg.train.num_classes)
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
