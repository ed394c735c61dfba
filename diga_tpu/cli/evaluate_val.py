"""Evaluate a segmentation checkpoint with two-scale max-merge mIoU.

Mirrors the reference evaluate_val.py (and the DG multi-dataset variant,
domain_generalization/evaluate_val.py:71-130).

Usage:
  python -m diga_tpu.cli.evaluate_val --preset gta2city_warmup \
      --weight_dir ./work_dir/weights --target_root ./data/Cityscapes
"""

from __future__ import annotations

import sys

import numpy as np

from .common import base_parser, get_config, make_mesh_from_args
from ..train.build import build_experiment
from ..eval.evaluator import TwoScaleEvaluator
from ..data import bdd_dataset, cityscapes_dataset, mapillary_dataset
from ..data.label_maps import CLASS_NAMES_16, CLASS_NAMES_19


def iter_val(ds, limit=None):
    n = len(ds) if limit is None else min(limit, len(ds))
    for i in range(n):
        s = ds[i]
        yield {"image": s["image"][None], "label": s["label"][None].astype(np.int32)}


def main(argv=None):
    p = base_parser("DiGA-TPU two-scale evaluation")
    p.add_argument("--weight_dir", type=str, default=None,
                   help="role-keyed .pth dir (student.pth) to evaluate")
    p.add_argument("--datasets", type=str, default="cityscapes",
                   help="comma list: cityscapes,bdd,mapillary (DG eval)")
    p.add_argument("--shard", type=str, default="batch",
                   choices=["batch", "spatial"],
                   help="'spatial' + --n_devices shards the image HEIGHT over "
                        "the mesh for lowest single-image full-res latency "
                        "(GSPMD conv halos).  'batch' runs unsharded here — "
                        "this CLI iterates single-image batches; batch-sharded "
                        "eval runs inside the train loop's batched val path")
    args = p.parse_args(argv)
    cfg = get_config(args)
    mesh = make_mesh_from_args(args)
    if mesh is not None and args.shard == "batch":
        print("note: --n_devices without --shard spatial has no effect in "
              "this CLI (single-image batches); running unsharded")

    state, _, eval_apply, model = build_experiment(cfg, load_weight_dir=args.weight_dir)

    eval_sets = cfg.extra.get("eval_datasets", {
        "cityscapes": {"out_hw": cfg.eval.out_hw, "ds_hw": cfg.eval.ds_hw}
    })
    results = {}
    for name in args.datasets.split(","):
        spec = eval_sets[name]
        if name == "cityscapes":
            ds = cityscapes_dataset(cfg.data.target_root, cfg.data.val_img_list,
                                    cfg.data.val_lbl_list, split="val",
                                    resize_hw=spec["out_hw"])
        elif name == "bdd":
            ds = bdd_dataset(cfg.data.target_root, cfg.data.val_img_list,
                             cfg.data.val_lbl_list, resize_hw=spec["out_hw"])
        elif name == "mapillary":
            ds = mapillary_dataset(cfg.data.target_root, cfg.data.val_img_list,
                                   cfg.data.val_lbl_list, resize_hw=spec["out_hw"])
        else:
            raise ValueError(name)
        ev = TwoScaleEvaluator(lambda img: eval_apply(state, img),
                               num_classes=cfg.eval.num_classes,
                               out_hw=tuple(spec["out_hw"]), ds_hw=tuple(spec["ds_hw"]),
                               # this CLI iterates single-image batches, so a
                               # mesh only helps in spatial mode (batch-sharded
                               # eval runs inside the train loop's batched path)
                               mesh=mesh if args.shard == "spatial" else None,
                               shard=args.shard)
        scores, cls_iu = ev.run(iter_val(ds, args.eval_limit), progress=True)
        names = CLASS_NAMES_19 if cfg.eval.num_classes == 19 else CLASS_NAMES_16
        for i, cname in enumerate(names):
            print(f"===>{cname}: {cls_iu[i]}")
        for k, v in scores.items():
            print(f"{name} {k}: {v}")
        results[name] = scores
    return results


if __name__ == "__main__":
    main()
