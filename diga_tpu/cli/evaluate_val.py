"""Evaluate a segmentation checkpoint with two-scale max-merge mIoU.

Mirrors the reference evaluate_val.py (and the DG multi-dataset variant,
domain_generalization/evaluate_val.py:71-130).

Usage:
  python -m diga_tpu.cli.evaluate_val --preset gta2city_warmup \
      --weight_dir ./work_dir/weights --target_root ./data/Cityscapes
"""

from __future__ import annotations

import os

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
        yield {"image": s["image"][None], "label": s["label"][None].astype(np.int32),
               "name": s["name"]}


def main(argv=None):
    p = base_parser("DiGA-TPU two-scale evaluation")
    p.add_argument("--weight_dir", type=str, default=None,
                   help="role-keyed .pth dir (student.pth) to evaluate")
    p.add_argument("--datasets", type=str, default="cityscapes",
                   help="comma list: cityscapes,bdd,mapillary (DG eval)")
    # per-dataset roots/lists so one invocation covers the DG triple
    # (domain_generalization/evaluate_val.py:71-130 hard-codes three val
    # sets; cityscapes defaults to --target_root/--val_img_list/--val_lbl_list)
    for d in ("cityscapes", "bdd", "mapillary"):
        p.add_argument(f"--{d}_root", type=str, default=None)
        p.add_argument(f"--{d}_img_list", type=str, default=None)
        p.add_argument(f"--{d}_lbl_list", type=str, default=None)
    p.add_argument("--dump_preds", type=str, default=None,
                   help="directory to write per-image trainId prediction PNGs "
                        "(readable by cli/make_viz); one subdir per dataset "
                        "when evaluating several")
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
    if mesh is None and args.shard == "spatial":
        p.error("--shard spatial requires --n_devices (no mesh was built, "
                "so the evaluator would silently run unsharded)")

    state, _, eval_apply, model = build_experiment(cfg, load_weight_dir=args.weight_dir)

    eval_sets = cfg.extra.get("eval_datasets", {
        "cityscapes": {"out_hw": cfg.eval.out_hw, "ds_hw": cfg.eval.ds_hw}
    })
    dataset_names = args.datasets.split(",")
    results = {}
    for name in dataset_names:
        spec = eval_sets[name]
        root = getattr(args, f"{name}_root") or cfg.data.target_root
        img_list = getattr(args, f"{name}_img_list") or cfg.data.val_img_list
        lbl_list = getattr(args, f"{name}_lbl_list") or cfg.data.val_lbl_list
        if name == "cityscapes":
            ds = cityscapes_dataset(root, img_list, lbl_list, split="val",
                                    resize_hw=spec["out_hw"])
        elif name == "bdd":
            ds = bdd_dataset(root, img_list, lbl_list, resize_hw=spec["out_hw"])
        elif name == "mapillary":
            ds = mapillary_dataset(root, img_list, lbl_list,
                                   resize_hw=spec["out_hw"])
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
        dump_dir = None
        if args.dump_preds:
            dump_dir = (args.dump_preds if len(dataset_names) == 1
                        else os.path.join(args.dump_preds, name))
            os.makedirs(dump_dir, exist_ok=True)
        for i, batch in enumerate(iter_val(ds, args.eval_limit)):
            pred = ev.update(batch["image"], batch["label"])
            if dump_dir is not None:
                from PIL import Image

                base = os.path.splitext(os.path.basename(batch["name"]))[0]
                Image.fromarray(np.asarray(pred[0], np.uint8)).save(
                    os.path.join(dump_dir, base + ".png"))
            if i % 50 == 0:
                print(f"eval: {i} batches processed", flush=True)
        scores, cls_iu = ev.score.get_scores()
        names = CLASS_NAMES_19 if cfg.eval.num_classes == 19 else CLASS_NAMES_16
        for i, cname in enumerate(names):
            print(f"===>{cname}: {cls_iu[i]}")
        for k, v in scores.items():
            print(f"{name} {k}: {v}")
        results[name] = scores
    return results


if __name__ == "__main__":
    main()
