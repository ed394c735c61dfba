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


def iter_val(ds, limit=None, batch=1):
    """Fixed-shape batches of ``batch`` images.  The final partial batch is
    padded by repeating the last image with all-ignore (255) labels, which
    contribute nothing to the confusion matrix; ``names`` lists only the
    real entries so prediction dumps skip the padding."""
    n = len(ds) if limit is None else min(limit, len(ds))
    for start in range(0, n, batch):
        samples = [ds[i] for i in range(start, min(start + batch, n))]
        k = len(samples)
        images = [s["image"] for s in samples]
        labels = [s["label"].astype(np.int32) for s in samples]
        while len(images) < batch:  # pad the tail to the compiled shape
            images.append(images[-1])
            labels.append(np.full_like(labels[-1], 255))
        yield {"image": np.stack(images), "label": np.stack(labels),
               "names": [s["name"] for s in samples], "valid": k}


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
                   help="'batch' + --eval_batch N + --n_devices shards each "
                        "N-image eval batch over the mesh (throughput mode); "
                        "'spatial' + --n_devices shards the image HEIGHT over "
                        "the mesh for lowest single-image full-res latency "
                        "(GSPMD conv halos)")
    p.add_argument("--eval_batch", type=int, default=1,
                   help="images per eval step; with --n_devices and --shard "
                        "batch this should be a multiple of the device count")
    args = p.parse_args(argv)
    cfg = get_config(args)
    mesh = make_mesh_from_args(args)
    if mesh is not None and args.shard == "batch" and args.eval_batch == 1:
        print("note: --n_devices with --shard batch needs --eval_batch > 1 "
              "to use the mesh; running unsharded single-image batches")
        mesh = None
    if mesh is None and args.shard == "spatial":
        p.error("--shard spatial requires --n_devices (no mesh was built, "
                "so the evaluator would silently run unsharded)")
    if args.shard == "spatial" and args.eval_batch != 1:
        p.error("--shard spatial evaluates single-image batches; "
                "--eval_batch applies to --shard batch")

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
                               mesh=mesh, shard=args.shard)
        dump_dir = None
        if args.dump_preds:
            dump_dir = (args.dump_preds if len(dataset_names) == 1
                        else os.path.join(args.dump_preds, name))
            os.makedirs(dump_dir, exist_ok=True)
        for i, batch in enumerate(iter_val(ds, args.eval_limit,
                                           batch=args.eval_batch)):
            pred = ev.update(batch["image"], batch["label"])
            if dump_dir is not None:
                from PIL import Image

                pred_np = np.asarray(pred[:batch["valid"]], np.uint8)
                for j, bname in enumerate(batch["names"]):
                    base = os.path.splitext(os.path.basename(bname))[0]
                    Image.fromarray(pred_np[j]).save(
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
