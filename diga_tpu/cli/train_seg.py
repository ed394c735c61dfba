"""Unified segmentation trainer CLI for the DG / warm-up / self-training
stages.  Thin aliases live in train_warm_up.py, train_dg.py and
train_self_training.py, mirroring the reference script names.

Usage:
  python -m diga_tpu.cli.train_seg --preset gta2city_warmup \
      --source_root ./data/GTA5 --target_root ./data/Cityscapes \
      --work_dir ./work_dir/warmup [--load_weight_dir ./work_dir/translator]
"""

from __future__ import annotations

import os

from .common import base_parser, get_config, make_mesh_from_args
from ..train.build import build_experiment, export_state_role_keyed
from ..train.loop import run_training
from ..utils.checkpoint import save_train_state


# the reference auto-downloads its Caffe-converted ResNet-101 init
# (seg_model_noaux.py:7,328 model_zoo.load_url); same contract here via
# --pretrained_backbone auto
CAFFE_RESNET101_URL = (
    "http://vllab.ucmerced.edu/ytsai/CVPR18/"
    "DeepLab_resnet_pretrained_init-f81d91e8.pth"
)


def fetch_caffe_backbone(cache_dir: str | None = None) -> str:
    cache_dir = cache_dir or os.path.expanduser("~/.cache/diga_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(cache_dir, os.path.basename(CAFFE_RESNET101_URL))
    if os.path.exists(dest):
        return dest
    try:
        from urllib.request import urlretrieve

        print(f"downloading {CAFFE_RESNET101_URL} -> {dest}")
        urlretrieve(CAFFE_RESNET101_URL, dest)
    except Exception as e:
        raise SystemExit(
            f"could not download the Caffe ResNet-101 init ({e}); on an "
            f"air-gapped host, fetch it elsewhere and pass "
            f"--pretrained_backbone /path/to/{os.path.basename(dest)}"
        ) from e
    return dest


def main(argv=None, force_stage: str | None = None):
    p = base_parser("DiGA-TPU segmentation training")
    p.add_argument("--load_weight_dir", type=str, default=None,
                   help="previous-stage role-keyed weights (translator and/or student)")
    p.add_argument("--centroid_path", type=str, default=None,
                   help="initial class centroids (self-training stage)")
    p.add_argument("--pretrained_backbone", type=str, default=None,
                   help="backbone init .pth: the Caffe ResNet-101 "
                        "(seg_model_noaux.py:7), a SimCLRv2/ProDA checkpoint "
                        "(state_dict-wrapped, :336-347), or the ImageNet "
                        "hrnetv2 file for semiseg presets "
                        "(hrnet_module.py:564-594)")
    p.add_argument("--save_every", type=int, default=2000,
                   help="periodic full-state checkpoint interval (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="restore the full train state (params, EMA, optimizer, "
                        "step, centroids, RNG) from <work_dir>/ckpt_final if "
                        "present — exact resume, unlike the reference's "
                        "weights-only restart (SURVEY.md §5.3-5.4)")
    args = p.parse_args(argv)
    cfg = get_config(args)
    if force_stage is not None:
        assert cfg.stage == force_stage, (
            f"preset {cfg.name} is stage {cfg.stage!r}, expected {force_stage!r}"
        )

    if args.pretrained_backbone == "auto":
        args.pretrained_backbone = fetch_caffe_backbone()

    mesh = make_mesh_from_args(args)
    state, step, eval_apply, model = build_experiment(
        cfg,
        load_weight_dir=args.load_weight_dir,
        centroid_path=args.centroid_path,
        mesh=mesh,
        pretrained_backbone=args.pretrained_backbone,
    )

    resume_path = os.path.join(args.work_dir, "ckpt_final")
    if args.resume and os.path.exists(resume_path):
        from ..utils.checkpoint import restore_train_state

        state = restore_train_state(resume_path, state)
        print(f"resumed from {resume_path} at step {int(state.step)}")

    weight_dir = os.path.join(args.work_dir, "weights")

    model_kind = cfg.extra.get("model", "deeplab")
    layers = tuple(cfg.extra.get("layers", (3, 4, 23, 3)))

    def on_best(state, step_i, miou):
        export_state_role_keyed(state, weight_dir, layers=layers,
                                model_kind=model_kind,
                                hrnet_arch=cfg.extra.get("hrnet_arch", "w48"))
        save_train_state(os.path.join(args.work_dir, "ckpt_best"), state)
        print(f"saved best checkpoint at step {step_i} (mIoU {miou:.4f})")

    result, state = run_training(
        cfg, state, step, eval_apply,
        work_dir=args.work_dir,
        num_steps=args.num_steps,
        eval_limit=args.eval_limit,
        on_best=on_best,
        mesh=mesh,
        save_every=args.save_every,
        save_path=resume_path,
    )
    save_train_state(os.path.join(args.work_dir, "ckpt_final"), state)
    print(f"done: best mIoU {result.best_miou:.4f} @ step {result.best_step}")
    return result


if __name__ == "__main__":
    main()
