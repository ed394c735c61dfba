"""Shared CLI plumbing: argparse base, preset override, mesh setup."""

from __future__ import annotations

import argparse
import dataclasses
import json

from ..configs.presets import ExperimentConfig, get_preset


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--preset", type=str, required=True,
                   help="experiment preset name (see diga_tpu.configs.PRESETS)")
    p.add_argument("--work_dir", type=str, default="./work_dir")
    p.add_argument("--source_root", type=str, default=None)
    p.add_argument("--target_root", type=str, default=None)
    p.add_argument("--source_list", type=str, default=None)
    p.add_argument("--target_img_list", type=str, default=None)
    p.add_argument("--target_lbl_list", type=str, default=None)
    p.add_argument("--val_img_list", type=str, default=None)
    p.add_argument("--val_lbl_list", type=str, default=None)
    p.add_argument("--pseudo_dir", type=str, default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--eval_limit", type=int, default=None,
                   help="evaluate only the first N val images (CI configs)")
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["bfloat16", "float32"])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before building "
                        "the mesh (TPU pods / SLURM auto-detect coordinator "
                        "envs); loaders then feed per-host shards "
                        "(docs/SCALING.md)")
    p.add_argument("--extra", action="append", default=[], metavar="KEY=VALUE",
                   help="override an ExperimentConfig.extra entry (repeatable); "
                        "values parse as JSON when possible, else raw strings "
                        "(e.g. --extra photometric=kornia --extra "
                        "fuse_forwards=true)")
    p.add_argument("--parity", action="store_true",
                   help="pin EVERY documented deviation knob (docs/PARITY.md) "
                        "to the reference-faithful setting at once: "
                        "photometric=kornia, compute_dtype=float32, and any "
                        "--extra tgt_stats_forward override is dropped "
                        "(restoring the reference per-stage semantics). Wins "
                        "over conflicting --compute_dtype/--extra values so "
                        "a 'parity' run always means one thing.")
    return p


def apply_overrides(cfg: ExperimentConfig, args) -> ExperimentConfig:
    data_kw = {}
    for field in ("source_root", "target_root", "source_list", "target_img_list",
                  "target_lbl_list", "val_img_list", "val_lbl_list", "pseudo_dir"):
        v = getattr(args, field, None)
        if v is not None:
            data_kw[field] = v
    train_kw = {}
    if args.num_steps is not None:
        train_kw["num_steps"] = args.num_steps
    if getattr(args, "compute_dtype", None):
        train_kw["compute_dtype"] = args.compute_dtype
    if getattr(args, "seed", None) is not None:
        train_kw["seed"] = args.seed
    cli_extra = {}
    for item in getattr(args, "extra", []) or []:
        key, sep, raw = item.partition("=")
        if not sep:
            raise SystemExit(f"--extra expects KEY=VALUE, got {item!r}")
        try:
            cli_extra[key] = json.loads(raw)
        except json.JSONDecodeError:
            cli_extra[key] = raw
    if getattr(args, "parity", False):
        # one switch == all reference-faithful knobs (docs/PARITY.md):
        # kornia photometric chain, f32 compute, and the reference's
        # per-stage tgt_stats_forward semantics (preset default)
        cli_extra.pop("tgt_stats_forward", None)
        cli_extra["photometric"] = "kornia"
        train_kw["compute_dtype"] = "float32"
    extra = {**cfg.extra, **cli_extra}
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, **data_kw),
        train=dataclasses.replace(cfg.train, **train_kw),
        extra=extra,
    )


def get_config(args) -> ExperimentConfig:
    return apply_overrides(get_preset(args.preset), args)


def make_mesh_from_args(args):
    from ..parallel import make_mesh

    import jax

    if getattr(args, "multihost", False):
        # auto-detects coordinator/process envs on TPU pods and SLURM;
        # must run before any device query
        jax.distributed.initialize()
    n = args.n_devices
    if n is None:
        n = len(jax.devices())
    return make_mesh(n)
