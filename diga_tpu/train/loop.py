"""Generic training harness: loaders -> jitted step -> eval -> checkpoint.

Drives any of the stage steps (train/steps.py) with:
  * dual-scale multi-stream batching (the reference's small+full loader
    pairs, train_DiGA_gta2city_warm_up.py:117-136) assembled host-side
  * device prefetch (double buffering) over an optional data mesh
  * in-training two-scale eval every ``eval_every`` steps with
    best-mIoU checkpointing (reference :343-373)
  * full-state orbax checkpoints + reference-format .pth export
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import DataConfig, ExperimentConfig, LoaderSpec
from ..data import (
    BatchLoader,
    Compose,
    RandomCrop,
    RandomHorizontallyFlip,
    RandomSizedAndCrop,
    bdd_dataset,
    cityscapes_dataset,
    gta5_dataset,
    mapillary_dataset,
    synthia_dataset,
)
from ..eval.evaluator import TwoScaleEvaluator
from ..utils.logging import MetricLogger


def build_dataset(spec: LoaderSpec, data_cfg: DataConfig, crop_hw, is_source: bool,
                  val: bool = False):
    """Instantiate a SegDataset for one stream, with the stage-appropriate
    geometric augmentation (source gets random-resize, target plain crop —
    reference warm_up.py:97-103)."""
    if val:
        transform = None
    else:
        sized = data_cfg.source_sized_crop if is_source else data_cfg.target_sized_crop
        crop_cls = RandomSizedAndCrop if sized else RandomCrop
        transform = Compose([RandomHorizontallyFlip(), crop_cls(list(crop_hw))])

    kw = dict(resize_hw=spec.resize_hw, transform=transform)
    if spec.kind == "gta5":
        return gta5_dataset(data_cfg.source_root, data_cfg.source_list, **kw)
    if spec.kind == "synthia":
        return synthia_dataset(data_cfg.source_root, data_cfg.source_list, **kw)
    if spec.kind == "cityscapes":
        root = data_cfg.source_root if is_source else data_cfg.target_root
        img_list = data_cfg.source_list if is_source else data_cfg.target_img_list
        if is_source:
            # semiseg labeled split reuses the cityscapes layout
            lbl_list = data_cfg.source_lbl_list or data_cfg.target_lbl_list
        else:
            lbl_list = data_cfg.target_lbl_list
        ds = cityscapes_dataset(
            root, img_list, lbl_list, split=spec.split,
            pseudo_dir=data_cfg.pseudo_dir if spec.use_pseudo else None,
            **kw,
        )
        return ds
    if spec.kind == "bdd":
        return bdd_dataset(data_cfg.target_root, data_cfg.target_img_list,
                           data_cfg.target_lbl_list, **kw)
    if spec.kind == "mapillary":
        return mapillary_dataset(data_cfg.target_root, data_cfg.target_img_list,
                                 data_cfg.target_lbl_list, **kw)
    raise ValueError(f"unknown dataset kind {spec.kind}")


class MultiStreamLoader:
    """Concatenates the dual-scale streams of one domain into one batch.

    The reference samples a small-resize loader and a full-resize loader
    and concatenates along batch (warm_up.py:208-230); both were already
    cropped to the same size, so the concat is shape-safe.
    """

    def __init__(self, datasets_and_batches, seed: int, num_workers: int):
        import jax

        # multi-host: each process loads only its shard of every file list
        # (deterministic per-host striding, EpochShuffleSampler)
        hid, hcnt = jax.process_index(), jax.process_count()
        self.loaders = [
            BatchLoader(ds, batch_size=b, seed=seed + 17 * i,
                        num_workers=num_workers, host_id=hid, host_count=hcnt)
            for i, (ds, b) in enumerate(datasets_and_batches)
        ]

    def __iter__(self) -> Iterator[dict]:
        iters = [iter(l) for l in self.loaders]
        while True:
            parts = [next(it) for it in iters]
            out = {}
            for key in parts[0]:
                if key == "name":
                    out[key] = sum((p[key] for p in parts), [])
                else:
                    out[key] = np.concatenate([p[key] for p in parts], axis=0)
            yield out

    def stop(self):
        for l in self.loaders:
            l.stop()


def make_train_iterator(cfg: ExperimentConfig, with_target: bool,
                        batch_scale: int = 1):
    """Yields step batches: {'s_img','s_lbl'[,'t_img','t_lbl','t_pseudo']}.

    ``batch_scale``: per-chip batch semantics over a data mesh — every
    stream's batch is multiplied by the mesh size, so each device carries
    the reference's recipe batch (the global batch is recipe x N and the
    leading axis always divides the mesh).  N=1 reproduces the reference
    recipe exactly; N>1 is standard data-parallel scaling with global
    (cross-replica) BN statistics under GSPMD.
    """
    crop = cfg.train.crop_hw
    src = MultiStreamLoader(
        [(build_dataset(s, cfg.data, crop, True), s.batch * batch_scale)
         for s in cfg.data.source_streams],
        seed=cfg.train.seed, num_workers=cfg.data.num_workers,
    )
    tgt = None
    if with_target:
        tgt = MultiStreamLoader(
            [(build_dataset(s, cfg.data, crop, False), s.batch * batch_scale)
             for s in cfg.data.target_streams],
            seed=cfg.train.seed + 1000, num_workers=cfg.data.num_workers,
        )

    def gen():
        s_it = iter(src)
        t_it = iter(tgt) if tgt else None
        while True:
            s = next(s_it)
            batch = {"s_img": s["image"], "s_lbl": s["label"]}
            if t_it is not None:
                t = next(t_it)
                batch["t_img"] = t["image"]
                batch["t_lbl"] = t["label"]
                if "pseudo" in t:
                    batch["t_pseudo"] = t["pseudo"]
            yield batch

    return gen(), src, tgt


def make_val_iterator(cfg: ExperimentConfig, limit: int | None = None,
                      batch: int = 1):
    """Batched val iterator; pads the tail batch by repeating the last
    image and masking its labels to ignore (so sharded eval gets full
    batches without perturbing the confusion matrix)."""
    ds = cityscapes_dataset(
        cfg.data.target_root, cfg.data.val_img_list, cfg.data.val_lbl_list,
        split="val", resize_hw=cfg.eval.out_hw,
    )
    n = len(ds) if limit is None else min(limit, len(ds))

    def gen():
        for start in range(0, n, batch):
            idx = list(range(start, min(start + batch, n)))
            samples = [ds[i] for i in idx]
            images = [s["image"] for s in samples]
            labels = [s["label"].astype(np.int32) for s in samples]
            while len(images) < batch:  # pad tail
                images.append(images[-1])
                labels.append(np.full_like(labels[-1], 255))
            yield {"image": np.stack(images), "label": np.stack(labels)}

    return gen


@dataclasses.dataclass
class TrainLoopResult:
    best_miou: float
    best_step: int
    last_metrics: dict


def run_training(
    cfg: ExperimentConfig,
    state,
    step_fn: Callable,
    eval_apply_fn: Callable | None,
    work_dir: str,
    num_steps: int | None = None,
    eval_limit: int | None = None,
    on_best: Callable | None = None,
    mesh=None,
    log_every: int = 50,
    profile_steps: tuple[int, int] | None = None,
    viz_every: int = 0,
    save_every: int = 0,
    save_path: str | None = None,
) -> tuple[TrainLoopResult, object]:
    """The outer loop: sample, step, log, eval, checkpoint-best.

    ``profile_steps=(start, stop)`` captures a jax.profiler trace of those
    steps to <work_dir>/profile (the reference has no tracing at all,
    SURVEY.md §5.1).  ``viz_every`` dumps train-view image grids.
    """
    from ..data.pipeline import device_prefetch
    from ..parallel import batch_sharding

    os.makedirs(work_dir, exist_ok=True)
    logger = MetricLogger(work_dir)
    steps = num_steps if num_steps is not None else cfg.train.num_steps
    # target streams: self-training consumes them for consensus/CutMix;
    # warm-up/DG consume them for the reference's no-grad student(tdatav)
    # forward whose BN-stats side effect we replicate by default
    # (StepConfig.tgt_stats_forward; --extra tgt_stats_forward=false drops
    # both the forward and the target loaders)
    from ..train.build import wants_target

    with_target = wants_target(cfg)

    # per-chip batch semantics: each mesh device carries the recipe batch
    # (see make_train_iterator.batch_scale).  Multi-host: each process
    # loads only the rows for its own devices; device_prefetch assembles
    # them into global arrays (data/pipeline.py).
    if mesh is not None:
        pid = jax.process_index()
        local = sum(int(d.process_index == pid) for d in mesh.devices.flat)
        batch_scale = max(local, 1)
    else:
        batch_scale = 1
    it, src, tgt = make_train_iterator(cfg, with_target, batch_scale=batch_scale)
    sharding = batch_sharding(mesh) if mesh is not None else None
    it = device_prefetch(it, sharding=sharding, buffer_size=2)

    best_miou, best_step = 0.0, 0
    metrics = {}
    _evaluator = None
    t_last = time.time()
    # exact resume: continue from the restored step counter (the reference
    # restarted its schedule from 0 on every reload, SURVEY.md §5.4)
    start = int(np.asarray(jax.device_get(state.step))) if hasattr(state, "step") else 0
    for i in range(start, steps):
        if profile_steps and i == profile_steps[0]:
            jax.profiler.start_trace(os.path.join(work_dir, "profile"))
        batch = next(it)
        batch.pop("t_lbl", None)
        state, metrics = step_fn(state, batch)
        if profile_steps and i == profile_steps[1]:
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
        if viz_every and i % viz_every == 0:
            from ..utils.visualize import dump_train_views

            dump_train_views(
                os.path.join(work_dir, "views"), i,
                {"source": np.asarray(batch["s_img"][:2])},
                {"label": np.asarray(batch["s_lbl"][:2])},
            )
        if i % log_every == 0:
            host_metrics = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_last
            t_last = time.time()
            host_metrics["steps_per_sec"] = (log_every if i else 1) / max(dt, 1e-9)
            logger.log(i, host_metrics)
            logger.print(i, host_metrics, every=log_every)

        if save_every and save_path and i > 0 and i % save_every == 0:
            # periodic full-state checkpoint: crash recovery for 80k-step
            # runs (the reference only saved on new-best mIoU); background
            # write so the hot loop only pays the device->host snapshot
            from ..utils.checkpoint import save_train_state

            save_train_state(save_path, state, background=True)

        if eval_apply_fn is not None and cfg.train.eval_every > 0 and i > 0 and i % cfg.train.eval_every == 0:
            # one evaluator for the whole run: state is a jit ARGUMENT, so
            # the two-scale program compiles once, not once per eval pass
            if _evaluator is None:
                _evaluator = TwoScaleEvaluator(
                    eval_apply_fn,
                    num_classes=cfg.eval.num_classes,
                    out_hw=cfg.eval.out_hw, ds_hw=cfg.eval.ds_hw,
                    with_state=True,
                )
            ev = _evaluator
            ev.score.reset()
            scores, _ = ev.run(make_val_iterator(cfg, eval_limit)(), state=state)
            miou = float(scores["mean_iou"])
            logger.log(i, {"miou": miou}, prefix="val/")
            print(f"step {i}: val mIoU {miou:.4f}", flush=True)
            if miou > best_miou:
                best_miou, best_step = miou, i
                if on_best is not None:
                    on_best(state, i, miou)

    src.stop()
    if tgt:
        tgt.stop()
    if save_every and save_path:
        from ..utils.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
    logger.plot()  # final loss/mIoU curve PNGs next to metrics.jsonl
    logger.close()
    return TrainLoopResult(best_miou, best_step, {k: float(v) for k, v in metrics.items()}), state
