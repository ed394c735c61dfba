"""Two-scale max-merge evaluation.

Protocol (must match the reference bit-for-bit for mIoU parity,
reference: evaluate_val.py:73-93):
  1. forward the full-resolution image
  2. forward a bilinear (align_corners=True) downscale (e.g. 512x1024)
  3. upsample both logit maps to label resolution (align_corners=True)
  4. elementwise max-merge, argmax
  5. accumulate the confusion matrix — on device here, host numpy there

The whole per-image pipeline is one jitted program per (scale-pair);
prediction never leaves the device, only the final (K, K) matrix does.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.metrics import RunningScore, confusion_update
from ..ops.resize import resize_bilinear


def two_scale_logits(
    apply_fn: Callable,
    image: jnp.ndarray,
    out_hw: tuple[int, int],
    ds_hw: tuple[int, int],
) -> jnp.ndarray:
    """max(upsample(f(x)), upsample(f(downscale(x)))) at out_hw."""
    logits_full = apply_fn(image)
    image_ds = resize_bilinear(image, ds_hw)
    logits_ds = apply_fn(image_ds)
    up_full = resize_bilinear(logits_full, out_hw)
    up_ds = resize_bilinear(logits_ds, out_hw)
    return jnp.maximum(up_full, up_ds)


class TwoScaleEvaluator:
    """Streaming two-scale evaluator over a dataset iterator.

    ``apply_fn(image) -> logits`` must be the inference-mode model (NHWC
    in, NHWK logits out at any stride).
    """

    def __init__(
        self,
        apply_fn: Callable,
        num_classes: int = 19,
        out_hw: tuple[int, int] = (1024, 2048),
        ds_hw: tuple[int, int] = (512, 1024),
        mesh=None,
        shard: str = "batch",
        with_state: bool = False,
    ):
        """``mesh``: optional mesh.  ``shard='batch'`` shards eval batches
        over devices (batch size must divide by the mesh); ``'spatial'``
        shards the HEIGHT axis instead — the low-latency mode for
        single-image full-res inference, where GSPMD inserts conv halo
        exchanges automatically (out_hw[0] must divide by the mesh).  The
        confusion matrix stays replicated; its update all-reduces
        implicitly under GSPMD.
        """
        self.num_classes = num_classes
        self.out_hw = out_hw
        self.ds_hw = ds_hw
        self.mesh = mesh
        if shard not in ("batch", "spatial"):
            raise ValueError(f"shard must be 'batch' or 'spatial', got {shard!r}")
        self.shard = shard
        self.with_state = with_state
        self.score = RunningScore(num_classes)

        if with_state:
            # ``apply_fn(state, image)``: state is threaded as a jit argument
            # so ONE compiled program serves every eval pass of a training
            # run (a state-closure would bake the params as constants and
            # force a recompile per eval)
            def _step(conf, state, image, label):
                merged = two_scale_logits(
                    lambda im: apply_fn(state, im), image, out_hw, ds_hw)
                pred = jnp.argmax(merged, axis=-1)
                return confusion_update(conf, label, pred, num_classes), pred
        else:
            def _step(conf, image, label):
                merged = two_scale_logits(apply_fn, image, out_hw, ds_hw)
                pred = jnp.argmax(merged, axis=-1)
                return confusion_update(conf, label, pred, num_classes), pred

        if mesh is not None:
            from ..parallel import batch_sharding, replicated, spatial_sharding

            data_sh = (batch_sharding(mesh) if shard == "batch"
                       else spatial_sharding(mesh))
            self._data_sharding = data_sh
            conf_sh = (replicated(mesh),) + ((replicated(mesh),) if with_state else ())
            self._step = jax.jit(
                _step,
                in_shardings=(*conf_sh, data_sh, data_sh),
                out_shardings=(replicated(mesh), data_sh),
            )
        else:
            self._step = jax.jit(_step)

    def update(self, image, label, state=None):
        image = jnp.asarray(image)
        label = jnp.asarray(label)
        if self.mesh is not None:
            image = jax.device_put(image, self._data_sharding)
            label = jax.device_put(label, self._data_sharding)
        if self.with_state:
            assert state is not None, "with_state evaluator needs state="
            self.score.confusion, pred = self._step(
                self.score.confusion, state, image, label)
        else:
            self.score.confusion, pred = self._step(self.score.confusion, image, label)
        return pred

    def run(self, batches, progress: bool = False, state=None) -> tuple[dict, dict]:
        for i, batch in enumerate(batches):
            self.update(batch["image"], batch["label"], state=state)
            if progress and i % 50 == 0:
                print(f"eval: {i} batches processed", flush=True)
        return self.score.get_scores()
