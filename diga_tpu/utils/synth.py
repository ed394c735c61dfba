"""Synthetic batches shaped like a preset's real loader output.

Used by the repo-root ``bench.py`` and ``diga_tpu.cli.profile_step`` so
throughput/attribution runs need no datasets: shapes/dtypes match what
``data.pipeline.BatchLoader`` emits for the preset (NHWC f32 images in
the reference's normalized range, int32 labels in [0, num_classes)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def synth_batch(cfg, seed: int = 0) -> dict:
    """A random batch matching ``cfg``'s stream shapes (see module doc)."""
    from ..train.build import wants_target

    rr = np.random.default_rng(seed)
    h, w = cfg.train.crop_hw
    bs = sum(s.batch for s in cfg.data.source_streams)
    bt = sum(s.batch for s in cfg.data.target_streams)
    ncls = cfg.train.num_classes
    batch = {
        "s_img": jnp.asarray(rr.normal(size=(bs, h, w, 3)).astype(np.float32) * 0.5),
        "s_lbl": jnp.asarray(rr.integers(0, ncls, size=(bs, h, w)).astype(np.int32)),
    }
    if wants_target(cfg):
        batch["t_img"] = jnp.asarray(
            rr.normal(size=(bt, h, w, 3)).astype(np.float32) * 0.5)
    if cfg.stage == "selftrain":
        batch["t_pseudo"] = jnp.asarray(
            rr.integers(0, ncls, size=(bt, h, w)).astype(np.int32))
    return batch
