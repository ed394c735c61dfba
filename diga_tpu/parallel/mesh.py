"""Device mesh + sharding helpers (single-controller JAX over ICI).

The reference has no distributed layer at all (SURVEY.md §2.1/§5.8): its
only multi-device artifact is an unused sync-BN implementation.  The
TPU-native equivalent is a 1-axis data mesh: batches shard over 'data',
params replicate, and XLA inserts the gradient all-reduce and global BN
statistics automatically under GSPMD jit.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
pass per-host shards of the file lists to the loaders (data/datasets.py
EpochShuffleSampler already shards by host).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"JAX device(s) exist ({devs}); for CPU emulation set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "force jax_platforms=cpu BEFORE first device use"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Height axis (NHWC dim 1) sharded over the mesh.

    The CNN analogue of sequence parallelism (SURVEY.md §5.7): for
    full-resolution 1024x2048 inference GSPMD inserts the halo exchanges
    for every conv automatically, so one image's latency scales over the
    mesh instead of only the batch dimension.  H must divide by the mesh
    size (Cityscapes 1024 over <=8 devices does).
    """
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a host batch with the leading axis sharded over 'data'."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out
