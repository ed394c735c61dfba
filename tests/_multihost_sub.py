"""Subprocess body for the 2-process jax.distributed smoke test.

Each process: initialize the distributed runtime (CPU backend, 2 virtual
local devices), build the GLOBAL 4-device mesh, assemble a global batch
from process-local data, and run one jitted data-parallel step whose
gradient all-reduce crosses the process boundary.

argv: coordinator_address num_processes process_id
Prints "RESULT loss=<f> n_global=<n> n_local=<n>" on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_proc, process_id=pid)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from diga_tpu.parallel import batch_sharding, make_mesh, replicated

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == n_proc * n_local, (n_global, n_proc, n_local)

    mesh = make_mesh()  # all global devices
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    w = jax.device_put(w, replicated(mesh))

    # global batch: one row per GLOBAL device, assembled from local shards
    gb = n_global
    x_global = rng.normal(size=(gb, 8)).astype(np.float32)  # same on both procs
    y_global = rng.normal(size=(gb, 4)).astype(np.float32)
    local_rows = slice(pid * n_local, (pid + 1) * n_local)
    sharding = batch_sharding(mesh)
    x = jax.make_array_from_process_local_data(sharding, x_global[local_rows], (gb, 8))
    y = jax.make_array_from_process_local_data(sharding, y_global[local_rows], (gb, 4))

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    @jax.jit
    def step(w, x, y):
        loss, g = jax.value_and_grad(loss_fn)(w, x, y)
        return w - 0.1 * g, loss  # grad of a sharded-batch mean => all-reduce

    w, loss = step(w, x, y)
    loss = float(loss)
    # every process must see the identical global loss
    print(f"RESULT loss={loss:.6f} n_global={n_global} n_local={n_local}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
