"""Subprocess body for the 2-process jax.distributed smoke test.

Each process: initialize the distributed runtime (CPU backend, 2 virtual
local devices), build the GLOBAL 4-device mesh, assemble a global batch
from process-local data, and run one jitted data-parallel step whose
gradient all-reduce crosses the process boundary.

argv: coordinator_address num_processes process_id [fixture_root] [n_local]
Prints "RESULT loss=<f> n_global=<n> n_local=<n>" on success.
``n_local`` (default 2) sets the virtual devices per process — the parent
test also runs a 1-process/4-device layout over the SAME fixtures and
asserts the losses match the 2x2 layout bit for bit (loader layout
independence, data/pipeline.py BatchLoader contract).
"""

import os
import sys

_N_LOCAL = int(sys.argv[5]) if len(sys.argv) > 5 else 2

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
    + f" --xla_force_host_platform_device_count={_N_LOCAL}"
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
    assert n_local == _N_LOCAL
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

    # ---- the REAL harness over the same 2-process mesh: host-sharded
    # loaders -> make_array_from_process_local_data assembly -> jitted DG
    # step with cross-process gradient all-reduce (run_training end to end)
    fixture_root = sys.argv[4] if len(sys.argv) > 4 else None
    if fixture_root:
        import dataclasses

        from diga_tpu.configs.presets import (DataConfig, EvalConfig,
                                              ExperimentConfig, LoaderSpec,
                                              TrainConfig)
        from diga_tpu.train.build import build_experiment
        from diga_tpu.train.loop import run_training

        cfg = ExperimentConfig(
            name="mh_dg", stage="dg",
            data=DataConfig(
                source_root=os.path.join(fixture_root, "gta"),
                target_root=os.path.join(fixture_root, "city"),
                source_list=os.path.join(fixture_root, "gta", "train.txt"),
                target_img_list=os.path.join(fixture_root, "city", "train_img.txt"),
                target_lbl_list=os.path.join(fixture_root, "city", "train_lbl.txt"),
                val_img_list=os.path.join(fixture_root, "city", "train_img.txt"),
                val_lbl_list=os.path.join(fixture_root, "city", "train_lbl.txt"),
                num_workers=1,
                source_streams=(LoaderSpec("gta5", (40, 72), 1),),
                target_streams=(LoaderSpec("cityscapes", (40, 72), 1),),
            ),
            train=TrainConfig(crop_hw=(32, 64), num_steps=2, eval_every=0,
                              compute_dtype="float32", remat=False),
            eval=EvalConfig(out_hw=(40, 72), ds_hw=(20, 36)),
            extra={"layers": (1, 1, 1, 1)},
        )
        state, step_fn, eval_apply, _ = build_experiment(cfg, mesh=mesh)
        result, state = run_training(
            cfg, state, step_fn, None,
            work_dir=os.path.join(fixture_root, f"work_p{pid}"),
            num_steps=2, log_every=1, mesh=mesh)
        loss2 = float(result.last_metrics["loss"])
        # global batch = recipe(1) x 4 devices, each process loaded 2 rows
        print(f"HARNESS loss={loss2:.6f}", flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
