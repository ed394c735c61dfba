"""Checkpointing: full train-state via orbax + reference-format export.

The reference saves only per-module ``state_dict`` files named by role
(student.pth/teacher.pth/enc_s.pth/..., util/utils.py:83-91) and never
persists optimizer/step/centroid state — resume restarts the schedule
(SURVEY.md §5.4).  Here:

  * ``save_train_state``/``restore_train_state`` checkpoint the ENTIRE
    SegTrainState (params, EMA teacher, BN stats, optimizer momentum,
    step, RNG, centroids) with orbax, so resume is exact.
  * ``background=True`` saves asynchronously (orbax AsyncCheckpointer):
    the device->host snapshot happens inline but the disk write runs on
    a background thread, so periodic ``--save_every`` checkpoints don't
    stall the train loop on filesystem latency.  ``wait_for_checkpoints``
    (or the next blocking save) joins outstanding writes.
  * ``export_role_keyed``/``load_role_keyed`` read/write the reference's
    .pth layout for artifact interop (stage chaining against
    reference-trained weights).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

_async_ckptr = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def save_train_state(path: str, state, background: bool = False) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    host_state = jax.tree_util.tree_map(np.asarray, state)
    if background:
        ckptr = _get_async_checkpointer()
        ckptr.save(path, args=ocp.args.StandardSave(host_state), force=True)
        return
    # join any in-flight background save first so a blocking save to the
    # same path can't race it (the docstring promises this)
    wait_for_checkpoints()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, host_state, force=True)
    ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Join any outstanding background checkpoint writes."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore_train_state(path: str, template):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def export_role_keyed(out_dir: str, roles: dict[str, dict]) -> None:
    """Write {role: torch-style state_dict} as <out_dir>/<role>.pth.

    ``roles`` values are flat torch-naming dicts (see models/convert.py).
    """
    import torch

    os.makedirs(out_dir, exist_ok=True)
    for role, sd in roles.items():
        tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        torch.save(tensors, os.path.join(out_dir, f"{role}.pth"))


def load_role_keyed(in_dir: str, roles: list[str]) -> dict[str, dict]:
    """Read <in_dir>/<role>.pth files into numpy state_dicts."""
    from ..models.convert import load_torch_state_dict

    return {r: load_torch_state_dict(os.path.join(in_dir, f"{r}.pth")) for r in roles}
