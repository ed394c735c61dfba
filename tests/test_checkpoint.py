"""Checkpoint round-trip: orbax full-state save/restore."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.models.resnet_deeplab import DeepLabV2, head_param_mask
from diga_tpu.ops.prototypes import Centroids
from diga_tpu.train.optim import sgd_grouped
from diga_tpu.train.schedules import poly_schedule
from diga_tpu.train.state import create_seg_state
from diga_tpu.utils.checkpoint import restore_train_state, save_train_state


def test_orbax_roundtrip(tmp_path):
    model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = model.init({"params": k, "dropout": k}, x, train=False)
    opt = sgd_grouped(poly_schedule(1e-3, 100), head_param_mask(variables["params"]))
    state = create_seg_state(model, opt, k, (32, 64),
                             centroids=Centroids.create(19, 256))
    state = state.replace(step=jnp.asarray(42, jnp.int32))

    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    restored = restore_train_state(path, state)

    assert int(restored.step) == 42
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(state.centroids.vectors), np.asarray(restored.centroids.vectors))


def test_async_roundtrip(tmp_path):
    from diga_tpu.utils.checkpoint import wait_for_checkpoints

    model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    k = jax.random.PRNGKey(1)
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = model.init({"params": k, "dropout": k}, x, train=False)
    opt = sgd_grouped(poly_schedule(1e-3, 100), head_param_mask(variables["params"]))
    state = create_seg_state(model, opt, k, (32, 64))

    path = str(tmp_path / "ckpt_async")
    # two background saves to the same path: the second must serialize
    # behind (not race) the first
    save_train_state(path, state.replace(step=jnp.asarray(7, jnp.int32)),
                     background=True)
    save_train_state(path, state.replace(step=jnp.asarray(8, jnp.int32)),
                     background=True)
    wait_for_checkpoints()
    restored = restore_train_state(path, state)
    assert int(restored.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
