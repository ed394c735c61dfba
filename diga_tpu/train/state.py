"""Train-state pytrees.

One state carries everything the compiled step mutates: student + EMA
teacher params and their BN statistics, optimizer state, RNG, step
counter, and (for self-training) the class centroids.  The reference kept
these spread across module objects and a host-side Class_Features
(SURVEY.md §5.4); packing them in one pytree makes checkpointing atomic
and lets the whole update run inside a single jit.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.prototypes import Centroids


@flax.struct.dataclass
class SegTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    teacher_params: Any
    teacher_batch_stats: Any
    opt_state: Any
    rng: jax.Array
    centroids: Centroids | None = None
    # frozen translator params for warm-up/self-training stages
    frozen: Any = None


def create_seg_state(
    model,
    optimizer,
    rng: jax.Array,
    input_hw: tuple[int, int],
    centroids: Centroids | None = None,
    frozen: Any = None,
    init_batch: int = 1,
) -> SegTrainState:
    """Initialize student == teacher (reference create_teacher_params,
    util/utils.py:93-101)."""
    k_init, k_drop, k_state = jax.random.split(rng, 3)
    x = jnp.zeros((init_batch, *input_hw, 3), jnp.float32)
    variables = model.init({"params": k_init, "dropout": k_drop}, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return SegTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        teacher_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=opt_state,
        rng=k_state,
        centroids=centroids,
        frozen=frozen,
    )
