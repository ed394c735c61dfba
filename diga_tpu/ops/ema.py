"""EMA teacher update as one fused tree-lerp.

reference: util/utils.py:93-116 — alpha ramps as min(1 - 1/(step+1), cap)
with cap 0.999.  BOTH warm-up and self-training use the ramp: every call
site invokes update_teacher_params(teacher, student, i_iter) with the
stage0=True default (warm_up.py:205, ..._self_training.py:221), so the
``stage0=False`` fixed-0.999 branch is dead code in the reference.  The
reference loops over parameters in Python; here it is a single jitted
``tree_map`` so XLA fuses the whole update into one pass over HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_alpha(step: jnp.ndarray, cap: float = 0.999, ramp: bool = True) -> jnp.ndarray:
    a = jnp.asarray(cap, jnp.float32)
    if ramp:
        a = jnp.minimum(1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), a)
    return a


def ema_update(teacher_params, student_params, alpha):
    """teacher <- alpha * teacher + (1 - alpha) * student (single fused pass)."""
    return jax.tree_util.tree_map(
        lambda t, s: (alpha * t.astype(jnp.float32) + (1.0 - alpha) * s.astype(jnp.float32)).astype(t.dtype),
        teacher_params,
        student_params,
    )
