"""Optimizer matching torch-SGD semantics with DiGA's param grouping.

torch.optim.SGD(momentum=0.9, weight_decay=5e-4) applies weight decay to
the gradient BEFORE the momentum buffer, and the head param group runs at
10x the scheduled LR (reference: train_DiGA_gta2city_warm_up.py:156,
seg_model_noaux.py:319-321, util/utils.py:36-48).  Backbone BN affine
params are excluded from the optimizer entirely (requires_grad False),
so they get neither decay nor updates — the 'frozen' label reproduces
that.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def sgd_grouped(
    schedule: Callable,
    labels,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    head_mult: float = 10.0,
) -> optax.GradientTransformation:
    """SGD with per-label LR multipliers {backbone: 1, head: 10, frozen: 0}."""

    mults = {"backbone": 1.0, "head": head_mult, "frozen": 0.0}

    def init(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"mu": mu, "step": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        lr = schedule(state["step"])

        def upd(g, p, mu, label):
            m = mults[label]
            if m == 0.0:
                return jnp.zeros_like(p), mu
            g = g + weight_decay * p
            mu = momentum * mu + g
            return -(lr * m) * mu, mu

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_mu = treedef.flatten_up_to(state["mu"])
        flat_l = treedef.flatten_up_to(labels)
        out = [upd(g, p, mu, l) for g, p, mu, l in zip(flat_g, flat_p, flat_mu, flat_l)]
        updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        return updates, {"mu": new_mu, "step": state["step"] + 1}

    return optax.GradientTransformation(init, update)


def adam_torch(
    schedule: Callable, b1: float = 0.5, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam(0.5, 0.999) for the translator stage.

    reference: train_domain_translator.py:149-155
    """
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(schedule),
    )
