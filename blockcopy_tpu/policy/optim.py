"""RMSprop matching torch.optim.RMSprop semantics exactly.

The reference trains the policy with
``torch.optim.RMSprop(lr, weight_decay, momentum, centered=False)``
(``blockcopy/blockcopy/policy/policy.py:59-69``).  optax's rmsprop differs in
eps placement and weight-decay handling, so a 30-line exact port keeps the
online-RL dynamics identical:

    g   <- g + wd * p
    sq  <- alpha * sq + (1 - alpha) * g^2
    buf <- mu * buf + g / (sqrt(sq) + eps)      (if momentum mu > 0)
    p   <- p - lr * buf            (or p - lr * g / (sqrt(sq)+eps) if mu == 0)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RMSpropState(NamedTuple):
    square_avg: dict
    momentum_buf: dict


def init(params) -> RMSpropState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return RMSpropState(square_avg=zeros, momentum_buf=jax.tree.map(jnp.zeros_like, params))


def update(
    grads,
    state: RMSpropState,
    params,
    lr: float = 1e-4,
    weight_decay: float = 1e-3,
    momentum: float = 0.0,
    alpha: float = 0.99,
    eps: float = 1e-8,
):
    def upd(g, sq, buf, p):
        g = g + weight_decay * p
        sq = alpha * sq + (1.0 - alpha) * g * g
        step = g / (jnp.sqrt(sq) + eps)
        if momentum > 0:
            buf = momentum * buf + step
            step = buf
        return p - lr * step, sq, buf

    # flatten-transform-unflatten: structure-agnostic (an ``is_leaf`` tuple
    # probe on the mapped output would misfire if params ever contain
    # tuple-structured nodes)
    leaves_g, treedef = jax.tree.flatten(grads)
    leaves_sq = treedef.flatten_up_to(state.square_avg)
    leaves_buf = treedef.flatten_up_to(state.momentum_buf)
    leaves_p = treedef.flatten_up_to(params)
    out = [upd(*t) for t in zip(leaves_g, leaves_sq, leaves_buf, leaves_p)]
    new_params = jax.tree.unflatten(treedef, [t[0] for t in out])
    new_sq = jax.tree.unflatten(treedef, [t[1] for t in out])
    new_buf = jax.tree.unflatten(treedef, [t[2] for t in out])
    return new_params, RMSpropState(square_avg=new_sq, momentum_buf=new_buf)
