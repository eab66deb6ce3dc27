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

    out = jax.tree.map(upd, grads, state.square_avg, state.momentum_buf, params)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
    new_sq = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, RMSpropState(square_avg=new_sq, momentum_buf=new_buf)
