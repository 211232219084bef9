"""Per-group Adam with schedulable LRs and densification-aware moments.

TPU-native equivalent of the reference's torch.optim.Adam usage
(hugs/models/scene.py:196-219): one optimizer, named parameter groups with
individual learning rates, eps=1e-15, and the exponential position-LR
schedule (hugs/utils/general.py:126-159). Functional: state is a pytree;
densification surgery (zeroing moments at reused slots — the analog of the
reference's exp_avg cat/prune, scene.py:310-379) is done by the model code
mutating `state.mu` / `state.nu` directly.

Dead (padding) Gaussians receive exactly zero gradient from the renderer,
so their moments stay zero and their params never move — no masking is
needed for correctness, mirroring the reference where they don't exist.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GroupAdamState(NamedTuple):
    mu: dict       # pytree like params
    nu: dict       # pytree like params
    step: jnp.ndarray  # () int32


def expon_lr(lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000) -> Callable:
    """Log-linear interpolated decay (Plenoxels/JaxNeRF semantics,
    reference general.py:126-159). Returns a traced-step -> lr function."""
    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return jnp.where(step < 0, 0.0, delay * log_lerp)
    return helper


def group_adam_init(params: dict) -> GroupAdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return GroupAdamState(mu=zeros,
                          nu=jax.tree.map(jnp.zeros_like, params),
                          step=jnp.int32(0))


def group_adam_update(
    grads: dict,
    state: GroupAdamState,
    params: dict,
    lrs: dict,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[dict, GroupAdamState]:
    """One Adam step. `lrs` maps each top-level param key to either a float
    LR or a scalar array (e.g. from expon_lr(step)). Keys absent from
    `lrs` get LR 0 (frozen), matching reference groups with lr 0.

    Returns (new_params, new_state).
    """
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    def upd(path_key):
        def f(g, m, v, p):
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            mhat = m2 / bc1
            vhat = v2 / bc2
            lr = lrs.get(path_key, 0.0)
            return p - lr * mhat / (jnp.sqrt(vhat) + eps), m2, v2
        return f

    new_params, new_mu, new_nu = {}, {}, {}
    for k in params:
        p, m, v = jax.tree.map(
            upd(k), grads[k], state.mu[k], state.nu[k], params[k]
        ), None, None
        # tree.map over possibly-nested groups returns tuples at leaves;
        # unzip them
        leaves, treedef = jax.tree.flatten(
            p, is_leaf=lambda x: isinstance(x, tuple))
        ps = treedef.unflatten([l[0] for l in leaves])
        ms = treedef.unflatten([l[1] for l in leaves])
        vs = treedef.unflatten([l[2] for l in leaves])
        new_params[k], new_mu[k], new_nu[k] = ps, ms, vs

    return new_params, GroupAdamState(mu=new_mu, nu=new_nu, step=step)
