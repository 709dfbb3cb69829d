"""Exponential moving average of parameters (reference: ldm/modules/ema.py
LitEma — decay min(decay, (1+updates)/(10+updates)), every ctrlora config
ships use_ema: False but the subsystem exists for parity)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any
    updates: jnp.ndarray  # int32 counter


def ema_init(params) -> EmaState:
    return EmaState(jax.tree_util.tree_map(jnp.asarray, params), jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, new_params, decay: float = 0.9999) -> EmaState:
    updates = state.updates + 1
    d = jnp.minimum(decay, (1.0 + updates) / (10.0 + updates))
    ema = jax.tree_util.tree_map(
        lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)), state.params, new_params
    )
    return EmaState(ema, updates)


def ema_swap(params, ema: EmaState):
    """Return EMA params for evaluation (the reference's ema_scope)."""
    return ema.params
