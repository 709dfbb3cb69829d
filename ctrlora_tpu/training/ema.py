"""Exponential moving average of parameters (reference: ldm/modules/ema.py
LitEma — decay min(decay, (1+updates)/(10+updates)); hooked by the trainer
behind TrainConfig.use_ema, as the reference hooks it at ddpm.py:465-467;
every shipped ctrlora config sets use_ema: False).

To avoid shadowing the ~1.2B frozen params, the shadow tree stores a 0-size
placeholder for leaves whose trainable-mask entry is False; `ema_params`
swaps in the shadow wherever its shape matches the live param.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

_PLACEHOLDER = None  # built lazily per-leaf as a 0-size array


def _placeholder():
    return jnp.zeros((0,), jnp.float32)


class EmaState(NamedTuple):
    params: Any
    updates: jnp.ndarray  # int32 counter


def ema_init(params, mask: Optional[Any] = None) -> EmaState:
    """Shadow copy of `params`; with `mask`, only True leaves are shadowed
    (False leaves hold a 0-size placeholder)."""
    # jnp.array(copy=True): jnp.asarray would alias the live param buffer,
    # and a donating train step then donates the same buffer twice (params
    # and shadow), which XLA rejects at execute time
    copy = lambda p: jnp.array(p, copy=True)
    if mask is None:
        shadow = jax.tree_util.tree_map(copy, params)
    else:
        shadow = jax.tree_util.tree_map(
            lambda p, m: copy(p) if m else _placeholder(), params, mask
        )
    return EmaState(shadow, jnp.zeros((), jnp.int32))


def ema_update(
    state: EmaState, new_params, decay: float = 0.9999, mask: Optional[Any] = None
) -> EmaState:
    updates = state.updates + 1
    d = jnp.minimum(decay, (1.0 + updates) / (10.0 + updates))

    def upd(e, p):
        return e - (1.0 - d) * (e - p.astype(e.dtype))

    if mask is None:
        ema = jax.tree_util.tree_map(upd, state.params, new_params)
    else:
        ema = jax.tree_util.tree_map(
            lambda e, p, m: upd(e, p) if m else e, state.params, new_params, mask
        )
    return EmaState(ema, updates)


def ema_params(params, ema: EmaState):
    """Evaluation params: shadow values where tracked, live values elsewhere
    (the reference's ema_scope swap, ldm/models/diffusion/ddpm.py:185-199)."""
    return jax.tree_util.tree_map(
        lambda p, e: e if e.shape == p.shape else p, params, ema.params
    )


def ema_swap(params, ema: EmaState):
    """Back-compat alias: full-shadow EMA params."""
    return ema.params
