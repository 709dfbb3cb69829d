"""Shared sampler plumbing: the CFG-stacked model call.

Every sampler (DDIM/PLMS/DPM-Solver) needs the same guided-eps evaluation:
stack cond+uncond into one 2B batch, one model call, combine. The reference
duplicates this per sampler (ddim_hacked.py:190, plms.py:180,
dpm_solver/sampler.py); here it is one helper.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params


def make_guided_eps_fn(
    pipe: CtrLoraPipeline,
    params: Params,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    conds: Optional[Sequence[Conditioning]],
    guidance_scale: float,
    control_scales: Optional[jnp.ndarray] = None,
    guess_mode: bool = False,
    ip_context: Optional[jnp.ndarray] = None,
    uncond_ip_context: Optional[jnp.ndarray] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns eps_fn(x[B,...], t_scalar) -> guided model output [B,...].

    Matches ddim_sample's CFG semantics: a single 2B-batch call; uncond
    reuses the cond hints (reference: cldm/cldm.py:398); guess mode masks
    control off for the uncond half.
    """
    use_cfg = uncond_context is not None and guidance_scale != 1.0

    if use_cfg:
        import dataclasses

        full_context = jnp.concatenate([context, uncond_context], axis=0)
        # replace() keeps every other field — notably control_params, the
        # fused-LoRA override (a positional rebuild silently dropped it in
        # ddim.py once; same hazard here)
        full_conds = (
            [
                dataclasses.replace(
                    c, hint=jnp.concatenate([c.hint, c.hint], axis=0)
                )
                for c in conds
            ]
            if conds
            else None
        )
        full_ip = None
        if ip_context is not None:
            u_ip = uncond_ip_context if uncond_ip_context is not None else ip_context
            full_ip = jnp.concatenate([ip_context, u_ip], axis=0)
    else:
        full_context, full_conds, full_ip = context, conds, ip_context

    def eps_fn(
        x: jnp.ndarray, t_scalar: jnp.ndarray, emb_rows: Optional[dict] = None
    ) -> jnp.ndarray:
        B = x.shape[0]
        tvec = jnp.full((B,), t_scalar, jnp.int32)
        if use_cfg:
            x2 = jnp.concatenate([x, x], axis=0)
            cmask = None
            if guess_mode:
                cmask = jnp.concatenate(
                    [jnp.ones((B,), jnp.float32), jnp.zeros((B,), jnp.float32)]
                )
            out = pipe.apply_model(
                params, x2, jnp.concatenate([tvec, tvec]), full_context,
                full_conds, control_scales, ip_context=full_ip,
                control_batch_mask=cmask, emb_rows=emb_rows,
            )
            return out[B:] + guidance_scale * (out[:B] - out[B:])
        return pipe.apply_model(
            params, x, tvec, full_context, full_conds, control_scales,
            ip_context=full_ip, emb_rows=emb_rows,
        )

    return eps_fn


def make_emb_row_tables(
    pipe: CtrLoraPipeline,
    params: Params,
    conds: Optional[Sequence[Conditioning]],
    timesteps,  # [S] int32, the exact per-step eval timesteps in order
):
    """Hoisted time-embedding tables for a sampler scan.

    Returns (packed, rows_of): `packed` is a [S, n, Cmax] array to thread
    through scan xs (one slice per step), `rows_of(block)` rebuilds the
    per-branch emb_rows dict for pipe.apply_model from one step's [n, Cmax]
    block with a single multi-output Pallas launch (ops/unpack_rows.py).
    (None, rows_of) when the model variant has no hoistable structure —
    rows_of(None) is None, so samplers can thread it unconditionally.

    Why: per-step-varying rows produced by per-row slices cost ~22.6
    ms/step in kernel dispatch on TPU (perf/step_glue2.py bisect); one
    launch producing all ~70 rows removes that entirely.
    """
    tables = pipe.emb_proj_tables(params, jnp.asarray(timesteps), conds)
    if tables is None:
        return None, lambda block: None
    from ctrlora_tpu.ops.unpack_rows import pack_row_tables, unpack_rows

    flat = {f"u.{k}": v for k, v in tables["unet"].items()}
    for j, d in enumerate(tables["control"]):
        flat.update({f"c{j}.{k}": v for k, v in d.items()})
    packed, row_names, row_sizes = pack_row_tables(flat)
    n_conds = len(tables["control"])

    def rows_of(block):
        if block is None:
            return None
        rows = unpack_rows(block, row_sizes)
        out = {"unet": {}, "control": tuple({} for _ in range(n_conds))}
        for name, row in zip(row_names, rows):
            scope, key = name.split(".", 1)
            if scope == "u":
                out["unet"][key] = row
            else:
                out["control"][int(scope[1:])][key] = row
        return out

    return packed, rows_of
