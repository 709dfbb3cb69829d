"""DDIM sampler as a single fused lax.scan (reference: cldm/ddim_hacked.py).

TPU-first rework of the reference's host-side python loop:
  * the whole S-step trajectory is one `lax.scan` inside one jit — no
    host<->device round trips, no per-step dispatch;
  * classifier-free guidance runs cond and uncond through ONE model call on
    a stacked 2B batch (the reference calls apply_model twice per step,
    ddim_hacked.py:190-191);
  * the hint is VAE-encoded once before the loop (the reference re-encodes
    it every step: cldm_ctrlora_inference.py:170);
  * supports eps- and v-parameterization, eta noise, temperature, mask
    inpainting, and per-step ucg schedules.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params
from ctrlora_tpu.schedules import (
    DDIMSchedule, make_ddim_schedule, predict_eps_from_z_and_v,
    predict_start_from_z_and_v, q_sample,
)


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    steps: int = 50
    eta: float = 0.0
    guidance_scale: float = 7.5
    temperature: float = 1.0
    # guess mode: the uncond CFG pass runs WITHOUT control (reference:
    # app/gradio_ctrlora.py:308); combine with decayed control_scales
    guess_mode: bool = False
    # per-step guidance scales overriding guidance_scale (e.g. guess mode);
    # indexed in sampling order (t descending)
    ucg_schedule: Optional[Sequence[float]] = None
    # lax.scan body unroll: >1 lets XLA fuse across step boundaries and
    # halves the while-loop iteration overhead (material on runtimes with
    # high per-dispatch latency). Must divide `steps`.
    scan_unroll: int = 1
    # precompute all t-dependent projections (TimestepEmbed MLP + per-block
    # emb_proj Linears) for every step BEFORE the scan and gather one row per
    # step. XLA cannot hoist them itself (t is loop-dynamic) and in-loop they
    # cost ~23 ms/step on TPU (perf/step_glue.py). No effect on results.
    hoist_time_embed: bool = True
    # precompute every cross-attn site's K|V projection of the (loop-
    # invariant) text context before the scan (pipe.xattn_kv_tables) — the
    # in-loop dots rerun ~23 sites x S steps of identical work. No effect on
    # results (same fused dot, same operands). Applies to the fused/no-LoRA
    # path; branches with runtime LoRA or IP tokens keep in-loop projections.
    hoist_xattn_kv: bool = False

    def __post_init__(self):
        if self.scan_unroll < 1:
            raise ValueError(f"scan_unroll must be >= 1, got {self.scan_unroll}")


def ddim_sample(
    pipe: CtrLoraPipeline,
    params: Params,
    rng: jax.Array,
    context: jnp.ndarray,  # [B, S, D] conditional text context
    uncond_context: Optional[jnp.ndarray],  # [B, S, D] or None for no CFG
    conds: Optional[Sequence[Conditioning]],
    latent_shape: Sequence[int],  # (B, h, w, c)
    cfg: DDIMConfig = DDIMConfig(),
    control_scales: Optional[jnp.ndarray] = None,
    x_T: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,  # [B,h,w,c] 1=keep x0 region
    x0: Optional[jnp.ndarray] = None,
    ddim_schedule: Optional[DDIMSchedule] = None,
    ip_context: Optional[jnp.ndarray] = None,  # [B, ip_tokens, D]
    uncond_ip_context: Optional[jnp.ndarray] = None,  # CFG uncond half's ip
) -> jnp.ndarray:
    """Returns final latents [B, h, w, c]. Jit-compatible (wrap in jax.jit
    with pipe/cfg static or close over them)."""
    sched = pipe.schedule
    dd = ddim_schedule or make_ddim_schedule(sched, cfg.steps, eta=cfg.eta)
    B = latent_shape[0]
    use_cfg = uncond_context is not None and cfg.guidance_scale != 1.0

    rng, init_rng = jax.random.split(rng)
    img = (
        x_T
        if x_T is not None
        else jax.random.normal(init_rng, tuple(latent_shape), jnp.float32)
    )

    # stack cond/uncond into one 2B batch: uncond uses the SAME hints
    # (reference: uc_cat = c_cat, cldm/cldm.py:398)
    if use_cfg:
        full_context = jnp.concatenate([context, uncond_context], axis=0)
        # replace() keeps every other field — notably control_params, the
        # fused-LoRA override; rebuilding positionally once dropped it and
        # CFG sampling silently fell back to the slower runtime-LoRA branch
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
            # the reference's style app feeds image_proj(zeros) to the
            # uncond half (app/gradio_ctrlora_style_transfer.py:410)
            u_ip = uncond_ip_context if uncond_ip_context is not None else ip_context
            full_ip = jnp.concatenate([ip_context, u_ip], axis=0)
    else:
        full_context = context
        full_conds = conds
        full_ip = ip_context

    # tables gathered per scan step, ordered t-descending
    order = jnp.arange(dd.num_steps - 1, -1, -1)
    ts_seq = jnp.asarray(dd.timesteps)[order]
    a_seq = jnp.asarray(dd.alphas)[order]
    ap_seq = jnp.asarray(dd.alphas_prev)[order]
    s1m_seq = jnp.asarray(dd.sqrt_one_minus_alphas)[order]
    sig_seq = jnp.asarray(dd.sigmas)[order]
    if cfg.ucg_schedule is not None:
        assert len(cfg.ucg_schedule) == dd.num_steps
        ucg_seq = jnp.asarray(cfg.ucg_schedule, jnp.float32)
    else:
        ucg_seq = jnp.full((dd.num_steps,), cfg.guidance_scale, jnp.float32)

    sqrt_ac = jnp.asarray(sched.sqrt_alphas_cumprod)
    sqrt_1mac = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)
    v_param = pipe.cfg.diffusion.parameterization == "v"

    # all t-dependent projections for all steps, computed once up front.
    # The per-step cost is dominated by KERNEL COUNT, not FLOPs: producing
    # the ~70 per-block rows with individual slices (scan xs machinery,
    # static slices of a packed vector, or a one-hot gather) measured
    # identical to not hoisting at all, while loop-invariant rows ran
    # 22.6 ms/step faster (perf/step_glue2.py bisect — the consuming adds
    # are free; the per-row slice kernels are not). So ALL branches' tables
    # are stacked into ONE padded [S, n, Cmax] array — one scan-xs slice
    # per step — and split into per-block rows by a single multi-output
    # Pallas kernel launch (ops/unpack_rows.py).
    if cfg.hoist_time_embed:
        from ctrlora_tpu.sampling.common import make_emb_row_tables

        packed_xs, _rows_of = make_emb_row_tables(pipe, params, full_conds, ts_seq)
    else:
        packed_xs, _rows_of = None, lambda block: None

    # cross-attn K|V of the loop-invariant context: computed once here, the
    # scan closes over the tables as loop constants
    kv_tables = (
        pipe.xattn_kv_tables(params, full_context, full_conds)
        if cfg.hoist_xattn_kv and full_ip is None
        else None
    )

    def model_out(x, t_scalar, rows):
        tvec = jnp.full((x.shape[0],), t_scalar, jnp.int32)
        if use_cfg:
            x2 = jnp.concatenate([x, x], axis=0)
            cmask = None
            if cfg.guess_mode:
                cmask = jnp.concatenate(
                    [jnp.ones((B,), jnp.float32), jnp.zeros((B,), jnp.float32)]
                )
            out = pipe.apply_model(
                params, x2, jnp.concatenate([tvec, tvec]), full_context,
                full_conds, control_scales, ip_context=full_ip,
                control_batch_mask=cmask, emb_rows=rows, kv_rows=kv_tables,
            )
            return out[:B], out[B:]
        out = pipe.apply_model(
            params, x, tvec, full_context, full_conds, control_scales,
            ip_context=full_ip, emb_rows=rows, kv_rows=kv_tables,
        )
        return out, None

    # every sigma exactly 0 -> skip the per-step rng splits and the normal
    # draw entirely (each is several extra kernel launches per step, and
    # launch overhead is material on remote-dispatch runtimes). Decided from
    # the concrete sigma table — trace-time constants — so explicit
    # sub-schedules (ddim_decode_from) also get the eta-0 fast path.
    import numpy as _np

    stochastic = bool(_np.max(_np.asarray(dd.sigmas)) > 0) if dd.num_steps else False

    def step(carry, inputs):
        img, rng = carry
        (t_scalar, a_t, a_prev, s1m_t, sigma_t, scale), packed = inputs
        rows = _rows_of(packed)
        if stochastic or mask is not None:
            rng, noise_rng, mask_rng = jax.random.split(rng, 3)

        if mask is not None:
            assert x0 is not None
            tvec = jnp.full((B,), t_scalar, jnp.int32)
            img_orig = q_sample(
                sqrt_ac, sqrt_1mac, x0, tvec,
                jax.random.normal(mask_rng, img.shape, img.dtype),
            )
            img = img_orig * mask + (1.0 - mask) * img

        out_c, out_u = model_out(img, t_scalar, rows)
        model_output = out_c if out_u is None else out_u + scale * (out_c - out_u)

        tvec = jnp.full((B,), t_scalar, jnp.int32)
        if v_param:
            e_t = predict_eps_from_z_and_v(sched, img, tvec, model_output)
            pred_x0 = predict_start_from_z_and_v(sched, img, tvec, model_output)
        else:
            e_t = model_output
            pred_x0 = (img - s1m_t * e_t) / jnp.sqrt(a_t)

        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
        img_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if stochastic:
            img_prev = img_prev + (
                sigma_t * cfg.temperature
            ) * jax.random.normal(noise_rng, img.shape, img.dtype)
        return (img_prev, rng), None

    (img, _), _ = jax.lax.scan(
        step,
        (img, rng),
        ((ts_seq, a_seq, ap_seq, s1m_seq, sig_seq, ucg_seq), packed_xs),
        unroll=cfg.scan_unroll if dd.num_steps % cfg.scan_unroll == 0 else 1,
    )
    return img


def ddim_encode(
    pipe: CtrLoraPipeline,
    params: Params,
    x0: jnp.ndarray,
    t_enc: int,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray] = None,
    conds: Optional[Sequence[Conditioning]] = None,
    steps: int = 50,
    guidance_scale: float = 1.0,
    control_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic DDIM inversion: run the first `t_enc` rungs of the DDIM
    ladder FORWARD, mapping clean latents x0 to x_{t_enc} such that eta=0
    decoding reproduces x0 (reference: cldm/ddim_hacked.py:233-279).

    Per step i (t ascending, a = ddim_alphas_prev[i], a_next = ddim_alphas[i]):
        x <- sqrt(a_next/a) x + sqrt(a_next) (sqrt(1/a_next-1) - sqrt(1/a-1)) eps
    One lax.scan, CFG via the stacked 2B batch like ddim_sample.
    """
    import numpy as np

    dd = make_ddim_schedule(pipe.schedule, steps)
    assert t_enc <= dd.num_steps
    a_next = np.asarray(dd.alphas)[:t_enc]
    a = np.asarray(dd.alphas_prev)[:t_enc]
    ts_seq = jnp.asarray(dd.timesteps)[:t_enc]
    xt_w = jnp.asarray(np.sqrt(a_next / a), jnp.float32)
    eps_w = jnp.asarray(
        np.sqrt(a_next) * (np.sqrt(1.0 / a_next - 1.0) - np.sqrt(1.0 / a - 1.0)),
        jnp.float32,
    )

    B = x0.shape[0]
    use_cfg = uncond_context is not None and guidance_scale != 1.0
    if use_cfg:
        full_context = jnp.concatenate([context, uncond_context], axis=0)
        full_conds = (
            [
                dataclasses.replace(c, hint=jnp.concatenate([c.hint, c.hint], axis=0))
                for c in conds
            ]
            if conds
            else None
        )
    else:
        full_context = context
        full_conds = conds

    from ctrlora_tpu.sampling.common import make_emb_row_tables

    rows_xs, rows_of = make_emb_row_tables(pipe, params, full_conds, ts_seq)

    def step(x, inputs):
        (t_scalar, w_x, w_e), blk = inputs
        rows = rows_of(blk)
        tvec = jnp.full((B,), t_scalar, jnp.int32)
        if use_cfg:
            out = pipe.apply_model(
                params, jnp.concatenate([x, x]), jnp.concatenate([tvec, tvec]),
                full_context, full_conds, control_scales, emb_rows=rows,
            )
            eps = out[B:] + guidance_scale * (out[:B] - out[B:])
        else:
            eps = pipe.apply_model(params, x, tvec, full_context, full_conds,
                                   control_scales, emb_rows=rows)
        return w_x * x + w_e * eps, None

    x, _ = jax.lax.scan(step, x0, ((ts_seq, xt_w, eps_w), rows_xs))
    return x


def ddim_stochastic_encode(
    pipe: CtrLoraPipeline,
    x0: jnp.ndarray,
    t_index: jnp.ndarray,
    rng: jax.Array,
    steps: int,
) -> jnp.ndarray:
    """Noise x0 to DDIM step index t (reference: ddim_hacked.py:281-295);
    used by the style-transfer pipeline's img2img path."""
    dd = make_ddim_schedule(pipe.schedule, steps)
    sqrt_a = jnp.sqrt(jnp.asarray(dd.alphas))
    sqrt_1ma = jnp.asarray(dd.sqrt_one_minus_alphas)
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    sel = lambda tab: jnp.take(tab, t_index).reshape(-1, *([1] * (x0.ndim - 1)))
    return sel(sqrt_a) * x0 + sel(sqrt_1ma) * noise


def ddim_decode_from(
    pipe: CtrLoraPipeline,
    params: Params,
    x_latent: jnp.ndarray,
    t_start: int,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    conds: Optional[Sequence[Conditioning]],
    cfg: DDIMConfig,
    rng: jax.Array,
    control_scales: Optional[jnp.ndarray] = None,
    ip_context: Optional[jnp.ndarray] = None,
    uncond_ip_context: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM decode starting from an intermediate step (reference:
    ddim_hacked.py:297-317). Runs the first t_start steps of the ladder."""
    full = make_ddim_schedule(pipe.schedule, cfg.steps, eta=cfg.eta)
    sub = DDIMSchedule(
        timesteps=full.timesteps[:t_start],
        alphas=full.alphas[:t_start],
        alphas_prev=full.alphas_prev[:t_start],
        sqrt_one_minus_alphas=full.sqrt_one_minus_alphas[:t_start],
        sigmas=full.sigmas[:t_start],
    )
    return ddim_sample(
        pipe, params, rng, context, uncond_context, conds,
        x_latent.shape, dataclasses.replace(cfg, steps=t_start),
        control_scales=control_scales, x_T=x_latent, ddim_schedule=sub,
        ip_context=ip_context, uncond_ip_context=uncond_ip_context,
    )
