"""Bisect the ~21 ms/step gap between a bare-eval lax.scan chain (73 ms,
perf/scan_vs_fori.py) and the real ddim_sample step (94 ms).

Adds the sampler's per-step glue one piece at a time, all as 20-step scans
compiled and timed in ONE process (same tunnel session):

  v0  bare one_eval chain, b8 carry, constant t            [expect ~73]
  v1  + dynamic t gathered from a per-step table            [t-dependence]
  v2  + CFG glue: b4 carry, x2=concat([x,x]), split+combine [cfg glue]
  v3  + eps update math (pred_x0 / dir_xt / img_prev)       [expect ~94]

Run: python perf/step_glue.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20


def main():
    from ctrlora_tpu.configs import ctrlora_inference_config
    from ctrlora_tpu.lora_fuse import cast_params_for_inference, fuse_control_tree
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
    from ctrlora_tpu.schedules import make_ddim_schedule

    cfg = ctrlora_inference_config(lora_num=1, lora_rank=128)
    pipe = CtrLoraPipeline(cfg)

    def _make():
        params = pipe.init(jax.random.PRNGKey(0), image_size=8)
        fused = cast_params_for_inference(
            fuse_control_tree(params.control, 0, cfg.control.lora)
        )
        return cast_params_for_inference(params), fused

    t0 = time.perf_counter()
    params, fused = jax.jit(_make)()
    jax.block_until_ready(params)
    print(f"on-device init in {time.perf_counter()-t0:.0f}s", flush=True)

    B = 4
    ctx8 = jnp.zeros((2 * B, 77, 768), jnp.float32)
    ctx4 = jnp.zeros((B, 77, 768), jnp.float32)
    hint8 = jnp.zeros((2 * B, 64, 64, 4), jnp.float32)
    hint4 = jnp.zeros((B, 64, 64, 4), jnp.float32)
    x8 = jnp.zeros((2 * B, 64, 64, 4), jnp.float32)
    x4 = jnp.zeros((B, 64, 64, 4), jnp.float32)

    dd = make_ddim_schedule(pipe.schedule, 50)
    order = np.arange(dd.num_steps - 1, -1, -1)[:STEPS]
    ts_seq = jnp.asarray(np.asarray(dd.timesteps)[order])
    a_seq = jnp.asarray(np.asarray(dd.alphas)[order])
    ap_seq = jnp.asarray(np.asarray(dd.alphas_prev)[order])
    s1m_seq = jnp.asarray(np.asarray(dd.sqrt_one_minus_alphas)[order])

    def eval8(params, fused, x, tvec, ctx, hint):
        conds = [Conditioning(hint, control_params=fused)]
        return pipe.apply_model(params, x, tvec, ctx, conds)

    # v0: b8 carry, constant t
    def v0(params, fused, x, ctx, hint):
        def step(carry, _):
            tvec = jnp.full((2 * B,), 500, jnp.int32)
            return eval8(params, fused, carry, tvec, ctx, hint), None

        out, _ = jax.lax.scan(step, x, jnp.arange(STEPS))
        return jnp.sum(out)

    # v1: b8 carry, dynamic t from the table
    def v1(params, fused, x, ctx, hint):
        def step(carry, t_scalar):
            tvec = jnp.full((2 * B,), t_scalar, jnp.int32)
            return eval8(params, fused, carry, tvec, ctx, hint), None

        out, _ = jax.lax.scan(step, x, ts_seq)
        return jnp.sum(out)

    # v2: b4 carry + CFG concat/split/combine, dynamic t, NO eps math
    def v2(params, fused, x, ctx, hint):
        def step(carry, t_scalar):
            tvec = jnp.full((2 * B,), t_scalar, jnp.int32)
            x2 = jnp.concatenate([carry, carry], axis=0)
            out = eval8(params, fused, x2, tvec, ctx, hint)
            comb = out[B:] + 7.5 * (out[:B] - out[B:])
            return comb, None

        out, _ = jax.lax.scan(step, x, ts_seq)
        return jnp.sum(out)

    # v3: + eps update math == the full eta-0 sampler step
    def v3(params, fused, x, ctx, hint):
        def step(carry, inputs):
            t_scalar, a_t, a_prev, s1m_t = inputs
            tvec = jnp.full((2 * B,), t_scalar, jnp.int32)
            x2 = jnp.concatenate([carry, carry], axis=0)
            out = eval8(params, fused, x2, tvec, ctx, hint)
            e_t = out[B:] + 7.5 * (out[:B] - out[B:])
            pred_x0 = (carry - s1m_t * e_t) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e_t
            return jnp.sqrt(a_prev) * pred_x0 + dir_xt, None

        out, _ = jax.lax.scan(step, x, (ts_seq, a_seq, ap_seq, s1m_seq))
        return jnp.sum(out)

    variants = {
        "v0_const_t_b8": (v0, (params, fused, x8, ctx8, hint8)),
        "v1_dyn_t_b8": (v1, (params, fused, x8, ctx8, hint8)),
        "v2_cfg_glue_b4": (v2, (params, fused, x4, ctx8, hint8)),
        "v3_full_step_b4": (v3, (params, fused, x4, ctx8, hint8)),
    }

    compiled = {}
    for name, (fn, args) in variants.items():
        t0 = time.perf_counter()
        compiled[name] = jax.jit(fn).lower(*args).compile()
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    results = {}
    for rnd in range(3):
        line = []
        for name, (fn, args) in variants.items():
            c = compiled[name]
            np.asarray(c(*args))
            t0 = time.perf_counter()
            np.asarray(c(*args))
            dt = (time.perf_counter() - t0) / STEPS
            results.setdefault(name, []).append(dt)
            line.append(f"{name}={dt*1e3:.1f}ms")
        print(f"round {rnd}: " + " ".join(line), flush=True)

    print(json.dumps({k: round(float(np.median(v)) * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
