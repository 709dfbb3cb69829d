"""Why does a model eval cost 151ms inside ddim_sample's lax.scan but 70ms
in a bare fori_loop chain? Isolate: (a) fori chain, (b) lax.scan chain,
(c) real ddim_sample (5 steps, no encodes/decodes).

Run: python perf/scan_vs_fori.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10


def main():
    from ctrlora_tpu.configs import ctrlora_inference_config
    from ctrlora_tpu.lora_fuse import cast_params_for_inference, fuse_control_tree
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

    cfg = ctrlora_inference_config(lora_num=1, lora_rank=128)
    pipe = CtrLoraPipeline(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = pipe.init(jax.random.PRNGKey(0), image_size=8)
        fused = cast_params_for_inference(
            fuse_control_tree(params.control, 0, cfg.control.lora)
        )
        params = cast_params_for_inference(params)
    params = jax.device_put(params, jax.devices()[0])
    fused = jax.device_put(fused, jax.devices()[0])

    B = 8
    x = jnp.zeros((B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.zeros((B, 77, 768), jnp.float32)
    hint_z = jnp.zeros((B, 64, 64, 4), jnp.float32)

    def one_eval(params, fused, acc, t, ctx, hint_z):
        conds = [Conditioning(hint_z, control_params=fused)]
        return pipe.apply_model(params, acc, t, ctx, conds)

    def run(label, fn, *args):
        j = jax.jit(fn)
        np.asarray(j(*args))
        t0 = time.perf_counter()
        np.asarray(j(*args))
        dt = (time.perf_counter() - t0) / REPS
        print(f"  {label:34s} {dt*1e3:8.2f} ms/step", flush=True)

    def fori_chain(params, fused, x, t, ctx, hint_z):
        def body(_, acc):
            return one_eval(params, fused, acc, t, ctx, hint_z)

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, x))

    run("(a) fori_loop chain", fori_chain, params, fused, x, t, ctx, hint_z)

    def scan_chain(params, fused, x, t, ctx, hint_z):
        def step(carry, ts):
            out = one_eval(params, fused, carry, ts, ctx, hint_z)
            return out, None

        ts = jnp.full((REPS, B), 500, jnp.int32)
        out, _ = jax.lax.scan(step, x, ts)
        return jnp.sum(out)

    run("(b) lax.scan chain", scan_chain, params, fused, x, t, ctx, hint_z)

    # (c) the real sampler, 5 steps, CFG on (same model-batch 8: latent b4)
    x4 = jnp.zeros((4, 64, 64, 4), jnp.float32)
    hz4 = hint_z[:4]
    ctx4, un4 = ctx[:4], ctx[:4]

    def ddim5(params, fused, ctx4, un4, hz4):
        conds = [Conditioning(hz4, control_params=fused)]
        return jnp.sum(
            ddim_sample(
                pipe, params, jax.random.PRNGKey(0), ctx4, un4, conds,
                (4, 64, 64, 4), DDIMConfig(steps=REPS, guidance_scale=7.5),
            )
        )

    run("(c) ddim_sample (CFG, REPS steps)", ddim5, params, fused, ctx4, un4, hz4)


if __name__ == "__main__":
    main()
