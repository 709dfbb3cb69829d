"""Same-process decomposition of the headline benchmark: time the full
sample() jit (as bench.py measures), ddim_sample alone at 50 steps, and the
fixed stages (text encode / hint encode / decode), back to back on the same
tunnel session so environment drift can't skew the comparison.

Run: python perf/sample_decomp.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50


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

    batch, size, lat = 4, 512, 64
    hint = jnp.ones((batch, size, size, 3), jnp.float32) * 0.5
    ids = jnp.ones((batch, cfg.clip.max_length), jnp.int32)
    ddim = DDIMConfig(steps=STEPS, guidance_scale=7.5)

    def run(label, fn, *args, n=2):
        j = jax.jit(fn)
        np.asarray(j(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            np.asarray(j(*args))
        dt = (time.perf_counter() - t0) / n
        print(f"  {label:40s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    # (1) the bench's full sample fn
    def sample(params, fused, hint, ids, rng):
        ctx = pipe.encode_text_tokens(params, ids)
        uncond = pipe.encode_text_tokens(params, jnp.zeros_like(ids))
        hint_z = pipe.encode_first_stage(params, hint)
        conds = [Conditioning(hint_z, control_params=fused)]
        z = ddim_sample(pipe, params, rng, ctx, uncond, conds,
                        (batch, lat, lat, 4), ddim)
        return pipe.decode_first_stage(params, z)

    rng = jax.random.PRNGKey(1)
    full = run("full sample() 50 steps + codecs", sample, params, fused, hint, ids, rng)

    # (2) ddim_sample alone (precomputed ctx/hints, no decode)
    ctx0 = jnp.zeros((batch, 77, 768), jnp.float32)
    hz0 = jnp.zeros((batch, lat, lat, 4), jnp.float32)

    def ddim_only(params, fused, ctx0, hz0, rng):
        conds = [Conditioning(hz0, control_params=fused)]
        return jnp.sum(ddim_sample(pipe, params, rng, ctx0, ctx0, conds,
                                   (batch, lat, lat, 4), ddim))

    dd = run("ddim_sample alone, 50 steps", ddim_only, params, fused, ctx0, hz0, rng)

    # (3) fixed stages
    tx = run("2x text encode", lambda p, ids: (
        jnp.sum(pipe.encode_text_tokens(p, ids))
        + jnp.sum(pipe.encode_text_tokens(p, jnp.zeros_like(ids)))), params, ids)
    he = run("hint encode 512^2", lambda p, h: jnp.sum(
        pipe.encode_first_stage(p, h)), params, hint)
    de = run("decode 512^2", lambda p, z: jnp.sum(
        pipe.decode_first_stage(p, z)), params, hz0)

    print(f"\n  parts sum = {1e3*(dd + tx + he + de):9.1f} ms "
          f"vs full {1e3*full:9.1f} ms")
    print(f"  per-step (ddim/{STEPS}) = {1e3*dd/STEPS:6.1f} ms")


if __name__ == "__main__":
    main()
