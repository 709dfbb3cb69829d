"""Per-module microbenchmarks: where do the non-matmul milliseconds go?

Times the UNet's building blocks at SD1.5 512x512 sampling shapes (batch 8 =
4 + CFG) in isolation, each chained inside one jit so remote-tunnel dispatch
and output-fetch don't pollute the numbers. Compares against the
bandwidth/compute floor for each block.

Run: python perf/block_microbench.py [--reps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_chained(fn, x, *rest, reps=30):
    """fn(x, *rest) -> same-shape-as-x; time `reps` chained calls in one jit."""

    def chained(x, *rest):
        def body(_, acc):
            return fn(acc, *rest)

        return jnp.sum(jax.lax.fori_loop(0, reps, body, x).astype(jnp.float32))

    j = jax.jit(chained)
    np.asarray(j(x, *rest))
    t0 = time.perf_counter()
    np.asarray(j(x, *rest))
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--skip_full", action="store_true",
                   help="skip the full apply_model section (slow compile)")
    p.add_argument("--only", default=None, help="run one section: gn|res|st|full")
    args = p.parse_args()
    reps = args.reps

    from flax.core import unfreeze

    from ctrlora_tpu.models.attention import SpatialTransformer
    from ctrlora_tpu.models.layers import GroupNorm32, ResBlock

    rng = jax.random.PRNGKey(0)
    CASES = [
        # (name, B, H, W, C) at 512^2 latents, batch 4 + CFG
        ("64x64 c320", 8, 64, 64, 320),
        ("32x32 c640", 8, 32, 32, 640),
        ("16x16 c1280", 8, 16, 16, 1280),
        ("8x8  c1280", 8, 8, 8, 1280),
    ]

    run = lambda key: args.only in (None, key)

    from ctrlora_tpu.ops.kernel_flags import flags as _kflags

    print(f"== GroupNorm32(+SiLU) ==   fused={'off' if _kflags().fused_group_norm is False else 'on'}", flush=True)
    for name, b, h, w, c in CASES if run("gn") else []:
        x = jnp.ones((b, h, w, c), jnp.bfloat16)
        mod = GroupNorm32(silu=True)
        params = mod.init(rng, x)
        fn = lambda x, p: mod.apply(p, x).astype(jnp.bfloat16)
        dt = time_chained(fn, x, params, reps=reps)
        mb = 2 * x.size * 2 / 1e6  # one read + one write, bf16
        print(f"  {name:12s} {dt*1e3:7.3f} ms   floor {mb/819e3*1e3:6.3f} ms "
              f"({x.size*2/1e6:.1f}MB tensor)")

    print("== ResBlock (2x GN+SiLU+3x3conv + emb) ==", flush=True)
    for name, b, h, w, c in CASES if run("res") else []:
        x = jnp.ones((b, h, w, c), jnp.bfloat16)
        emb = jnp.ones((b, 1280), jnp.bfloat16)
        mod = ResBlock(out_channels=c, dtype=jnp.bfloat16)
        params = mod.init(rng, x, emb)
        fn = lambda x, p, e: mod.apply(p, x, e).astype(jnp.bfloat16)
        dt = time_chained(fn, x, params, emb, reps=reps)
        conv_tflop = 2 * 2 * b * h * w * c * c * 9 / 1e12
        print(f"  {name:12s} {dt*1e3:7.3f} ms   conv@peak {conv_tflop/197*1e3:6.3f} ms"
              f"  ({conv_tflop*1e3:.1f} GFLOP)")

    print("== SpatialTransformer (self+cross+GEGLU) ==", flush=True)
    for name, b, h, w, c in (CASES[:3] if run("st") else []):
        heads = 8
        x = jnp.ones((b, h, w, c), jnp.bfloat16)
        ctx = jnp.ones((b, 77, 768), jnp.bfloat16)
        mod = SpatialTransformer(
            heads=heads, dim_head=c // heads, context_dim=768, dtype=jnp.bfloat16
        )
        params = mod.init(rng, x, ctx)
        fn = lambda x, p, cc: mod.apply(p, x, cc).astype(jnp.bfloat16)
        dt = time_chained(fn, x, params, ctx, reps=reps)
        s = h * w
        mm_tflop = (2 * b * s * c * c * 4        # q,k,v,out proj
                    + 2 * 2 * b * heads * s * s * (c // heads)  # attn
                    + 2 * b * s * c * (77 * 2 + 0)             # (approx cross kv)
                    + 2 * b * s * c * c * 8 + 2 * b * s * c * 4 * c  # GEGLU ff
                    ) / 1e12
        print(f"  {name:12s} {dt*1e3:7.3f} ms   mm@peak {mm_tflop/197*1e3:6.3f} ms")

    if args.skip_full or not run("full"):
        return
    print("== full apply_model (UNet+CN, 1 eval of CFG-doubled batch) ==", flush=True)
    from ctrlora_tpu.configs import ctrlora_inference_config
    from ctrlora_tpu.lora_fuse import cast_params_for_inference, fuse_control_tree
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline

    cfg = ctrlora_inference_config(lora_num=1, lora_rank=128)
    pipe = CtrLoraPipeline(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = pipe.init(jax.random.PRNGKey(0), image_size=8)
        fused = fuse_control_tree(params.control, 0, cfg.control.lora)
        params = cast_params_for_inference(params)
        fused = cast_params_for_inference(fused)
    params = jax.device_put(params, jax.devices()[0])
    fused = jax.device_put(fused, jax.devices()[0])

    B = 8
    x = jnp.zeros((B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.zeros((B, 77, 768), jnp.float32)
    hint_z = jnp.zeros((B, 64, 64, 4), jnp.float32)

    def chained(params, fused, x, t, ctx, hint_z):
        def body(_, acc):
            conds = [Conditioning(hint_z, control_params=fused)]
            return pipe.apply_model(params, acc, t, ctx, conds)

        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

    j = jax.jit(chained)
    np.asarray(j(params, fused, x, t, ctx, hint_z))
    t0 = time.perf_counter()
    np.asarray(j(params, fused, x, t, ctx, hint_z))
    dt = (time.perf_counter() - t0) / reps
    print(f"  b8 eval      {dt*1e3:7.3f} ms   (DDIM step ~= this + eps math; "
          f"50 steps -> {dt*50:.2f} s/batch)")


if __name__ == "__main__":
    main()
