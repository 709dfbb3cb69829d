"""Per-shape conv microbench: is XLA's conv emitter pad-limited at 320 ch?

Premise check for the Pallas im2col-conv idea (round 5). The hlo_stats
profile attributes 50.8% of sampling device time to convolutions at 0.75
aggregate MFU, with the [8,64,64,320] 3x3 sites at 0.70. The MXU cycle
model says a per-tap K=Cin contraction pays ceil(Cin/128)/(Cin/128) twice
(K pad and N pad): 320 -> (320/384)^2 = 0.694 — exactly the observed MFU.
A single im2col dot with K = 9*Cin = 2880 pays the K pad once (2880/2944 =
0.978) and the N pad once (0.833) -> 0.815 ceiling, a +17% headroom.

This bench measures, per conv shape of the UNet/ControlNet/VAE:
  * lax.conv_general_dilated (what the model runs today)
  * the same conv as one XLA dot over HBM-materialized patches
    (conv_general_dilated_patches + dot) — pays the HBM round trip, but
    isolates the MXU efficiency of the K-packed contraction
so we know the MFU gap BEFORE spending a day on a fused Pallas kernel.

Run ON CHIP: python perf/conv_microbench.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# share the persistent compile cache (see perf/ab_sampling.py)
try:
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_im2col(x, w):
    """Same conv as one big dot over materialized patches (K = 9*Cin)."""
    b, h, wd, c = x.shape
    kh, kw, _, co = w.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B,H,W, kh*kw*C] with K-major (c, kh, kw)? -> documented as C*KH*KW
    k = patches.shape[-1]
    # conv_general_dilated_patches orders the feature dim as
    # (Cin, kh, kw) blocks; reorder w to match: [kh,kw,ci,co] -> [ci,kh,kw,co]
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(k, co)
    return jax.lax.dot_general(
        patches.reshape(b * h * wd, k), wmat,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(b, h, wd, co)


def conv_taps(x, w):
    """Conv as 9 shifted dots accumulated (per-tap K=Cin, the model today
    conceptually; checks whether XLA's conv emitter leaves dot perf on the
    table independent of packing)."""
    b, h, wd, c = x.shape
    kh, kw, _, co = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, c))
            y = jax.lax.dot_general(
                xs.reshape(b * h * wd, c), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype).reshape(b, h, wd, co)


def bench(fn, args, iters=30):
    # ONE dispatch for the whole timed loop: the dev host's HTTP-tunneled
    # transport costs ~1ms+ per dispatch, which would drown sub-ms kernels.
    # A fori_loop chains `iters` applications with a scalar data dependency
    # (out[0,0,0,0] * 0 folded into x) so XLA cannot CSE them away.
    x, w = args

    def loop(x, w):
        def body(_, carry):
            xi, s = carry
            out = fn(xi + s.astype(xi.dtype), w)
            # runtime-valued epsilon (not a literal 0) so XLA can neither
            # fold the dependency away nor hoist the conv out of the loop
            return xi, out.reshape(-1)[0].astype(jnp.float32) * 1e-20
        xi, s = jax.lax.fori_loop(0, iters, body, (x, jnp.zeros((), jnp.float32)))
        return s

    f = jax.jit(loop)
    jax.block_until_ready(f(x, w))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x, w)
        jax.block_until_ready(out)
        reps.append((time.perf_counter() - t0) / iters)
    return min(reps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    # the sampling workload's conv shapes (B=8 = CFG-doubled batch 4)
    shapes = [
        (8, 64, 64, 320, 320),
        (8, 64, 64, 640, 320),   # output-block concat site (aligned K)
        (8, 32, 32, 640, 640),
        (8, 32, 32, 960, 640),   # concat site, 960 = 7.5*128
        (8, 16, 16, 1280, 1280),
        (8, 8, 8, 1280, 1280),
    ]
    key = jax.random.PRNGKey(0)
    print(f"{'shape':>28} | {'conv':>8} {'mfu':>5} | {'im2col':>8} {'mfu':>5} "
          f"| {'taps':>8} {'mfu':>5}")
    for (b, h, wd, ci, co) in shapes:
        x = jax.random.normal(key, (b, h, wd, ci), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, ci, co), jnp.bfloat16)
        ref = jax.jit(conv_ref)(x, w)
        alt = jax.jit(conv_im2col)(x, w)
        taps = jax.jit(conv_taps)(x, w)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))
        err2 = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - taps.astype(jnp.float32))))
        flops = 2 * b * h * wd * 9 * ci * co
        peak = 394e12  # v5e bf16 peak
        t0 = bench(conv_ref, (x, w), args.iters)
        t1 = bench(conv_im2col, (x, w), args.iters)
        t2 = bench(conv_taps, (x, w), args.iters)
        print(f"{str((b,h,wd,ci))+'->'+str(co):>28} | {t0*1e6:8.1f} {flops/t0/peak:5.2f} "
              f"| {t1*1e6:8.1f} {flops/t1/peak:5.2f} "
              f"| {t2*1e6:8.1f} {flops/t2/peak:5.2f}  (us; max|d| {err:.1e}/{err2:.1e})")


if __name__ == "__main__":
    main()
