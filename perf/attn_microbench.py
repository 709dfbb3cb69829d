"""Microbenchmark the flash-attention kernel at SD1.5's actual shapes.

Times the Pallas kernel (and optionally the XLA fp32-softmax fallback) at
the four attention geometries one CFG-doubled batch-4 512x512 sampling step
hits, per variant knob. Used to choose kernel defaults with measurements
instead of guesses (the round-1 bf16 experiment regressed end-to-end
because it was measured only together with an unrelated layout change).

Run on the real chip:  python perf/attn_microbench.py [--reps 50]
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

# SD1.5 UNet+ControlNet self-attention geometries for batch 8 (4 + CFG):
# (B, H, Sq, Sk, D). Cross-attention (Sk=77) uses the XLA path, not flash.
SHAPES = [
    ("64x64 self d40", (8, 8, 4096, 4096, 40)),
    ("32x32 self d80", (8, 8, 1024, 1024, 80)),
    ("16x16 self d160", (8, 8, 256, 256, 160)),
    ("8x8  self d160", (8, 8, 64, 64, 160)),
]


def time_attn(attn, q, k, v, reps=50):
    """Time `reps` chained kernel invocations inside ONE jit (per-call
    dispatch through a remote-execution tunnel would otherwise dominate)."""

    def chained(q, k, v):
        def body(_, acc):
            return attn(acc, k, v)

        # reduce on-device: fetching the full output through a remote
        # tunnel would dominate the measurement
        return jnp.sum(jax.lax.fori_loop(0, reps, body, q).astype(jnp.float32))

    fn = jax.jit(chained)
    np.asarray(fn(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(q, k, v))
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--only", default="", help="comma list of variant-label substrings")
    p.add_argument("--shapes", default="", help="substring filter on shape names")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    for name, (b, h, sq, sk, d) in SHAPES:
        if args.shapes and args.shapes not in name:
            continue
        q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, sk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, sk, d)), jnp.bfloat16)
        flops = 2 * 2 * b * h * sq * sk * d  # QK^T + PV, MAC = 2 FLOPs

        rows = []
        from ctrlora_tpu.ops import kernel_flags

        for label, kf in [
            ("v2 default", {}),
            ("v2 fp32-mxu", {"fp32_matmul": True}),
            ("v2 safemax", {"safemax": True}),
            ("v2 bq512-chunk", {"block_q": 512, "block_k": 512}),
            ("xla fp32-softmax", {"use_flash": False}),
        ]:
            if args.only and not any(
                s.strip() and s.strip() in label for s in args.only.split(",")
            ):
                continue
            try:
                with kernel_flags.override(**kf):
                    from ctrlora_tpu.ops.flash_attention import dot_product_attention

                    dt = time_attn(dot_product_attention, q, k, v, reps=args.reps)
                rows.append((label, dt))
            except Exception as e:
                print(f"  {label}: FAILED {type(e).__name__}: {e}", flush=True)
        base = rows[0][1]
        print(f"\n{name}  [{b}x{h}x{sq}x{d}]  ({flops/1e9:.1f} GFLOP)")
        for label, dt in rows:
            print(f"  {label:18s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TFLOPS"
                  f"  {base/dt:5.2f}x")


if __name__ == "__main__":
    main()
