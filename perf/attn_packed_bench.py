"""Microbenchmark the hd-packed (BSHD) flash forward's round-5 knobs.

The round-4 profile put the packed flash custom calls at 1,165 ms/batch and
~28.5% MFU against a ~31% d=40 lane-pad ceiling; the recoverable time is the
VPU exp2 pass exposure, not the pad (see _fwd_kernel_packed's docstring).
This times the three candidate schedules at SD1.5's self-attention
geometries, inference dtype (bf16), packed layout:

  default   — r4 shipping kernel (sequential head loop, clamped exp2)
  apipe     — one-deep software pipeline over heads
  noclamp   — drop the overflow-guard min() from the exp2 pass
  apipe+noclamp
  hpack2    — block-diagonal head-pair packing (d40 only; the r4 verdict's
              proposed pad attack)
  hpack2+noclamp

Run on the real chip:  python perf/attn_packed_bench.py [--reps 50]
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

# (B, S, H, D) — BSHD, CFG-doubled batch 8; cross-attn (Sk=77) is XLA-path
SHAPES = [
    ("64x64 self d40", (8, 4096, 8, 40)),
    ("32x32 self d80", (8, 1024, 8, 80)),
    ("16x16 self d160", (8, 256, 8, 160)),
]

VARIANTS = [
    ("default", {}),
    ("apipe", {"attn_pipe": True}),
    ("noclamp", {"attn_clamp": False}),
    ("apipe+noclamp", {"attn_pipe": True, "attn_clamp": False}),
    ("hpack2", {"head_pack": 2}),
    ("hpack2+noclamp", {"head_pack": 2, "attn_clamp": False}),
    # bigger q block = half the K/V VMEM refills per (batch, site); the
    # admission estimate rejects 512 (~27MB scoped vs the 24MB limit) but
    # the explicit grant is 48MB — measure before trusting the estimate
    ("bq512", {"packed_block_q": 512}),
    ("bq512+noclamp", {"packed_block_q": 512, "attn_clamp": False}),
    ("bq1024+noclamp", {"packed_block_q": 1024, "attn_clamp": False}),
]


def time_attn(attn, q, k, v, reps):
    def chained(q, k, v):
        def body(_, acc):
            return attn(acc, k, v)

        return jnp.sum(jax.lax.fori_loop(0, reps, body, q).astype(jnp.float32))

    fn = jax.jit(chained)
    np.asarray(fn(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(q, k, v))
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--shapes", default="", help="substring filter")
    args = p.parse_args()

    from ctrlora_tpu.ops import kernel_flags
    from ctrlora_tpu.ops.flash_attention import dot_product_attention_bshd

    rng = np.random.default_rng(0)
    for name, (b, s, h, d) in SHAPES:
        if args.shapes and args.shapes not in name:
            continue
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        flops = 2 * 2 * b * h * s * s * d

        rows = []
        for label, kf in VARIANTS:
            if "hpack" in label and 2 * d > 128:
                continue
            try:
                with kernel_flags.override(**kf):
                    dt = time_attn(dot_product_attention_bshd, q, k, v,
                                   reps=args.reps)
                rows.append((label, dt))
            except Exception as e:  # pragma: no cover
                print(f"  {label}: FAILED {type(e).__name__}: {e}", flush=True)
        base = rows[0][1]
        print(f"\n{name}  [{b}x{s}x{h}x{d}]  ({flops/1e9:.1f} GFLOP)")
        for label, dt in rows:
            print(f"  {label:16s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TFLOPS"
                  f"  {base/dt:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
