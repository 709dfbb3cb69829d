"""Microbenchmark the fused GEGLU FFN kernel at SD1.5's transformer sites.

Compares the Pallas kernel (ops/geglu_ffn.py) against the XLA Dense path at
the CFG-doubled batch-4 geometries, standalone — so a pathological Mosaic
compile shows up here in seconds instead of wedging an hour-long
full-pipeline A/B (which is what may have happened on its first on-chip
outing, 2026-08-17 ~19:0x).

Run on the real chip:  python perf/geglu_microbench.py [--reps 30]
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

# (rows, C) for b8 (4 + CFG) 512^2: seq x width at each transformer level.
# F = 4*C (GEGLU inner), up-projection is [C, 2F].
SHAPES = [
    ("64x64 c320", (8 * 4096, 320)),
    ("32x32 c640", (8 * 1024, 640)),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    from ctrlora_tpu.ops.geglu_ffn import _reference, geglu_ffn

    rng = np.random.default_rng(0)
    for name, (rows, c) in SHAPES:
        f = 4 * c
        x = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((c, 2 * f)) * 0.02, jnp.bfloat16)
        b1 = jnp.zeros((2 * f,), jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((f, c)) * 0.02, jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.bfloat16)
        flops = 2 * rows * (c * 2 * f + f * c)

        def chained(fn):
            def run(x):
                def body(_, acc):
                    return fn(acc, w1, b1, w2, b2).astype(x.dtype)

                return jnp.sum(
                    jax.lax.fori_loop(0, args.reps, body, x).astype(jnp.float32)
                )

            return run

        from ctrlora_tpu.ops import kernel_flags

        results = []
        variants = [("xla dense", _reference, {})]
        for s in (1, 2, 4):
            variants.append((f"pallas gsplit={s}", geglu_ffn,
                             {"geglu_ffn": True, "geglu_split": s}))
        for label, fn, kf in variants:
            t0 = time.perf_counter()
            with kernel_flags.override(**kf):
                j = jax.jit(chained(fn))
                out = np.asarray(j(x))  # compile + warm
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                out2 = np.asarray(j(x))
                dt = (time.perf_counter() - t0) / args.reps
            results.append((label, dt, compile_s, float(out2)))
            print(
                f"{name} {label:16s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TFLOPS"
                f"  (compile {compile_s:.0f}s, checksum {float(out2):.3f})",
                flush=True,
            )
        # numeric cross-check at bench scale
        a, b_ = results[0][3], results[1][3]
        print(f"{name} checksum delta {abs(a - b_):.4f}", flush=True)


if __name__ == "__main__":
    main()
