"""Dissect the 64x64/d40 attention cost: time each component (QK^T matmul,
softmax, PV matmul) as standalone XLA ops, plus the stock JAX Pallas TPU
flash kernel if available, to locate the bottleneck in our kernel.

Run: python perf/attn_dissect.py [--reps 30]
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


def timeit(label, build, reps, scale=1):
    """build() -> (fn, args, feedback) where feedback(out, args) -> new args
    keeps a data dependency between chained iterations."""
    fn, args = build()

    def chained(*args):
        def body(_, a):
            return fn(*a)

        out = jax.lax.fori_loop(0, reps, body, args)
        # sum every carry leaf so no iteration is dead code
        return sum(jnp.sum(o[-1].astype(jnp.float32)) for o in out)

    j = jax.jit(chained)
    np.asarray(j(*args))
    t0 = time.perf_counter()
    np.asarray(j(*args))
    dt = (time.perf_counter() - t0) / reps * scale
    print(f"  {label:26s} {dt*1e3:8.3f} ms" + (f"  (x{scale} scaled)" if scale != 1 else ""))
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()
    reps = args.reps

    g, s, d = 64, 4096, 40  # B*H, seq, head_dim at the 64x64 level
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((g, s, d)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((g, s, d)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((g, s, d)) * 0.1, jnp.bfloat16)
    # the materialized [g, s, s] probs tensor would be 4.3GB at g=64 —
    # time softmax/PV components at g=4 and scale the printed time by 16x
    gs = 4
    SCALE = g // gs
    pmat = jnp.asarray(rng.uniform(0, 1, (gs, s, s)), jnp.float32)
    pb = pmat.astype(jnp.bfloat16)
    vs = v[:gs]

    print(f"components at [{g}, {s}, {d}] (one 64x64 site, batch 8):")

    # QK^T at gs, chained via a rowmax (subtract the separately-measured
    # rowmax cost); a column-slice chain would let XLA shrink the dot itself
    qs, ks = q[:gs], k[:gs]
    timeit("QK^T bf16 + rowmax", lambda: (
        lambda q, k: (q + jnp.max(jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ), axis=-1, keepdims=True).astype(q.dtype), k),
        (qs, ks),
    ), reps, scale=SCALE)
    qf, kf = qs.astype(jnp.float32), ks.astype(jnp.float32)
    timeit("QK^T fp32 + rowmax", lambda: (
        lambda q, k: (q + jnp.max(jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ), axis=-1, keepdims=True), k),
        (qf, kf),
    ), reps, scale=SCALE)

    # softmax pieces over [g, s, s] fp32
    timeit("rowmax+bcast-sub fp32", lambda: (
        lambda p: (p - jnp.max(p, axis=-1, keepdims=True),), (pmat,),
    ), reps, scale=SCALE)
    timeit("exp2 fp32", lambda: (
        lambda p: (jnp.exp2(p - 1.0), ), (pmat,),
    ), reps, scale=SCALE)
    timeit("rowsum+bcast-mul fp32", lambda: (
        lambda p: (p * (1.0 / (1.0 + jnp.sum(p, axis=-1, keepdims=True))),),
        (pmat,),
    ), reps, scale=SCALE)
    timeit("full softmax fp32", lambda: (
        lambda p: (jax.nn.softmax(p, axis=-1), ), (pmat,),
    ), reps, scale=SCALE)

    # PV: fp32 p vs bf16 p (chained through v; p is loop-invariant but the
    # carry leaf v keeps every iteration live)
    timeit("PV fp32xbf16->bf16", lambda: (
        lambda p, v: (p, jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)),
        (pmat, vs),
    ), reps, scale=SCALE)
    timeit("PV bf16", lambda: (
        lambda p, v: (p, jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)),
        (pb, vs),
    ), reps, scale=SCALE)

    # stock JAX pallas TPU flash attention, if present in this version
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )

        b, h = 8, 8
        q4 = q.reshape(b, h, s, d)
        k4 = k.reshape(b, h, s, d)
        v4 = v.reshape(b, h, s, d)

        def build():
            fn = lambda q, k, v: (jax_flash(q, k, v, causal=False,
                                            sm_scale=1.0 / np.sqrt(d)), k, v)

            def wrapped(q, k, v):
                o, k2, v2 = fn(q, k, v)
                return o, k2, v2

            return wrapped, (q4, k4, v4)

        timeit("jax stock flash kernel", build, reps)
    except Exception as e:  # pragma: no cover
        print(f"  stock flash unavailable: {type(e).__name__}: {e}")

    from ctrlora_tpu.ops.flash_attention import flash_attention as ours

    b, h = 8, 8
    timeit("ours (flash fwd)", lambda: (
        lambda q, k, v: (ours(q.reshape(b, h, s, d), k.reshape(b, h, s, d),
                              v.reshape(b, h, s, d)).reshape(g, s, d), k, v),
        (q, k, v),
    ), reps)


if __name__ == "__main__":
    main()
