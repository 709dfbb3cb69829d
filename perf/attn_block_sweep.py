"""Sweep flash-attention block sizes at the dominant 64x64/d40 shape.

Run: python perf/attn_block_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30


def time_one(bq, bk):
    from ctrlora_tpu.ops import kernel_flags
    from ctrlora_tpu.ops.flash_attention import dot_product_attention

    kernel_flags.clear_flags()
    kernel_flags.set_flags(block_q=bq, block_k=bk)

    rng = np.random.default_rng(0)
    b, h, s, d = 8, 8, 4096, 40
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.1, jnp.bfloat16)

    def chained(q, k, v):
        def body(_, acc):
            return dot_product_attention(acc, k, v)

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, q).astype(jnp.float32))

    j = jax.jit(chained)
    try:
        np.asarray(j(q, k, v))
    except Exception as e:
        print(f"  bq={bq:5d} bk={bk:5d}   FAILED: {type(e).__name__}")
        return
    t0 = time.perf_counter()
    np.asarray(j(q, k, v))
    dt = (time.perf_counter() - t0) / REPS
    print(f"  bq={bq:5d} bk={bk:5d}  {dt*1e3:8.3f} ms", flush=True)


def main():
    print("[8,8,4096,40] flash forward, block sweep:")
    for bq, bk in [
        (512, 4096),
        (256, 4096),
        (128, 4096),
        (512, 2048),
        (1024, 2048),
    ]:
        time_one(bq, bk)


if __name__ == "__main__":
    main()
