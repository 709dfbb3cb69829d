"""Round 2 of the scan-step bisect (perf/step_glue.py): WHY does any
per-step-dynamic t path cost ~22 ms/step when const-t runs at 69 ms/step,
even after hoisting all t-dependent compute out of the loop (the hoisted
sampler measured NEUTRAL vs non-hoisted, perf/ledger.json 13:37/14:02)?

  w0  const-t baseline                                [expect ~69]
  w1  const-t + trivial xs consumption on the carry   [is ANY xs use cursed?]
  w2  emb_rows path with LOOP-CONSTANT rows           [is the rows path slow?]
  w3  emb_rows from packed scan xs (= hoisted sampler)[expect ~92]
  w4  emb_rows via one-hot matmul, no dynamic-slice   [is dynamic-slice it?]
  w5  full python unroll, static t per step, no hoist [straight-line code]

MEASURED (2026-08-17, one v5e chip, 3 stable rounds):
  w0=69.2  w1=69.2  w2=69.3  w3=92.1  w4=91.9  w5=99.2  ms/step
Conclusion: the 22.6 ms is neither t-dynamism nor the broadcast adds (w2
fast: loop-invariant rows with identical adds in-loop) — it is the ~70
tiny per-row slice KERNELS any per-step-varying rows need (~310 us of
dispatch each, regardless of slice mechanism, w3==w4). Full unroll (w5)
is strictly worse: per-step emb MLPs come back and nothing hoists. Fix:
produce all rows in ONE multi-output Pallas launch (ops/unpack_rows.py).

All variants take `fused` as a jit ARGUMENT — closing over the 361M-param
fused tree bakes it into the HLO as literals and the remote-compile POST
blows the tunnel's request-size limit (HTTP 413).

Run: python perf/step_glue2.py
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
    ctx = jnp.zeros((2 * B, 77, 768), jnp.float32)
    hint = jnp.zeros((2 * B, 64, 64, 4), jnp.float32)
    x8 = jnp.zeros((2 * B, 64, 64, 4), jnp.float32)

    dd = make_ddim_schedule(pipe.schedule, 50)
    order = np.arange(dd.num_steps - 1, -1, -1)[:STEPS]
    ts_np = np.asarray(dd.timesteps)[order]
    ts_seq = jnp.asarray(ts_np)
    a_seq = jnp.asarray(np.asarray(dd.alphas)[order])

    def eval8(params, fused, x, tvec, rows):
        conds = [Conditioning(hint, control_params=fused)]
        return pipe.apply_model(params, x, tvec, ctx, conds, emb_rows=rows)

    # packed tables exactly like ddim_sample builds them
    def pack(d):
        names = sorted(d)
        sizes = [d[n].shape[-1] for n in names]
        return jnp.concatenate([d[n] for n in names], axis=-1), tuple(names), tuple(sizes)

    def unpack(vec, names, sizes):
        out, off = {}, 0
        for n, s in zip(names, sizes):
            out[n] = vec[off : off + s]
            off += s
        return out

    def make_tables(p, fused):
        conds = [Conditioning(hint, control_params=fused)]
        t = pipe.emb_proj_tables(p, ts_seq, conds)
        pu, nu, su = pack(t["unet"])
        pc, ncn, sc = pack(t["control"][0])
        return (pu, pc), (nu, su, ncn, sc)

    tvec_const = jnp.full((2 * B,), 500, jnp.int32)

    def w0(params, fused, x):
        def step(carry, _):
            return eval8(params, fused, carry, tvec_const, None), None

        out, _ = jax.lax.scan(step, x, jnp.arange(STEPS))
        return jnp.sum(out)

    def w1(params, fused, x):
        def step(carry, a_t):
            carry = carry + a_t * 1e-30
            return eval8(params, fused, carry, tvec_const, None), None

        out, _ = jax.lax.scan(step, x, a_seq)
        return jnp.sum(out)

    def w2(params, fused, x):
        (pu, pc), (nu, su, ncn, sc) = make_tables(params, fused)
        rows = {
            "unet": unpack(pu[0], nu, su),
            "control": (unpack(pc[0], ncn, sc),),
        }

        def step(carry, _):
            return eval8(params, fused, carry, tvec_const, rows), None

        out, _ = jax.lax.scan(step, x, jnp.arange(STEPS))
        return jnp.sum(out)

    def w3(params, fused, x):
        (pu, pc), (nu, su, ncn, sc) = make_tables(params, fused)

        def step(carry, vecs):
            vu, vc = vecs
            rows = {
                "unet": unpack(vu, nu, su),
                "control": (unpack(vc, ncn, sc),),
            }
            return eval8(params, fused, carry, tvec_const, rows), None

        out, _ = jax.lax.scan(step, x, (pu, pc))
        return jnp.sum(out)

    def w4(params, fused, x):
        (pu, pc), (nu, su, ncn, sc) = make_tables(params, fused)

        def step(carry, i):
            oh = jax.nn.one_hot(i, STEPS, dtype=pu.dtype)
            vu = jnp.einsum("s,sc->c", oh, pu)
            vc = jnp.einsum("s,sc->c", oh, pc)
            rows = {
                "unet": unpack(vu, nu, su),
                "control": (unpack(vc, ncn, sc),),
            }
            return eval8(params, fused, carry, tvec_const, rows), None

        out, _ = jax.lax.scan(step, x, jnp.arange(STEPS))
        return jnp.sum(out)

    def w5(params, fused, x):
        carry = x
        for i in range(STEPS):
            tvec = jnp.full((2 * B,), int(ts_np[i]), jnp.int32)
            carry = eval8(params, fused, carry, tvec, None)
        return jnp.sum(carry)

    variants = {"w0_const": w0, "w1_trivial_xs": w1, "w2_const_rows": w2,
                "w3_xs_rows": w3, "w4_onehot_rows": w4, "w5_unrolled": w5}

    compiled = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        try:
            compiled[name] = jax.jit(fn).lower(params, fused, x8).compile()
        except Exception as e:  # keep going; one variant may be too big
            print(f"[{name}] FAILED to compile: {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    results = {}
    for rnd in range(3):
        line = []
        for name, c in compiled.items():
            np.asarray(c(params, fused, x8))
            t0 = time.perf_counter()
            np.asarray(c(params, fused, x8))
            dt = (time.perf_counter() - t0) / STEPS
            results.setdefault(name, []).append(dt)
            line.append(f"{name}={dt*1e3:.1f}ms")
        print(f"round {rnd}: " + " ".join(line), flush=True)

    print(json.dumps({k: round(float(np.median(v)) * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
