"""Same-process A/B of the rank-128 LoRA finetune train step (512^2 b4).

Mirrors perf/ab_sampling.py for the TRAIN path: the sampling ledger only
covers the flash forward; the train step exercises the Pallas flash
BACKWARD (custom_vjp, ops/flash_attention.py:390-541) and the GEGLU-FFN
kernel's recompute-under-remat behavior, which deserve their own on-chip
numbers (VERDICT r3 "next" #8).

Variants:
  default   — shipped defaults (hd-packed BSHD flash fwd+bwd, fused GEGLU)
  noflash   — XLA softmax attention fwd+bwd (isolates the flash custom_vjp)
  bhsd      — flash via the [B,H,S,D] transpose layout
  noffn     — fused GEGLU FFN kernel off
  gsplit1   — GEGLU kernel without the 2-way MXU/VPU software pipeline
  split0    — ResBlock residual add fused back into the conv (the
              split_res_add barrier was adopted from a sampling-only A/B;
              it shapes the backward graph too — VERDICT r4 weak #2)
  nofuseqkv — separate q/k/v projection dots (fused dot was a sampling win)

Kernel variants are trace-time flags (ctrlora_tpu.ops.kernel_flags), so one
process compiles distinct executables per variant and times them
interleaved — host drift hits all variants equally.

Run: nohup python perf/ab_train.py --note "..." > /tmp/abtrain.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import jax
import jax.numpy as jnp
import numpy as np

# share bench.py's persistent compilation cache (see perf/ab_sampling.py)
try:
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=8, help="interleaved rounds")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--variants",
                   default="default,noflash,bhsd,noffn,gsplit1,split0")
    p.add_argument("--note", default="",
                   help="REQUIRED provenance line for the ledger row")
    args = p.parse_args()
    if not args.note:
        p.error("--note is required (ledger provenance discipline)")

    from ctrlora_tpu.configs import TrainConfig, ctrlora_finetune_config
    from ctrlora_tpu.ops import kernel_flags
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.training.step import make_train_step
    from ctrlora_tpu.training.train_state import (
        create_train_state, make_optimizer, trainable_mask,
    )

    cfg = ctrlora_finetune_config(lora_rank=128)
    size, batch = args.size, args.batch
    pipe = CtrLoraPipeline(cfg)
    tcfg = TrainConfig(trainable="lora", batch_size=batch)

    def _make():
        params = pipe.init(jax.random.PRNGKey(0), image_size=8)
        return create_train_state(params, tcfg)[0]

    t0 = time.perf_counter()
    state = jax.jit(_make)()
    jax.block_until_ready(state)
    print(f"on-device init in {time.perf_counter()-t0:.0f}s", flush=True)

    tx = make_optimizer(tcfg, trainable_mask(state.params, tcfg))
    batch_data = {
        "jpg": jnp.zeros((batch, size, size, 3), jnp.float32),
        "hint": jnp.ones((batch, size, size, 3), jnp.float32) * 0.5,
        "token_ids": jnp.ones((batch, cfg.clip.max_length), jnp.int32),
        "task_idx": jnp.zeros((batch,), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    specs = {
        "default": {},
        "noflash": dict(use_flash=False),
        "bhsd": dict(attn_layout="bhsd"),
        "noffn": dict(geglu_ffn=False),
        "gsplit1": dict(geglu_split=1),
        "split0": dict(split_res_add=False),
        "nofuseqkv": dict(fuse_qkv=False),
        # round-5 tail kernels (sampling-side variants; the UNet's frozen
        # self-attn is differentiated through, so qkvpack exercises the
        # _flash_attention_qkv custom_vjp backward here)
        "qkvpack": dict(attn_qkv_packed=True),
        "gblocked": dict(geglu_blocked=True),
    }
    names = [v for v in args.variants.split(",") if v in specs]

    compiled = {}
    losses = {}
    for name in names:
        try:
            if specs[name]:
                kernel_flags.set_flags(**specs[name])
            t0 = time.perf_counter()
            step = make_train_step(pipe, tx, tcfg)
            c = jax.jit(step).lower(state, batch_data, rng).compile()
            print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        finally:
            kernel_flags.clear_flags()
        s2, m = c(state, batch_data, rng)  # warm; do NOT advance state —
        losses[name] = float(m["loss"])   # every variant steps from the
        del s2                            # same params so losses compare
        base = losses.get(names[0])
        if name != names[0]:
            print(f"[{name}] loss {losses[name]:.6f} "
                  f"(Δ vs {names[0]}: {losses[name]-base:+.2e})", flush=True)
        compiled[name] = c

    times = {n: [] for n in names}
    for r in range(args.reps):
        for n in names:
            t0 = time.perf_counter()
            s2, m = compiled[n](state, batch_data, rng)
            float(m["loss"])  # force
            del s2
            times[n].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(f"{n}={times[n][-1]:.3f}s" for n in names),
              flush=True)

    out = {}
    for n in names:
        ts = np.asarray(times[n])
        out[n] = {
            "median_s_per_step": round(float(np.median(ts)), 4),
            "min_s_per_step": round(float(ts.min()), 4),
            "steps_per_sec_median": round(1.0 / float(np.median(ts)), 4),
            "loss": round(losses[n], 6),
            "all": [round(float(t), 4) for t in ts],
        }
    print(json.dumps(out, indent=1))

    ledger_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ledger.json")
    try:
        ledger = json.load(open(ledger_path)) if os.path.exists(ledger_path) else []
    except Exception:
        ledger = []
    import datetime

    ledger.append({
        "when": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "workload": f"{args.size}x{args.size} b{args.batch} rank-128 lora "
                    "finetune step",
        "interleaved": True,
        "note": args.note,
        "results": out,
    })
    json.dump(ledger, open(ledger_path, "w"), indent=1)
    print(f"ledger updated: {ledger_path}")


if __name__ == "__main__":
    main()
