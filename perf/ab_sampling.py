"""Same-process A/B of full-pipeline sampling variants (512^2 DDIM-50 b4).

The axon host swings 30-50% hour to hour, so cross-run comparisons lie.
This compiles every variant in ONE process and times them interleaved:
any host drift hits all variants equally.

Variants:
  fused      — shipped default: LoRA folded into base weights (lora_fuse),
               hd-packed BSHD flash attention, fused GEGLU FFN + GroupNorm
               (every ledger winner is a default — the baseline includes
               them all)
  nofuse     — runtime-LoRA control branch (lora_idx path)
  unroll2    — fused + lax.scan body unrolled 2x (while-loop overhead probe)
  chunk      — fused + flash attention forced to 512-chunk online softmax
  noffn      — fused GEGLU FFN kernel OFF (control: isolates the kernel's
               contribution now that the default includes it)
  bhsd       — attention via the transpose layout (control for the packed
               BSHD default)

Kernel variants are selected via ctrlora_tpu.ops.kernel_flags.set_flags
between compiles (trace-time flags -> distinct executables in one process).

Outputs a checksum (per-image mean) instead of the 4x512x512x3 bitmap so the
remote-tunnel fetch (~12.6MB) doesn't pollute the timing; decode still runs.

Run: nohup python perf/ab_sampling.py > /tmp/ab.log 2>&1 &   (compiles ~10min
per variant through the remote AOT compiler; total ~1h)
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

# share bench.py's persistent compilation cache: each variant's 50-step scan
# costs ~10 min through the remote AOT compiler; cached recompiles skip it
# (compiler_options participate in the cache key, so copts variants stay
# distinct executables)
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
    p.add_argument("--reps", type=int, default=4, help="interleaved rounds")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--variants", default="fused,nofuse,unroll2,chunk")
    p.add_argument("--note", default="",
                   help="REQUIRED provenance line for the ledger row: what "
                        "changed and why this A/B ran")
    args = p.parse_args()
    if not args.note:
        p.error("--note is required: say what changed and why this A/B ran "
                "(ledger provenance discipline, VERDICT r3 weak #7)")

    from ctrlora_tpu.configs import ctrlora_inference_config
    from ctrlora_tpu.lora_fuse import cast_params_for_inference, fuse_control_tree
    from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

    cfg = ctrlora_inference_config(lora_num=1, lora_rank=128)
    pipe = CtrLoraPipeline(cfg)
    size, steps, batch = 512, args.steps, args.batch
    lat = size // 8

    # init + fuse + cast in ONE jitted program executed on the device: a
    # host-side init means a ~1.4GB upload through the tunnel (~25 min at
    # observed upload bandwidth); on-device it's one compile + seconds
    def _make():
        params = pipe.init(jax.random.PRNGKey(0), image_size=8)
        fused = fuse_control_tree(params.control, 0, cfg.control.lora)
        return cast_params_for_inference(params), cast_params_for_inference(fused)

    t0 = time.perf_counter()
    params, fused = jax.jit(_make)()
    jax.block_until_ready(params)
    print(f"on-device init in {time.perf_counter()-t0:.0f}s", flush=True)

    hint = jnp.ones((batch, size, size, 3), jnp.float32) * 0.5
    ids = jnp.ones((batch, cfg.clip.max_length), jnp.int32)
    rng = jax.random.PRNGKey(1)

    def make_sample(use_fused: bool, unroll: int, n_steps=None, guidance=7.5,
                    control=True, hoist=True, kv_hoist=False):
        ddim = DDIMConfig(steps=n_steps or steps, guidance_scale=guidance,
                          scan_unroll=unroll, hoist_time_embed=hoist,
                          hoist_xattn_kv=kv_hoist)

        def sample(params, fused, hint, ids, rng):
            ctx = pipe.encode_text_tokens(params, ids)
            uncond = pipe.encode_text_tokens(params, jnp.zeros_like(ids))
            hint_z = pipe.encode_first_stage(params, hint)
            if not control:
                conds = None
            elif use_fused:
                conds = [Conditioning(hint_z, control_params=fused)]
            else:
                conds = [Conditioning(hint_z, lora_idx=jnp.int32(0))]
            z = ddim_sample(
                pipe, params, rng, ctx,
                uncond if guidance != 1.0 else None, conds,
                (batch, lat, lat, 4), ddim,
            )
            img = pipe.decode_first_stage(params, z)
            return jnp.mean(img, axis=(1, 2, 3))  # checksum, not the bitmap

        return sample

    specs = {
        "fused": dict(use_fused=True, unroll=1, flags=None),
        "nofuse": dict(use_fused=False, unroll=1, flags=None),
        "unroll2": dict(use_fused=True, unroll=2, flags=None),
        "chunk": dict(use_fused=True, unroll=1, flags=dict(block_k=512)),
        "bq256": dict(use_fused=True, unroll=1, flags=dict(block_q=256)),
        # force a 512-row q block through the single sweep (the VMEM estimate
        # rejects it at 15.75MB vs the 15.5MB limit; measure before trusting)
        "bq512sweep": dict(use_fused=True, unroll=1,
                           flags=dict(block_q=512, block_k=4096)),
        # decomposition probes: per-step slope, CFG cost, CN cost, flash gain
        "nohoist": dict(use_fused=True, unroll=1, flags=None, hoist=False),
        # default flash = hd-packed BSHD, bf16 MXU, ones-augmented PV, fused
        # clamped exp2+cast; safemax = exact per-row max guard vs the clamp
        "safemax": dict(use_fused=True, unroll=1, flags=dict(safemax=True)),
        # controls: the default now INCLUDES the GEGLU kernel and the packed
        # BSHD layout, so the A/B direction is default-vs-disabled
        "noffn": dict(use_fused=True, unroll=1, flags=dict(geglu_ffn=False)),
        # GEGLU MXU/VPU software pipeline depth (default auto=2 at bs>=256)
        "gsplit1": dict(use_fused=True, unroll=1, flags=dict(geglu_split=1)),
        "gsplit4": dict(use_fused=True, unroll=1, flags=dict(geglu_split=4)),
        "bhsd": dict(use_fused=True, unroll=1, flags=dict(attn_layout="bhsd")),
        # control for the residual-add barrier (default ON since 2026-08-19)
        "nosra": dict(use_fused=True, unroll=1, flags=dict(split_res_add=False)),
        # separate q/k/v dots: no jnp.split slices ahead of the flash kernel
        "nofuseqkv": dict(use_fused=True, unroll=1, flags=dict(fuse_qkv=False)),
        "nofusedgn": dict(use_fused=True, unroll=1,
                          flags=dict(fused_group_norm=False)),
        "steps10": dict(use_fused=True, unroll=1, flags=None, n_steps=10),
        "nocfg": dict(use_fused=True, unroll=1, flags=None, guidance=1.0),
        "nocontrol": dict(use_fused=True, unroll=1, flags=None, control=False),
        "noflash": dict(use_fused=True, unroll=1, flags=dict(use_flash=False)),
        # round-5 packed-forward schedule knobs (perf/attn_packed_bench.py:
        # noclamp +4% at the dominant d40 site, apipe +2% d40 / -16% d80,
        # hpack2 loses — measuring end-to-end before flipping any default)
        "noclamp": dict(use_fused=True, unroll=1,
                        flags=dict(attn_clamp=False)),
        "apipe": dict(use_fused=True, unroll=1, flags=dict(attn_pipe=True)),
        "hpack2": dict(use_fused=True, unroll=1, flags=dict(head_pack=2)),
        "apipenoclamp": dict(use_fused=True, unroll=1,
                             flags=dict(attn_pipe=True, attn_clamp=False)),
        # fused q|k|v projection output consumed directly by the packed
        # kernel (no XLA split fusion — 55 ms/batch at the 64^2 sites,
        # profile 2026-08-19)
        "qkvpack": dict(use_fused=True, unroll=1,
                        flags=dict(attn_qkv_packed=True)),
        # f-blocked GEGLU at the wide 16^2/8^2 FFN sites (weights > VMEM)
        "gblocked": dict(use_fused=True, unroll=1,
                         flags=dict(geglu_blocked=True)),
        # candidate adoption state: both round-5 tail kernels on
        "qkvgb": dict(use_fused=True, unroll=1,
                      flags=dict(attn_qkv_packed=True, geglu_blocked=True)),
        # hoist cross-attn K|V of the loop-invariant context out of the scan
        # (~23 sites x 50 steps of identical [616,768]@[768,2C] dots)
        "kvh": dict(use_fused=True, unroll=1, flags=None, kv_hoist=True),
        # one-pass VMEM-resident GroupNorm at the >=2^19-element sites
        # (microbench 2026-08-19: 3.5x at 32^2 x 640, neutral at 64^2 x 320)
        "gn1": dict(use_fused=True, unroll=1, flags=dict(gn_onepass=True)),
        # XLA compiler-option variants (per-compile, same process — JAX
        # passes these to the TPU compiler at .compile() time). Targets the
        # 50.8% conv bucket at 0.75 MFU: a larger scoped-VMEM budget lets
        # the conv emitter pick bigger tiles / deeper pipelining (v5e has
        # 128 MiB VMEM; the default scoped budget is far smaller)
        "vmem32": dict(use_fused=True, unroll=1, flags=None,
                       copts={"xla_tpu_scoped_vmem_limit_kib": "32768"}),
        "vmem64": dict(use_fused=True, unroll=1, flags=None,
                       copts={"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        "vmem96": dict(use_fused=True, unroll=1, flags=None,
                       copts={"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    }
    names = [v for v in args.variants.split(",") if v in specs]

    from ctrlora_tpu.ops import kernel_flags

    compiled = {}
    checksums = {}
    for name in names:
        s = specs[name]
        try:
            if s["flags"]:
                kernel_flags.set_flags(**s["flags"])
            t0 = time.perf_counter()
            fn = make_sample(
                s["use_fused"], s["unroll"], s.get("n_steps"),
                s.get("guidance", 7.5), s.get("control", True),
                s.get("hoist", True), s.get("kv_hoist", False),
            )
            c = jax.jit(fn).lower(params, fused, hint, ids, rng).compile(
                compiler_options=s.get("copts"))
            print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s", flush=True)
        finally:
            kernel_flags.clear_flags()
        # warm + 2 solo reps right away (partial results if the run dies)
        warm = np.asarray(c(params, fused, hint, ids, rng))
        checksums[name] = warm
        base_ck = checksums.get(names[0])
        if base_ck is not None and name != names[0]:
            # same rng + same math => per-image means should agree closely;
            # a large delta means the variant changed the numerics, not
            # just the schedule
            print(f"[{name}] checksum {warm.round(5).tolist()} "
                  f"(max|Δ| vs {names[0]}: {np.abs(warm - base_ck).max():.2e})",
                  flush=True)
        solo = []
        for i in range(2):
            t0 = time.perf_counter()
            np.asarray(c(params, fused, hint, ids, jax.random.fold_in(rng, i)))
            solo.append(time.perf_counter() - t0)
        print(f"[{name}] solo reps: {[round(t,3) for t in solo]} s/batch", flush=True)
        compiled[name] = c

    # interleaved rounds: host drift hits every variant equally
    times = {n: [] for n in names}
    for r in range(args.reps):
        for n in names:
            t0 = time.perf_counter()
            np.asarray(compiled[n](params, fused, hint, ids, jax.random.fold_in(rng, 100 + r)))
            times[n].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(f"{n}={times[n][-1]:.3f}s" for n in names),
              flush=True)

    out = {}
    for n in names:
        ts = np.asarray(times[n])
        out[n] = {
            "median_s_per_batch": round(float(np.median(ts)), 3),
            "min_s_per_batch": round(float(ts.min()), 3),
            "img_per_sec_median": round(batch / float(np.median(ts)), 4),
            "all": [round(float(t), 3) for t in ts],
        }
    print(json.dumps(out, indent=1))

    # machine-checkable A/B ledger: every same-session comparison lands here
    ledger_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ledger.json")
    try:
        ledger = json.load(open(ledger_path)) if os.path.exists(ledger_path) else []
    except Exception:
        ledger = []
    import datetime

    ledger.append({
        "when": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
        "workload": f"512x512 ddim{args.steps} b{args.batch} sampling",
        "interleaved": True,
        "note": args.note,
        "results": out,
    })
    json.dump(ledger, open(ledger_path, "w"), indent=1)
    print(f"ledger updated: {ledger_path}")


if __name__ == "__main__":
    main()
