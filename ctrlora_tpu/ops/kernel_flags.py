"""Kernel-variant configuration: one place for every Pallas-kernel knob.

Perf history lives in perf/ledger.json; every default below is the winner of
an interleaved on-chip A/B there. Losers are deleted, not flagged — the only
runtime configuration surface is:

  * ``CTRLORA_KERNELS`` — ONE documented env escape hatch, a comma-separated
    token list parsed once per lookup (e.g. ``CTRLORA_KERNELS=noflash`` or
    ``CTRLORA_KERNELS=safemax,bq=256``). Tokens:

      noflash        disable the Pallas flash-attention kernels (XLA softmax)
      bhsd           attention via the [B,H,S,D] transpose layout instead of
                     the hd-packed [B,S,H*D] default (ledger 2026-08-18:
                     packed 4.126 s/batch vs 4.399)
      safemax        exact per-row max guard in flash softmax instead of the
                     clamped-exp2 default (numerics debugging; ledger
                     2026-08-17: clamp is 1.3% faster end-to-end)
      fp32mm         force fp32 MXU operands in flash attention
      geglu=0|1      force the fused GEGLU-FFN kernel off/on (default: on
                     when on TPU; =1 forces interpret mode off-TPU for tests)
      fused_gn=0|1   force the fused GroupNorm kernel off/on (same default)
      bq=N bk=N      flash q/k block-size overrides (perf sweeps)
      packed_bq=N    hd-packed kernel q block override, skipping the VMEM
                     estimate (perf sweeps; trusts the raised per-kernel cap)
      gsplit=N       GEGLU-FFN software-pipeline sub-blocks (perf sweeps;
                     default 2-way when the row block allows — bit-identical
                     math, only the MXU/VPU issue order changes)
      split_res_add=0|1  optimization_barrier between the ResBlock out_conv
                     and its residual add, keeping the add out of the conv
                     fusion (profiled 0.70 vs 0.53 conv MFU at 64x64x320).
                     Default ON (ledger 2026-08-19: 4.083 vs 4.135 s/batch,
                     bit-identical checksums); =0 restores the fusion
      fuse_qkv=0|1   single-dot q/k/v projection (default on); =0 issues
                     separate dots so each flash operand is written directly
                     instead of sliced out of the fused result
      qkvpack=0|1    packed flash kernel consumes the fused q|k|v projection
                     output directly, skipping the XLA split (default on;
                     ledger 2026-08-19: 4.076 vs 4.090 s/batch)
      gblocked=0|1   f-blocked GEGLU kernel at the wide 16^2/8^2 FFN sites
                     whose weights exceed VMEM (default on; ledger
                     2026-08-19: 4.036 vs 4.090 s/batch)
      gn1=0|1        one-pass VMEM-resident GroupNorm for samples <= 3MB
                     (2x HBM traffic instead of the two-pass 3x)

  * :func:`override` / :func:`set_flags` — programmatic overrides for tests
    and the perf/ A/B harnesses (same fields, no subprocess needed).

Everything here is trace-time only: flags are read while JAX traces a
function, so changing them between ``jit`` compilations (as perf/ab_sampling
does) yields differently-compiled executables from one process.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import warnings
from typing import Iterator, Optional


@dataclasses.dataclass(frozen=True)
class KernelFlags:
    use_flash: bool = True
    attn_layout: str = "bshd"  # "bshd" (hd-packed) | "bhsd" (transpose path)
    safemax: bool = False
    fp32_matmul: bool = False
    geglu_ffn: Optional[bool] = None  # None -> on-TPU default
    geglu_split: Optional[int] = None  # None -> auto (2-way sw pipeline)
    fused_group_norm: Optional[bool] = None  # None -> on-TPU default
    block_q: Optional[int] = None
    block_k: Optional[int] = None
    packed_block_q: Optional[int] = None
    # keep the ResBlock residual add OUT of the conv fusion: the profiler
    # (2026-08-19) shows [8,64,64,320] 3x3 convs drop 0.70 -> 0.53 MFU when
    # XLA fuses the residual-add epilogue in (56.5 vs 43.1 ms/100 steps).
    # None -> ON (model-side default; A/B winner 4.083 vs 4.135)
    split_res_add: Optional[bool] = None
    # fuse self-attn q/k/v (and cross-attn k/v) projections into one dot.
    # The fusion cut launches when dispatch dominated (round 1); with the
    # packed flash kernel the jnp.split slices may force operand copies —
    # =0 issues separate dots that write each operand buffer directly
    fuse_qkv: Optional[bool] = None  # None -> ON
    # overflow clamp in the skip-max flash softmax (the min(s, 110) fused
    # into the exp2 pass). None -> ON. =0 drops the min — one fewer VPU op
    # per logits element on the kernel's hottest pass; exact for natural
    # logits < 127/log2(e) ~= 88 (SD observes < ~30) but overflows to
    # NaN beyond, so it is an A/B knob, not a general-safety default
    attn_clamp: Optional[bool] = None
    # software-pipeline the hd-packed kernel's head loop: issue head h+1's
    # QK matmul before head h's exp2/PV epilogue so the MXU never waits on
    # the VPU pass. None -> auto (see flash_attention._APIPE_DEFAULT)
    attn_pipe: Optional[bool] = None
    # pack N heads per matmul via block-diagonal K/V operands (the r4
    # verdict's proposed pad attack). Cycle analysis says MXU latency is
    # M x N-tiles x K-tiles and K<=128 always costs one K-tile, so packing
    # the d=40 contraction is a wash; this knob exists to measure it
    head_pack: Optional[int] = None  # None -> 1 (no packing)
    # feed the fused q|k|v projection output [B,S,3HD] straight into the
    # packed flash kernel (static lane offsets 0/HD/2HD) instead of paying
    # the XLA split fusion (55 ms/batch at the seven 64^2 sites, profiled
    # 2026-08-19). None -> ON (ledger 2026-08-19: 4.076 vs 4.090 s/batch,
    # bit-identical checksums); qkvpack=0 restores the split path
    attn_qkv_packed: Optional[bool] = None
    # f-blocked GEGLU kernel for the wide FFN sites (16^2/8^2: C=1280,
    # F=5120) whose weights exceed VMEM — streams F in column blocks with
    # an fp32 accumulator. None -> ON (ledger 2026-08-19: 4.036 vs 4.090
    # s/batch — the XLA path there ran ~0.47 MFU, add_add_fusion.7x,
    # 102 ms/batch); gblocked=0 restores the XLA fallback
    geglu_blocked: Optional[bool] = None
    # one-pass GroupNorm for samples that fit VMEM whole: x read from HBM
    # once instead of the two-kernel path's twice (profile 2026-08-19: GN
    # bucket 160 ms/batch at ~1.45x the bandwidth floor). None -> pending
    # A/B; gn1=1 enables, gn1=0 forces the two-pass path
    gn_onepass: Optional[bool] = None


_ENV = "CTRLORA_KERNELS"
_BOOL_FIELDS = {"geglu": "geglu_ffn", "fused_gn": "fused_group_norm",
                "split_res_add": "split_res_add", "fuse_qkv": "fuse_qkv",
                "clamp": "attn_clamp", "apipe": "attn_pipe",
                "qkvpack": "attn_qkv_packed", "gblocked": "geglu_blocked",
                "gn1": "gn_onepass"}
_INT_FIELDS = {"bq": "block_q", "bk": "block_k", "packed_bq": "packed_block_q",
               "gsplit": "geglu_split", "hpack": "head_pack"}
_parse_cache: dict[str, KernelFlags] = {}
_overrides: dict[str, object] = {}


def _parse(spec: str) -> KernelFlags:
    kw: dict[str, object] = {}
    for raw in spec.split(","):
        tok = raw.strip()
        if not tok:
            continue
        if tok == "noflash":
            kw["use_flash"] = False
        elif tok == "bhsd":
            kw["attn_layout"] = "bhsd"
        elif tok == "safemax":
            kw["safemax"] = True
        elif tok == "fp32mm":
            kw["fp32_matmul"] = True
        elif "=" in tok:
            key, _, val = tok.partition("=")
            if key in _BOOL_FIELDS and val in ("0", "1"):
                kw[_BOOL_FIELDS[key]] = val == "1"
            elif key in _INT_FIELDS:
                try:
                    n = int(val)
                except ValueError:
                    warnings.warn(f"ignoring malformed {_ENV} token {tok!r}")
                    continue
                if n > 0:
                    kw[_INT_FIELDS[key]] = n
                else:
                    warnings.warn(f"ignoring non-positive {_ENV} token {tok!r}")
            else:
                warnings.warn(f"ignoring unknown {_ENV} token {tok!r}")
        else:
            warnings.warn(f"ignoring unknown {_ENV} token {tok!r}")
    return KernelFlags(**kw)  # type: ignore[arg-type]


def flags() -> KernelFlags:
    """Current kernel flags: env spec, then programmatic overrides on top."""
    spec = os.environ.get(_ENV, "")
    base = _parse_cache.get(spec)
    if base is None:
        base = _parse(spec)
        _parse_cache[spec] = base
    if _overrides:
        return dataclasses.replace(base, **_overrides)  # type: ignore[arg-type]
    return base


def set_flags(**kw) -> None:
    """Set process-wide overrides (perf harnesses). Unknown fields raise."""
    names = {f.name for f in dataclasses.fields(KernelFlags)}
    for key in kw:
        if key not in names:
            raise TypeError(f"unknown kernel flag {key!r} (valid: {sorted(names)})")
    _overrides.update(kw)


def clear_flags() -> None:
    _overrides.clear()


@contextlib.contextmanager
def override(**kw) -> Iterator[None]:
    """Scoped flag overrides (tests, FLOP tracing)."""
    saved = dict(_overrides)
    set_flags(**kw)
    try:
        yield
    finally:
        _overrides.clear()
        _overrides.update(saved)
