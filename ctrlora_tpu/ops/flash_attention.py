"""Pallas TPU flash attention, forward + backward (FlashAttention-2 style).

Replaces the reference's three memory strategies — sliced attention
(cldm/hack.py:72-111), xformers memory-efficient attention
(ldm/modules/attention.py:197-243) and plain O(S^2) softmax — with online-
softmax kernels that never materialize the [Sq, Sk] logits in HBM, in either
direction.

Two public layouts:
  * dot_product_attention        — [B, H, S, D] (transpose layout)
  * dot_product_attention_bshd   — [B, S, H, D] (the projections' natural
    layout; the DEFAULT module path since the 2026-08-18 ledger A/B showed
    the hd-packed kernel saves the per-site layout copies: 4.126 vs 4.399
    s/batch end-to-end)

D may be non-128-aligned (SD1.5 uses head dims 40/80/160); Mosaic pads lanes
transparently. Variant knobs (safemax, fp32 MXU operands, block sizes) come
from ops.kernel_flags — losers from past A/Bs are deleted, not flagged
(retired: the round-2 kernel generation, 512-chunk forcing, and the
PV-transposed epilogue, which lost 4.62 vs 4.59 on 2026-08-18).

The forward also emits the per-row logsumexp; the backward recomputes
probabilities streamingly from it (no saved attention matrix):
    D  = rowsum(dO * O)
    P  = exp(QK^T * scale - L)
    dV = P^T dO ;  dS = P * (dO V^T - D) ;  dQ = scale * dS K ;  dK = scale * dS^T Q

Kernels run in interpret mode off-TPU so the math is testable on CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ctrlora_tpu.ops.kernel_flags import flags

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # exp(x) == exp2(x * LOG2E); exp2 is the native
# VPU op, and folding LOG2E into the one-time q scaling removes a per-element
# multiply from the [Sq, Sk]-sized softmax hot path


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, sk,
                mxu_dtype, skip_max):
    """VPU-pass-minimized forward. The profiled cost of this kernel at SD's
    dominant [64, 4096, 40] geometry is NOT the matmuls (d=40 keeps the MXU
    at ~31% and they are cheap in bf16) but the number of full VPU passes
    over the [bq, sk] logits block. Three structural choices keep it at
    max-reduce + one fused exp2-and-cast pass:

    - MXU operands in the input dtype (bf16 for inference configs), fp32
      accumulation via preferred_element_type. The round-2 bf16 experiment
      measured neutral because its p.astype(bf16) was a SEPARATE pass while
      a second consumer (the row-sum) pinned fp32 p in VMEM; here the cast
      fuses into the exp2 pass because the matmul is p's only consumer.
    - The softmax denominator comes out of the PV matmul: V is augmented
      with a ones column inside the kernel ([sk, d+1]), so row-sum(p) is
      the accumulator's last column — no separate VPU sum-reduce pass.
    - The scale is folded into q ONCE (logits live in the exp2 domain:
      s2 = (q.k * scale) * LOG2E); the reverted round-1 experiment instead
      multiplied every logits block by scale on the VPU.

    skip_max (the single-sweep default): softmax is shift-invariant for ANY
    constant, so the per-row max subtraction is an overflow guard, not math
    — exp2 keeps fp32 finite for logits up to 127/LOG2E ~= 88 in natural
    units vs SD's observed |logits| < ~30. Skipping it removes the
    remaining reduce pass (CTRLORA_KERNELS=safemax restores the exact
    guard)."""
    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # [bq, D]
    kv_blk = lambda ref, sl: ref[0, sl, :]
    q = q.astype(mxu_dtype)
    bq, d = q.shape
    num_k = sk // block_k

    def body(i, carry):
        acc, m = carry  # acc [bq, d+1] fp32: PV sums | softmax denominator
        k = kv_blk(k_ref, pl.ds(i * block_k, block_k)).astype(mxu_dtype)
        v = kv_blk(v_ref, pl.ds(i * block_k, block_k)).astype(mxu_dtype)
        v_aug = jnp.concatenate(
            [v, jnp.ones((block_k, 1), mxu_dtype)], axis=1
        )
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if skip_max:
            # overflow-proof static shift: clamping the exp2 argument fuses
            # into the same VPU pass (vs the max-reduce's extra full pass).
            # 2^110 * sk <= 2^122 keeps the row sum finite in fp32; the
            # clamp only alters results when a natural-units logit exceeds
            # 110/log2(e) ~= 76 (SD observes |logits| < ~30).
            m_new = m
            p = jnp.exp2(jnp.minimum(s, 110.0)).astype(mxu_dtype)
            acc_new = acc + jax.lax.dot_general(
                p, v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new).astype(mxu_dtype)
            alpha = jnp.exp2(m - m_new)
            acc_new = acc * alpha + jax.lax.dot_general(
                p, v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc_new, m_new

    acc = jnp.zeros((bq, d + 1), jnp.float32)
    m0 = 0.0 if skip_max else NEG_INF
    acc, m = jax.lax.fori_loop(
        0, num_k, body, (acc, jnp.full((bq, 1), m0, jnp.float32))
    )
    l = acc[:, d:]
    if skip_max:
        # graceful degradation if every logit in a row underflowed exp2
        # (all-natural-logits < ~-87, pathological): emit 0, not NaN
        l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc[:, :d] / l).astype(o_ref.dtype)
    # emit natural-log lse (the backward's contract): ln(sumexp) =
    # (m2 + log2(l)) * ln2
    lse_ref[0, 0] = ((m + jnp.log2(l)) * (1.0 / LOG2E))[:, 0]


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, heads,
                       d, mxu_dtype, skip_max, clamp, pipe,
                       q_off=0, k_off=0, v_off=0):
    """hd-packed single-k-sweep forward: operands stay in the projections'
    natural [B, S, H*D] layout (block minor dim == array dim, which Mosaic
    always allows), and heads are separated INSIDE the kernel by static lane
    slices. A per-head 4D [B, S, H, D] blocking is illegal on Mosaic (the
    second-to-minor block dim would be 1 of H), and the BHSD path instead
    pays a layout copy per operand per site (~0.55 s/batch profiled
    2026-08-17). The per-head slice is a small VMEM relayout next to the
    matmuls. Single-sweep only: the grid revisits the same K/V block for
    every q block, so HBM fetches K/V once per (batch, site).

    The PV matmul's 128-lane pad at SD head dims (41->128, ~32% MXU util)
    has now been attacked twice and both variants LOST their on-chip A/Bs:
    an explicit P-transpose epilogue ("pvt", 2026-08-18, 4.62 vs 4.59) and
    a transposed-logits formulation S^T = K@Q^T whose PV contracts with the
    pad on sublanes ("spt", 2026-08-19, 4.330 vs 4.137 — the [sk,bq]-
    oriented exp2 pass and strided transposed output write cost more than
    the pad saves). Don't retry a PV-orientation change without new
    evidence; the remaining headroom here is VPU-side, not pad-side:
    ``pipe`` issues head h+1's QK matmul before head h's exp2/PV epilogue
    so the MXU need not drain while the VPU walks the [bq, sk] logits, and
    ``clamp=False`` drops the overflow-guard min() from that pass (see
    kernel_flags.attn_clamp for the numerics contract).

    Round-5 adjudication (ledger 2026-08-19, 4-round interleaved e2e A/B):
    noclamp won its microbench (+4% at the dominant d40 geometry,
    perf/attn_packed_bench.py) but measured NEUTRAL end-to-end (min 4.080
    vs 4.079 s/batch) — the min pass is already hidden in the full graph —
    and apipe likewise (4.099 vs 4.079). Both knobs stay available but OFF.
    The head-pair block-diagonal packing (_fwd_kernel_hpack2 below) LOST
    (4.134 vs 4.079), as the MXU cycle model predicts: latency is
    M x N-tiles x K-tiles and any K<=128 costs one K-tile, so packing the
    d=40 contraction trades nothing for scratch-build overhead. exp2 in
    bf16 was analyzed and rejected without measurement: at unshifted-logit
    magnitudes (|s2|~44) bf16's 8-bit mantissa gives 0.25-ULP argument
    rounding = up to ~19% per-element probability error."""
    sk = k_ref.shape[1]
    bq = q_ref.shape[1]

    def qk(h):
        q = q_ref[0][:, q_off + h * d:q_off + (h + 1) * d]
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(mxu_dtype)
        k = k_ref[0][:, k_off + h * d:k_off + (h + 1) * d].astype(mxu_dtype)
        return jax.lax.dot_general(  # [bq, sk]
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def epilogue(h, s):
        sl = slice(h * d, (h + 1) * d)
        v = v_ref[0][:, v_off + h * d:v_off + (h + 1) * d].astype(mxu_dtype)
        v_aug = jnp.concatenate([v, jnp.ones((sk, 1), mxu_dtype)], axis=1)
        if skip_max:
            m = jnp.zeros((bq, 1), jnp.float32)
            p = jnp.exp2(jnp.minimum(s, 110.0) if clamp else s)
            p = p.astype(mxu_dtype)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m).astype(mxu_dtype)
        acc = jax.lax.dot_general(  # [bq, d+1]
            p, v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = acc[:, d:]
        if skip_max:
            l = jnp.maximum(l, 1e-30)
        o_ref[0, :, sl] = (acc[:, :d] / l).astype(o_ref.dtype)
        lse_ref[0, h, :] = ((m + jnp.log2(l)) * (1.0 / LOG2E))[:, 0]

    if pipe:
        # one-deep software pipeline over heads: the next head's QK is
        # traced (and thus scheduled) before this head's VPU-heavy
        # epilogue, keeping one logits block in flight. Costs one extra
        # resident [bq, sk] fp32 block of VMEM.
        s = qk(0)
        for h in range(heads):
            s_next = qk(h + 1) if h + 1 < heads else None
            epilogue(h, s)
            s = s_next
    else:
        for h in range(heads):
            epilogue(h, qk(h))


def _fwd_kernel_hpack2(q_ref, k_ref, v_ref, o_ref, lse_ref, kbd_ref, vbd_ref,
                       *, scale, heads, d, mxu_dtype, clamp):
    """Block-diagonal head-PAIR packing (the r4 verdict's proposed attack on
    the d=40 lane pad): K/V for heads (2p, 2p+1) are laid out as
    block-diagonal operands

        Kbd = [[K0,  0], [ 0, K1]]   [2sk, 2d]
        Vbd = [[V0, 0, 1, 0], [0, V1, 0, 1]]   [2sk, 2d+2]

    so ONE QK matmul contracts 2d=80 of 128 lanes (vs 40) and ONE PV matmul
    emits 2d+2=82 of 128 (vs 41). Cycle analysis predicts a wash — MXU
    latency is M x N-tiles x K-tiles and any K<=128 costs one K-tile, so
    QK goes from 2 matmuls x 32 N-tiles to 1 x 64 and PV from 2 x 32
    K-tiles to 1 x 64 — but the verdict asked for the measurement, not the
    argument. The operands are built ONCE per batch row (pl.when on the
    q-block index) into VMEM scratch so the build cost doesn't confound
    the steady state. skip_max-only (inference-perf experiment)."""
    sk = k_ref.shape[1]
    lanes = 128  # per-pair scratch stride, keeping every slice lane-aligned

    @pl.when(pl.program_id(1) == 0)
    def _build():  # new batch row: rebuild the block-diagonal operands
        kbd_ref[...] = jnp.zeros(kbd_ref.shape, kbd_ref.dtype)
        vbd_ref[...] = jnp.zeros(vbd_ref.shape, vbd_ref.dtype)
        for p_ in range(heads // 2):
            h0, h1 = 2 * p_, 2 * p_ + 1
            k0 = k_ref[0][:, h0 * d:(h0 + 1) * d].astype(mxu_dtype)
            k1 = k_ref[0][:, h1 * d:(h1 + 1) * d].astype(mxu_dtype)
            kbd_ref[0:sk, p_ * lanes:p_ * lanes + d] = k0
            kbd_ref[sk:2 * sk, p_ * lanes + d:p_ * lanes + 2 * d] = k1
            v0 = v_ref[0][:, h0 * d:(h0 + 1) * d].astype(mxu_dtype)
            v1 = v_ref[0][:, h1 * d:(h1 + 1) * d].astype(mxu_dtype)
            vbd_ref[0:sk, p_ * lanes:p_ * lanes + d] = v0
            vbd_ref[sk:2 * sk, p_ * lanes + d:p_ * lanes + 2 * d] = v1
            ones = jnp.ones((sk, 1), mxu_dtype)
            vbd_ref[0:sk, p_ * lanes + 2 * d:p_ * lanes + 2 * d + 1] = ones
            vbd_ref[sk:2 * sk,
                    p_ * lanes + 2 * d + 1:p_ * lanes + 2 * d + 2] = ones

    for p_ in range(heads // 2):
        h0 = 2 * p_
        q = q_ref[0][:, h0 * d:(h0 + 2) * d].astype(jnp.float32)
        q = (q * (scale * LOG2E)).astype(mxu_dtype)  # [bq, 2d]
        kbd = kbd_ref[:, p_ * lanes:p_ * lanes + 2 * d]
        s = jax.lax.dot_general(  # [bq, 2sk] — both heads' logits
            q, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp2(jnp.minimum(s, 110.0) if clamp else s).astype(mxu_dtype)
        vbd = vbd_ref[:, p_ * lanes:p_ * lanes + 2 * d + 2]
        acc = jax.lax.dot_general(  # [bq, 2d+2] = [o0 | o1 | l0 | l1]
            p, vbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for j, h in enumerate((h0, h0 + 1)):
            l = jnp.maximum(acc[:, 2 * d + j:2 * d + j + 1], 1e-30)
            o_ref[0, :, h * d:(h + 1) * d] = (
                acc[:, j * d:(j + 1) * d] / l
            ).astype(o_ref.dtype)
            lse_ref[0, h, :] = (jnp.log2(l) * (1.0 / LOG2E))[:, 0]


def _packed_sweep_vmem(block_q: int, sk: int, heads: int, d: int,
                       itemsize: int, mxu_itemsize: int) -> int:
    """Resident-VMEM estimate for the hd-packed kernel. Only ONE head's
    logits/p transients are live at a time (the head loop is sequential),
    but the K/V refs hold all heads packed."""
    hd = heads * d
    hdpad = ((hd + 127) // 128) * 128
    dpad = ((d + 127) // 128) * 128
    est = 4 * block_q * sk  # logits (fp32, one head)
    est += mxu_itemsize * block_q * sk  # p block
    est += 2 * itemsize * sk * hdpad  # packed K/V refs
    est += 2 * mxu_itemsize * sk * dpad  # per-head k/v slice copies
    est += mxu_itemsize * sk * dpad  # ones-augmented V copy
    est += (itemsize + itemsize) * block_q * hdpad  # q/out refs
    est += (4 + mxu_itemsize + 4) * block_q * dpad  # q fp32+cast, acc
    return est


def _fwd_kernel_packed_qkv(qkv_q_ref, qkv_kv_ref, o_ref, lse_ref, *, scale,
                           heads, d, mxu_dtype, skip_max, clamp, pipe):
    """Packed forward reading the FUSED q|k|v projection output directly.

    The fused self-attn projection emits [B, S, 3*H*D] (q | k | v on lanes,
    models/attention.py); the default path then pays an XLA split fusion —
    three 20 MB writes + a read per 64^2 site, 55 ms/batch profiled
    2026-08-19 — solely to hand the kernel three separate operands. This
    variant keeps the fused output: one q-windowed ref and ONE full-sk ref
    serve all three operands via static lane offsets (0 / HD / 2HD), the
    same in-kernel slicing the packed kernel already does per head. The kv
    ref re-fetches the q rows it doesn't need (+1/3 bytes on the K/V
    stream), ~9 ms/batch of HBM traffic against the 55 ms split it
    deletes."""
    hd = heads * d
    _fwd_kernel_packed(qkv_q_ref, qkv_kv_ref, qkv_kv_ref, o_ref, lse_ref,
                       scale=scale, heads=heads, d=d, mxu_dtype=mxu_dtype,
                       skip_max=skip_max, clamp=clamp, pipe=pipe,
                       q_off=0, k_off=hd, v_off=2 * hd)


def _packed_qkv_vmem(block_q: int, sk: int, heads: int, d: int,
                     itemsize: int, mxu_itemsize: int) -> int:
    """Resident-VMEM estimate for the qkv-packed kernel: like
    _packed_sweep_vmem but the K/V refs are ONE [sk, 3HD] block and the q
    ref spans 3HD lanes."""
    hd = heads * d
    hd3pad = ((3 * hd + 127) // 128) * 128
    hdpad = ((hd + 127) // 128) * 128
    dpad = ((d + 127) // 128) * 128
    est = 4 * block_q * sk  # logits (fp32, one head)
    est += mxu_itemsize * block_q * sk  # p block
    est += itemsize * sk * hd3pad  # packed qkv full-sk ref
    est += 2 * mxu_itemsize * sk * dpad  # per-head k/v slice copies
    est += mxu_itemsize * sk * dpad  # ones-augmented V copy
    est += itemsize * block_q * hd3pad  # q-windowed ref
    est += itemsize * block_q * hdpad  # out ref
    est += (4 + mxu_itemsize + 4) * block_q * dpad  # q fp32+cast, acc
    return est


def _packed_qkv_ok(sq: int, sk: int, heads: int, d: int, dtype) -> bool:
    if sq != sk:  # fused qkv exists only for self-attention
        return False
    mxu_isz = 2 if (dtype == jnp.bfloat16 and not flags().fp32_matmul) else 4
    for bq in (256, 128):
        if (bq <= sq and sq % bq == 0
                and _packed_qkv_vmem(bq, sk, heads, d, dtype.itemsize, mxu_isz)
                * _PACKED_MEASURED_OVER_EST <= _PACKED_SWEEP_LIMIT):
            return True
    return False


def _flash_forward_qkv(qkv, heads, d, scale):
    """qkv: [B, S, 3*H*D] fused projection output -> ([B,S,H*D] out, lse)."""
    fl = flags()
    b, s, hd3 = qkv.shape
    hd = hd3 // 3
    mxu_dtype = _mxu_dtype(qkv)
    mxu_isz = jnp.dtype(mxu_dtype).itemsize
    block_q = None
    for bq_cand in (256, 128):
        if (bq_cand <= s and s % bq_cand == 0
                and _packed_qkv_vmem(bq_cand, s, heads, d,
                                     qkv.dtype.itemsize, mxu_isz)
                * _PACKED_MEASURED_OVER_EST <= _PACKED_SWEEP_LIMIT):
            block_q = bq_cand
            break
    assert block_q is not None, "caller must check _packed_qkv_ok first"
    clamp = fl.attn_clamp if fl.attn_clamp is not None else True
    pipe = fl.attn_pipe if fl.attn_pipe is not None else _APIPE_DEFAULT
    kern = functools.partial(_fwd_kernel_packed_qkv, scale=scale, heads=heads,
                             d=d, mxu_dtype=mxu_dtype,
                             skip_max=not fl.safemax, clamp=clamp, pipe=pipe)
    out, lse = pl.pallas_call(
        kern,
        grid=(b, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd3), lambda i, n: (i, n, 0)),
            pl.BlockSpec((1, s, hd3), lambda i, n: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, n: (i, n, 0)),
            pl.BlockSpec((1, heads, block_q), lambda i, n: (i, 0, n)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, heads, s), jnp.float32),
        ],
        compiler_params=(pltpu.CompilerParams(
                             vmem_limit_bytes=_PACKED_VMEM_GRANT)
                         if pltpu is not None and not _interpret() else None),
        interpret=_interpret(),
    )(qkv, qkv)
    return out, lse


def _pick_block(size: int, preferred: int = 512,
                forced: Optional[int] = None) -> Optional[int]:
    if forced:  # perf-sweep override from kernel_flags (bq=/bk=)
        preferred = forced
    # a preferred block that doesn't divide `size` falls through to the
    # defaults below rather than erroring
    for cand in (preferred, 512, 256, 128):
        if cand <= size and size % cand == 0:
            return cand
    return None


def _packed_ok(sq: int, sk: int, heads: int, d: int, dtype) -> bool:
    """True when the hd-packed single-sweep kernel can run this geometry:
    some q block in (256, 128) fits the VMEM budget."""
    mxu_isz = 2 if (dtype == jnp.bfloat16 and not flags().fp32_matmul) else 4
    isz = jnp.dtype(dtype).itemsize
    return any(
        bq <= sq and sq % bq == 0
        and _packed_sweep_vmem(bq, sk, heads, d, isz, mxu_isz)
        * _PACKED_MEASURED_OVER_EST <= _PACKED_SWEEP_LIMIT
        for bq in (256, 128)
    )


def _interpret() -> bool:
    from ctrlora_tpu.utils.platform import pallas_interpret

    return pallas_interpret()


def _mxu_dtype(q) -> jnp.dtype:
    """MXU operand dtype: the input dtype, unless fp32 operands are forced
    (CTRLORA_KERNELS=fp32mm — numerics-debugging knob). fp32 inputs always
    use fp32 operands; accumulation is fp32 either way."""
    if q.dtype == jnp.bfloat16 and not flags().fp32_matmul:
        return jnp.bfloat16
    return jnp.float32


def _single_sweep_vmem(block_q: int, sk: int, d: int, itemsize: int,
                       mxu_itemsize: int) -> int:
    """Itemized resident-VMEM estimate for the single-k-sweep kernel:
    [block_q, sk] fp32 logits + the cast p block at MXU width, the K/V
    input refs at their true itemsize, the in-kernel mxu-dtype K/V copies
    when the cast is not a no-op, and the q/acc/out blocks. The lane dim
    pads to the next multiple of 128 (d=160 pads to 256, not 160)."""
    dpad = ((d + 127) // 128) * 128
    est = 4 * block_q * sk  # logits block (fp32)
    est += mxu_itemsize * block_q * sk  # p = exp2(s).astype(mxu) block
    est += 2 * itemsize * sk * dpad  # K/V refs
    if mxu_itemsize != itemsize:
        est += 2 * mxu_itemsize * sk * dpad  # cast copies of K and V
    est += mxu_itemsize * sk * dpad  # ones-augmented V copy
    est += (itemsize + 4 + 4 + itemsize) * block_q * dpad  # q ref/scaled/acc/out
    return est


# Threshold calibrated on-chip (perf/ledger.json 2026-08-17): the dominant
# SD shape [8,8,4096,40] must single-sweep (9% faster than 512-chunking)
# but borderline-VMEM kernels compile DEGRADED inside big graphs (VAE
# decode 163ms vs 14ms) — keep the estimate itemized and honest. With bf16
# MXU operands the dominant shape estimates ~16.5MB at block_q=512 /
# ~9.8MB at block_q=256, so the sweep search below shrinks block_q before
# giving up on the single sweep.
_SINGLE_SWEEP_LIMIT = int(15.5 * (1 << 20))

# The packed kernel's measured scoped-VMEM need at the dominant
# [8,4096,320] site is 18MB against a ~13MB itemized estimate (Mosaic
# stack accounting across the unrolled head loop exceeds the itemization).
# Admission therefore scales the estimate by that observed ratio and
# checks it against HALF the 48MB explicit per-kernel grant — headroom for
# geometries where the ratio drifts further.
_PACKED_MEASURED_OVER_EST = 18.0 / 13.0
_PACKED_SWEEP_LIMIT = int(24 * (1 << 20))
_PACKED_VMEM_GRANT = 48 * (1 << 20)  # v5e has 128MB VMEM

# Default for the packed kernel's head-loop software pipeline (see
# _fwd_kernel_packed): OFF until an on-chip ledger A/B adopts it —
# CTRLORA_KERNELS=apipe / apipe=0 overrides either way.
_APIPE_DEFAULT = False


def _flash_forward(q, k, v, scale, bshd=False):
    fl = flags()
    if bshd:
        b, sq, h, d = q.shape
        sk = k.shape[1]
    else:
        b, h, sq, d = q.shape
        sk = k.shape[2]
    block_q = _pick_block(sq, forced=fl.block_q)

    mxu_dtype = _mxu_dtype(q)
    mxu_isz = jnp.dtype(mxu_dtype).itemsize

    def _sweep_fits(bq: int) -> bool:
        return _single_sweep_vmem(
            bq, sk, d, q.dtype.itemsize, mxu_isz
        ) <= _SINGLE_SWEEP_LIMIT

    if fl.block_k:
        block_k = _pick_block(sk, forced=fl.block_k)
    else:
        # prefer the single k-sweep, shrinking the q block to fit VMEM
        # before falling back to chunked online softmax
        block_k = None
        cands = (block_q,) if fl.block_q else (block_q, 256, 128)
        for bq_cand in cands:
            if (bq_cand and bq_cand <= sq and sq % bq_cand == 0
                    and _sweep_fits(bq_cand)):
                block_q, block_k = bq_cand, sk
                break
        if block_k is None:
            block_k = _pick_block(sk)
    assert block_q is not None and block_k is not None
    if bshd:
        # hd-packed path (see _fwd_kernel_packed): q/k/v are reshaped (free —
        # minor dims collapse) to [B, S, H*D] and the kernel separates heads
        # by static lane slices. Shrink the q block until the single sweep
        # fits; the caller (dot_product_attention_bshd) guarantees fit via
        # _packed_ok, so block_q is never None here.
        block_q = None
        if fl.packed_block_q:  # perf-sweep knob: trust the raised VMEM
            cand = fl.packed_block_q  # grant, skip the estimate
            if 0 < cand <= sq and sq % cand == 0:
                block_q = cand
        if block_q is None:
            for bq_cand in (256, 128):
                if (bq_cand <= sq and sq % bq_cand == 0
                        and _packed_sweep_vmem(bq_cand, sk, h, d,
                                               q.dtype.itemsize, mxu_isz)
                        * _PACKED_MEASURED_OVER_EST <= _PACKED_SWEEP_LIMIT):
                    block_q = bq_cand
                    break
        assert block_q is not None, "caller must check _packed_ok first"
        hd = h * d
        clamp = fl.attn_clamp if fl.attn_clamp is not None else True
        hpack = (fl.head_pack or 1) > 1
        if hpack and (fl.safemax or h % 2 != 0 or 2 * d > 128
                      or pltpu is None):
            hpack = False  # experiment path: pairs only, skip-max only,
            # and pltpu must resolve (the kernel needs VMEM scratch refs)
        scratch = []
        if hpack:
            kern = functools.partial(_fwd_kernel_hpack2, scale=scale,
                                     heads=h, d=d, mxu_dtype=mxu_dtype,
                                     clamp=clamp)
            scratch = [
                pltpu.VMEM((2 * sk, 128 * (h // 2)), mxu_dtype),
                pltpu.VMEM((2 * sk, 128 * (h // 2)), mxu_dtype),
            ]
        else:
            pipe = (fl.attn_pipe if fl.attn_pipe is not None
                    else _APIPE_DEFAULT)
            kern = functools.partial(_fwd_kernel_packed, scale=scale,
                                     heads=h, d=d, mxu_dtype=mxu_dtype,
                                     skip_max=not fl.safemax, clamp=clamp,
                                     pipe=pipe)
        qp, kp, vp = (t.reshape(t.shape[0], t.shape[1], hd) for t in (q, k, v))
        out, lse = pl.pallas_call(
            kern,
            grid=(b, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda i, n: (i, n, 0)),
                pl.BlockSpec((1, sk, hd), lambda i, n: (i, 0, 0)),
                pl.BlockSpec((1, sk, hd), lambda i, n: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, hd), lambda i, n: (i, n, 0)),
                pl.BlockSpec((1, h, block_q), lambda i, n: (i, 0, n)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
                jax.ShapeDtypeStruct((b, h, sq), jnp.float32),
            ],
            scratch_shapes=scratch,
            # raise the per-kernel VMEM limit explicitly (see
            # _PACKED_SWEEP_LIMIT above for the admission math)
            compiler_params=(pltpu.CompilerParams(
                                 vmem_limit_bytes=_PACKED_VMEM_GRANT)
                             if pltpu is not None and not _interpret() else None),
            interpret=_interpret(),
        )(qp, kp, vp)
        return out.reshape(b, sq, h, d), lse
    # the max-subtraction is an overflow guard (softmax is shift-
    # invariant); the single-sweep default replaces it with a clamped
    # exp2 (fused, no extra pass — 2.5% end-to-end on the ledger A/B).
    # CTRLORA_KERNELS=safemax restores the exact per-row guard. (The
    # round-2 kernel generation was retired after the 2026-08-17 18:24
    # ledger A/B: flashv1 4.78 s/batch vs default 4.66.)
    skip_max = block_k == sk and not fl.safemax
    kern = functools.partial(_fwd_kernel, scale=scale, block_k=block_k,
                             sk=sk, mxu_dtype=mxu_dtype, skip_max=skip_max)
    g = b * h
    qf, kf, vf = (t.reshape(g, t.shape[2], d) for t in (q, k, v))
    out, lse = pl.pallas_call(
        kern,
        grid=(g, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, sq, d), q.dtype),
            jax.ShapeDtypeStruct((g, 1, sq), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d), lse.reshape(b, h, sq)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, block_k, sk):
    q = q_ref[0].astype(jnp.float32)
    q2 = q * (scale * LOG2E)  # exp2-domain logits operand
    do = do_ref[0].astype(jnp.float32)
    lse2 = lse_ref[0, 0][:, None] * LOG2E
    delta = delta_ref[0, 0][:, None]
    bq, d = q.shape
    num_k = sk // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp2(s - lse2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, sq):
    k = k_ref[0].astype(jnp.float32)  # [bk, D]
    k2 = k * (scale * LOG2E)  # exp2-domain logits operand
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    num_q = sq // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse2 = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None] * LOG2E
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk], exp2 domain
        p = jnp.exp2(s - lse2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)  # [bq, bk]
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk = jnp.zeros((bk, d), jnp.float32)
    dv = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(scale, res, g):
    q, k, v, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = _pick_block(sq)
    block_k = _pick_block(sk)
    gb = b * h
    qf, kf, vf, of, gf = (t.reshape(gb, t.shape[2], d) for t in (q, k, v, out, g))
    lsef = lse.reshape(gb, 1, sq)
    delta = jnp.sum(of.astype(jnp.float32) * gf.astype(jnp.float32), axis=-1)[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k, sk=sk),
        grid=(gb, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((gb, sq, d), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, gf, lsef, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q, sq=sq),
        grid=(gb, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gb, sk, d), k.dtype),
            jax.ShapeDtypeStruct((gb, sk, d), v.dtype),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, gf, lsef, delta)

    rs = lambda t, s: t.reshape(b, h, s, d)
    return rs(dq, sq), rs(dk, sk), rs(dv, sk)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def xla_attention(q, k, v, scale):
    """Reference attention: fp32 logits+softmax (ATTN_PRECISION=fp32 path,
    ldm/modules/attention.py:173-179), bf16 PV matmul."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    return _flash_forward(q, k, v, scale)[0]


def _flash_fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale)
    return out, (q, k, v, out, lse)


_flash_attention.defvjp(_flash_fwd, _flash_backward)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_bshd(q, k, v, scale):
    return _flash_forward(q, k, v, scale, bshd=True)[0]


def _flash_bshd_fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale, bshd=True)
    return out, (q, k, v, out, lse)


def _flash_bshd_bwd(scale, res, g):
    # the backward reuses the BHSD kernels via transposes: sampling (the
    # layout-copy hot path) never differentiates, and in training the
    # transposes are one-time per step, not per-sample-step
    q, k, v, out, lse = res
    tr = lambda t: t.transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_backward(scale, (tr(q), tr(k), tr(v), tr(out), lse), tr(g))
    return tr(dq), tr(dk), tr(dv)


_flash_attention_bshd.defvjp(_flash_bshd_fwd, _flash_bshd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _flash_attention_qkv(qkv, heads, d, scale):
    return _flash_forward_qkv(qkv, heads, d, scale)[0]


def _flash_qkv_fwd(qkv, heads, d, scale):
    out, lse = _flash_forward_qkv(qkv, heads, d, scale)
    return out, (qkv, out, lse)


def _flash_qkv_bwd(heads, d, scale, res, g):
    # split + transpose once per step and reuse the BHSD backward kernels;
    # sampling (the hot path) never differentiates this
    qkv, out, lse = res
    b, s, _ = qkv.shape
    tr = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dq, dk, dv = _flash_backward(
        scale, (tr(q), tr(k), tr(v), tr(out), lse),
        tr(g),
    )
    back = lambda t: t.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
    return (jnp.concatenate([back(dq), back(dk), back(dv)], axis=-1),)


_flash_attention_qkv.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


def dot_product_attention_bshd_qkv(
    qkv: jnp.ndarray,
    heads: int,
    dim_head: int,
    scale: Optional[float] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Self-attention straight off the fused q|k|v projection output
    [B, S, 3*H*D] — no split, no per-operand buffers (see
    _fwd_kernel_packed_qkv). Returns [B, S, H, D]. Falls back to the split
    + dot_product_attention_bshd chain for non-qualifying geometries."""
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    b, s, hd3 = qkv.shape
    flash_ok = (
        use_flash
        and flags().use_flash
        and _on_tpu()
        and s >= 256
        and _pick_block(s) is not None
    )
    if flash_ok and _packed_qkv_ok(s, s, heads, dim_head, qkv.dtype):
        out = _flash_attention_qkv(qkv, heads, dim_head, scale)
        return out.reshape(b, s, heads, dim_head)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    h4 = lambda t: t.reshape(b, s, heads, dim_head)
    return dot_product_attention_bshd(
        h4(q), h4(k), h4(v), scale=scale, use_flash=use_flash
    )


def _on_tpu() -> bool:
    from ctrlora_tpu.utils.platform import on_accelerator

    return on_accelerator() and pltpu is not None


def flash_attention(q, k, v, scale=None):
    """Direct flash entry (interpret mode off-TPU) — used by tests."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_attention(q, k, v, scale)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Multi-head attention over [B, H, S, D] tensors, unmasked.

    Dispatches to the Pallas flash kernels when on TPU and the sequence
    geometry tiles cleanly; otherwise the fp32-softmax XLA path.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    sq, sk = q.shape[2], k.shape[2]
    flash_ok = (
        use_flash
        and flags().use_flash
        and _on_tpu()
        and sk >= 256
        and _pick_block(sq) is not None
        and _pick_block(sk) is not None
    )
    if flash_ok:
        return _flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)


def dot_product_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Multi-head attention over [B, S, H, D] tensors, unmasked.

    Same math as dot_product_attention but consumes/produces the head-split
    projection layout directly, so no BHSD transpose (a layout copy per
    operand per site on TPU) is needed around the kernel. Falls back to
    transpose + XLA softmax off-TPU or for non-tiling geometries.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    sq, sk = q.shape[1], k.shape[1]
    h, d = q.shape[2], q.shape[3]
    # Small Sk (cross-attention's 77 text tokens) stays on the XLA fallback
    # on purpose: a pad-K/V-to-128 + in-kernel NEG_INF-mask variant of the
    # packed kernel was built and A/B'd on-chip (ledger 2026-08-19) and LOST
    # — 4.379 s/batch vs 4.136 for the fallback on the DDIM-50 headline.
    # With Sk that small the whole softmax is one fused XLA loop; the kernel
    # only added pallas_call overhead per site. Don't retry without new data.
    flash_ok = (
        use_flash
        and flags().use_flash
        and _on_tpu()
        and sk >= 256
        and _pick_block(sq) is not None
        and _pick_block(sk) is not None
    )
    if flash_ok and _packed_ok(sq, sk, h, d, q.dtype):
        return _flash_attention_bshd(q, k, v, scale)
    tr = lambda t: t.transpose(0, 2, 1, 3)
    if flash_ok:  # packed sweep doesn't fit: BHSD kernel with layout copies
        return tr(_flash_attention(tr(q), tr(k), tr(v), scale))
    return tr(xla_attention(tr(q), tr(k), tr(v), scale))
