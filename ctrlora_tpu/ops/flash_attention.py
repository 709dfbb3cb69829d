"""Pallas TPU flash attention, forward + backward (FlashAttention-2 style).

Replaces the reference's three memory strategies — sliced attention
(cldm/hack.py:72-111), xformers memory-efficient attention
(ldm/modules/attention.py:197-243) and plain O(S^2) softmax — with online-
softmax kernels that never materialize the [Sq, Sk] logits in HBM, in either
direction.

Shapes: q [B, H, Sq, D], k/v [B, H, Sk, D], unmasked full attention (SD's
spatial self-attention is unmasked). D may be non-128-aligned (SD1.5 uses
head dims 40/80/160); Mosaic pads lanes transparently.

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
                bf16_ops):
    # bf16_ops: keep MXU operands in bf16 (fp32 accumulation via
    # preferred_element_type). The scale is folded into q ONCE here — the
    # reverted round-1 experiment instead multiplied every [bq, bk] logits
    # block by scale on the VPU, which cost more than the MXU saved.
    # logits tracked in the exp2 domain: s2 = (q.k * scale) * LOG2E
    if bf16_ops:
        q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    else:
        q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # [bq, D]
    bq, d = q.shape
    num_k = sk // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        if not bf16_ops:
            k = k.astype(jnp.float32)
            v = v.astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = p.astype(v.dtype) if bf16_ops else p
        acc_new = acc * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # emit natural-log lse (the backward's contract): ln(sumexp) =
    # (m2 + log2(l)) * ln2
    lse_ref[0, 0] = ((m + jnp.log2(l)) * (1.0 / LOG2E))[:, 0]


def _pick_block(size: int, preferred: int = 512, env: Optional[str] = None) -> Optional[int]:
    import os

    if env and os.environ.get(env):  # experiment knob for perf/ microbenches
        try:
            preferred = int(os.environ[env])
        except ValueError:
            import warnings

            warnings.warn(f"ignoring malformed {env}={os.environ[env]!r}")
    # a preferred block that doesn't divide `size` falls through to the
    # defaults below rather than erroring
    for cand in (preferred, 512, 256, 128):
        if cand <= size and size % cand == 0:
            return cand
    return None


def _interpret() -> bool:
    from ctrlora_tpu.utils.platform import effective_platform

    return effective_platform() == "cpu"


def _use_bf16_operands() -> bool:
    import os

    return bool(os.environ.get("CTRLORA_FLASH_BF16"))


def _single_sweep_vmem(block_q: int, sk: int, d: int, itemsize: int,
                       bf16_ops: bool) -> int:
    """Itemized resident-VMEM estimate for the single-k-sweep kernel:
    [block_q, sk] fp32 logits, the K/V input refs at their true itemsize,
    the in-kernel fp32 K/V copies the non-bf16_ops path makes, and the
    q/acc/out blocks. The lane dim pads to 128."""
    dpad = max(d, 128)
    est = 4 * block_q * sk  # logits block (fp32)
    est += 2 * itemsize * sk * dpad  # K/V refs
    if not bf16_ops and itemsize < 4:
        est += 2 * 4 * sk * dpad  # fp32 copies of K and V inside the kernel
    est += (itemsize + 4 + 4 + itemsize) * block_q * dpad  # q ref/scaled/acc/out
    return est


# Threshold calibrated on-chip (perf/ledger.json 2026-08-17): the dominant
# SD shape [8,8,4096,40] single-sweeps at ~14.8MB estimated (bf16 inputs,
# fp32 ops) and measures 9% faster than 512-chunking; the VAE's d=512
# single-head case estimates far above and must chunk (it compiled DEGRADED
# inside big graphs when taken, 163ms vs 14ms decode).
_SINGLE_SWEEP_LIMIT = int(15.5 * (1 << 20))


def _flash_forward(q, k, v, scale):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = _pick_block(sq, env="CTRLORA_FLASH_BQ")
    import os as _os

    bf16_ops = _use_bf16_operands() and q.dtype == jnp.bfloat16
    if _os.environ.get("CTRLORA_FLASH_BK"):
        block_k = _pick_block(sk, env="CTRLORA_FLASH_BK")
    elif block_q is not None and _single_sweep_vmem(
        block_q, sk, d, q.dtype.itemsize, bf16_ops
    ) <= _SINGLE_SWEEP_LIMIT:
        block_k = sk
    else:
        block_k = _pick_block(sk)
    assert block_q is not None and block_k is not None
    g = b * h
    qf, kf, vf = (t.reshape(g, t.shape[2], d) for t in (q, k, v))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k, sk=sk,
                          bf16_ops=bf16_ops),
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
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)  # [bq, bk]
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
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


def _on_tpu() -> bool:
    try:
        from ctrlora_tpu.utils.platform import effective_platform

        return effective_platform() != "cpu" and pltpu is not None
    except Exception:  # pragma: no cover
        return False


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
    import os

    flash_ok = (
        use_flash
        and not os.environ.get("CTRLORA_NO_FLASH")
        and _on_tpu()
        and sk >= 256
        and _pick_block(sq) is not None
        and _pick_block(sk) is not None
    )
    if flash_ok:
        return _flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
