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


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, sk):
    # keep MXU operands in the input dtype (bf16): v5e runs fp32 matmuls at
    # ~1/4 bf16 throughput; accumulation stays fp32 via preferred_element_type
    q = q_ref[0, :, 0, :]  # [bq, D] (blocks carved from [B, S, H, D])
    bq, d = q.shape
    num_k = sk // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), 0, :]
        v = v_ref[0, pl.ds(i * block_k, block_k), 0, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m, l))
    o_ref[0, :, 0, :] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _pick_block(size: int, preferred: int = 512) -> Optional[int]:
    for cand in (preferred, 256, 128):
        if cand <= size and size % cand == 0:
            return cand
    return None


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _flash_forward(q, k, v, scale):
    """q/k/v in BSHD layout ([B, S, H, D]) — the models' native layout, so
    no transpose/copy is materialized on either side of the kernel."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = _pick_block(sq)
    block_k = _pick_block(sk)
    assert block_q is not None and block_k is not None
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k, sk=sk),
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 1, d), lambda i, j, n: (i, n, j, 0)),
            pl.BlockSpec((1, sk, 1, d), lambda i, j, n: (i, 0, j, 0)),
            pl.BlockSpec((1, sk, 1, d), lambda i, j, n: (i, 0, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, 1, d), lambda i, j, n: (i, n, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j, n: (i, j, n)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, h, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, block_k, sk):
    q = q_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :]
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    bq, d = q.shape
    num_k = sk // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), 0, :]
        v = v_ref[0, pl.ds(i * block_k, block_k), 0, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, :, 0, :] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, sq):
    k = k_ref[0, :, 0, :]  # [bk, D]
    v = v_ref[0, :, 0, :]
    bk, d = k.shape
    num_q = sq // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), 0, :]
        do = do_ref[0, pl.ds(i * block_q, block_q), 0, :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]
        p = jnp.exp(s - lse)
        pc = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(q.dtype)  # [bq, bk]
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk = jnp.zeros((bk, d), jnp.float32)
    dv = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk, dv))
    dk_ref[0, :, 0, :] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, :, 0, :] = dv.astype(dv_ref.dtype)


def _flash_backward(scale, res, g):
    q, k, v, out, lse = res  # BSHD
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = _pick_block(sq)
    block_k = _pick_block(sk)
    delta = jnp.einsum(
        "bshd,bshd->bhs", out.astype(jnp.float32), g.astype(jnp.float32)
    )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k, sk=sk),
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 1, d), lambda i, j, n: (i, n, j, 0)),
            pl.BlockSpec((1, sk, 1, d), lambda i, j, n: (i, 0, j, 0)),
            pl.BlockSpec((1, sk, 1, d), lambda i, j, n: (i, 0, j, 0)),
            pl.BlockSpec((1, block_q, 1, d), lambda i, j, n: (i, n, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j, n: (i, j, n)),
            pl.BlockSpec((1, 1, block_q), lambda i, j, n: (i, j, n)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 1, d), lambda i, j, n: (i, n, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, h, d), q.dtype),
        interpret=_interpret(),
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q, sq=sq),
        grid=(b, h, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, sq, 1, d), lambda i, j, n: (i, 0, j, 0)),
            pl.BlockSpec((1, block_k, 1, d), lambda i, j, n: (i, n, j, 0)),
            pl.BlockSpec((1, block_k, 1, d), lambda i, j, n: (i, n, j, 0)),
            pl.BlockSpec((1, sq, 1, d), lambda i, j, n: (i, 0, j, 0)),
            pl.BlockSpec((1, 1, sq), lambda i, j, n: (i, j, 0)),
            pl.BlockSpec((1, 1, sq), lambda i, j, n: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, 1, d), lambda i, j, n: (i, n, j, 0)),
            pl.BlockSpec((1, block_k, 1, d), lambda i, j, n: (i, n, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk, h, d), k.dtype),
            jax.ShapeDtypeStruct((b, sk, h, d), v.dtype),
        ],
        interpret=_interpret(),
    )(q, k, v, g, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def xla_attention(q, k, v, scale, layout="bhsd"):
    """Reference attention: fp32 logits+softmax (ATTN_PRECISION=fp32 path,
    ldm/modules/attention.py:173-179), bf16 PV matmul."""
    if layout == "bshd":
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
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
        return jax.default_backend() not in ("cpu",) and pltpu is not None
    except Exception:  # pragma: no cover
        return False


def flash_attention(q, k, v, scale=None):
    """Direct flash entry on [B, H, S, D] (interpret mode off-TPU) — tests."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    bshd = lambda t: t.transpose(0, 2, 1, 3)
    return bshd(_flash_attention(bshd(q), bshd(k), bshd(v), scale))


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: bool = True,
    layout: str = "bhsd",
) -> jnp.ndarray:
    """Multi-head attention, unmasked. layout='bhsd' takes [B, H, S, D];
    layout='bshd' takes [B, S, H, D] — the models' native layout, which the
    Pallas kernels consume directly (no transposes materialized).

    Dispatches to the flash kernels when on TPU and the sequence geometry
    tiles cleanly; otherwise the fp32-softmax XLA path.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s_axis = 1 if layout == "bshd" else 2
    sq, sk = q.shape[s_axis], k.shape[s_axis]
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
        if layout == "bshd":
            return _flash_attention(q, k, v, scale)
        bshd = lambda t: t.transpose(0, 2, 1, 3)
        return bshd(_flash_attention(bshd(q), bshd(k), bshd(v), scale))
    return xla_attention(q, k, v, scale, layout=layout)
