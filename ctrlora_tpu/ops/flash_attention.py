"""Pallas TPU flash attention (forward) with an XLA-recompute backward.

Replaces the reference's three memory strategies — sliced attention
(cldm/hack.py:72-111), xformers memory-efficient attention
(ldm/modules/attention.py:197-243) and plain O(S^2) softmax — with a single
online-softmax kernel that never materializes the [Sq, Sk] logits in HBM.

Shapes: q [B, H, Sq, D], k/v [B, H, Sk, D], unmasked full attention (SD's
spatial self-attention is unmasked). D may be non-128-aligned (SD1.5 uses
head dims 40/80/160); Mosaic pads lanes transparently.

The backward pass recomputes attention with the XLA path and differentiates
that — exact same math, so gradients are correct; a fused Pallas backward is
a later optimization.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, sk: int):
    """One (batch*head, q-block) program: online softmax over k chunks."""
    q = q_ref[0].astype(jnp.float32) * scale  # [bq, D]
    bq = q.shape[0]
    d = q.shape[1]
    num_k = sk // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # [bk, D]
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(size: int, preferred: int = 512) -> Optional[int]:
    """Largest power-of-two-ish divisor of `size` that is <= preferred and >= 128."""
    for cand in (preferred, 256, 128):
        if cand <= size and size % cand == 0:
            return cand
    return None


def _flash_forward(q, k, v, scale):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = _pick_block(sq)
    block_k = _pick_block(sk)
    assert block_q is not None and block_k is not None
    g = b * h
    qf = q.reshape(g, sq, d)
    kf = k.reshape(g, sk, d)
    vf = v.reshape(g, sk, d)
    grid = (g, sq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, sk=sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((g, sq, d), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d)


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
    return _flash_forward(q, k, v, scale)


def _flash_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",) and pltpu is not None
    except Exception:  # pragma: no cover
        return False


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Multi-head attention over [B, H, S, D] tensors, unmasked.

    Dispatches to the Pallas flash kernel when on TPU and the sequence
    geometry tiles cleanly; otherwise the fp32-softmax XLA path.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    sq, sk = q.shape[2], k.shape[2]
    flash_ok = (
        use_flash
        and _on_tpu()
        and sk >= 256
        and _pick_block(sq) is not None
        and _pick_block(sk) is not None
    )
    if flash_ok:
        return _flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
