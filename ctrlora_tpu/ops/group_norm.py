"""Pallas TPU fused GroupNorm (+ optional SiLU).

The UNet/ControlNet/VAE spend ~17% of sampling time in XLA's
convert+reduce fusions for fp32 GroupNorm stats plus separate
normalize/SiLU passes (profile in README "Benchmarks"). This kernel pair
does it in two passes over bf16 data with fp32 accumulation:

  pass 1 (stats):  per-channel sum / sum-of-squares -> [B, C] fp32
  (tiny XLA)       group-reduce -> per-channel a = g*rsqrt(var+eps),
                   b = beta - mean*a   (per-group stats broadcast back)
  pass 2 (apply):  y = silu(x*a + b)  (one read + one write, bf16 out)

Channel counts in the real models are multiples of 32 with C as the lane
dim, so both kernels are pure lane-wise VPU work; the awkward per-group
(C/32-channel) reduction happens in the tiny [B, C] XLA epilogue instead
of inside the kernel. Falls back to plain jnp math off-TPU or for shapes
the blocks can't tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # [blk, C]
    s = jnp.sum(x, axis=0, keepdims=True)
    q = jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        sum_ref[0] = s
        sq_ref[0] = q

    @pl.when(i > 0)
    def _acc():
        sum_ref[0] += s
        sq_ref[0] += q


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, silu):
    x = x_ref[0].astype(jnp.float32)
    y = x * a_ref[0] + b_ref[0]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


# cap block elements so the kernel's VMEM stack (bf16 in/out + fp32
# convert + fp32 square) stays well under the 16MB scoped limit: at 2^17
# elements the fp32 temporaries are 512KB each (VAE encoder blocks at
# 512^2 / C=512 OOMed with unbounded blocks)
_MAX_BLOCK_ELEMS = 1 << 17


def _pick_hw_block(hw: int, c: int) -> Optional[int]:
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= hw and hw % cand == 0 and cand * c <= _MAX_BLOCK_ELEMS:
            return cand
    return None


def _on_tpu() -> bool:
    from ctrlora_tpu.utils.platform import on_tpu

    return on_tpu()


def fused_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    interpret: Optional[bool] = None,
    add_row: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GroupNorm over NHWC (torch semantics, fp32 stats) with optional fused
    SiLU. x [B, H, W, C] (or [B, S, C]); scale/bias [C] fp32.

    add_row [C] / [1, C] / [B, C]: compute GN(x + row) WITHOUT materializing
    x + row. A per-channel add with a loop-varying operand costs a separate
    full-tensor HBM pass per ResBlock inside the DDIM scan (~22.6 ms/step
    across the ~35 blocks, perf/step_glue2.py bisect — loop-invariant rows
    fold into the conv and are free, varying ones do not). Folding the row
    into the [B, C] stats epilogue instead is exact:
      sum'_c  = sum_c + HW*row_c
      sumsq'_c = sumsq_c + 2 row_c sum_c + HW row_c^2
      y = (x + row - mean') inv' s + b = x*a + (b + (row - mean')*a)
    so both Pallas passes run unchanged on the original x."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    xf = x.reshape(b, hw, c)
    blk = _pick_hw_block(hw, c)
    if interpret is None:
        interpret = not _on_tpu()

    xsum, xsq = pl.pallas_call(
        _stats_kernel,
        grid=(b, hw // blk),
        in_specs=[pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(xf)

    # tiny epilogue: per-group moments -> per-channel affine
    row = None
    if add_row is not None:
        row = add_row.astype(jnp.float32).reshape(-1, c)[:, None]  # [B|1,1,C]
        xsq = xsq + 2.0 * row * xsum + hw * row * row
        xsum = xsum + hw * row
    n = hw * (c // num_groups)
    gsum = xsum.reshape(b, num_groups, c // num_groups).sum(-1)
    gsq = xsq.reshape(b, num_groups, c // num_groups).sum(-1)
    mean = gsum / n
    var = gsq / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // num_groups, axis=-1)  # [B, C]
    inv_c = jnp.repeat(inv, c // num_groups, axis=-1)
    a = inv_c * scale[None].astype(jnp.float32)
    bb = bias[None].astype(jnp.float32) - mean_c * a
    if row is not None:
        bb = bb + row[:, 0] * a

    out = pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        grid=(b, hw // blk),
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(xf, a[:, None], bb[:, None])
    return out.reshape(orig_shape)


def group_norm_ok(x: jnp.ndarray, num_groups: int) -> bool:
    """Whether the fused path can handle this shape on this backend.
    CTRLORA_KERNELS=fused_gn=0 force-disables; fused_gn=1 forces interpret
    mode off-TPU (CPU parity tests)."""
    from ctrlora_tpu.ops.kernel_flags import flags

    forced = flags().fused_group_norm
    if forced is False:
        return False
    if forced is None and not _on_tpu():
        return False
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    return x.ndim >= 3 and c % num_groups == 0 and _pick_hw_block(hw, c) is not None


def _plain_group_norm(x, scale, bias, num_groups, eps, silu, add_row=None):
    """Reference jnp math (fp32), used for the custom-vjp backward."""
    b, c = x.shape[0], x.shape[-1]
    out_dtype = x.dtype
    if add_row is not None:
        row = add_row.astype(jnp.float32).reshape(-1, c)
        row = row.reshape(row.shape[0], *([1] * (x.ndim - 2)), c)
        x = x.astype(jnp.float32) + row
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = xf.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def group_norm(x, scale, bias, add_row=None, num_groups: int = 32,
               eps: float = 1e-5, silu: bool = False):
    """Differentiable fused GroupNorm(+SiLU) of (x + add_row): Pallas
    forward, jnp-math backward (the kernels have no transpose rule; the
    backward recompute costs the same as the plain implementation's)."""
    return fused_group_norm(x, scale, bias, num_groups, eps, silu,
                            add_row=add_row)


def _gn_fwd(x, scale, bias, add_row, num_groups, eps, silu):
    out = fused_group_norm(x, scale, bias, num_groups, eps, silu,
                           add_row=add_row)
    return out, (x, scale, bias, add_row)


def _gn_bwd(num_groups, eps, silu, res, g):
    x, scale, bias, add_row = res
    if add_row is None:
        _, vjp = jax.vjp(
            lambda xx, ss, bb: _plain_group_norm(
                xx, ss, bb, num_groups, eps, silu
            ),
            x, scale, bias,
        )
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda xx, ss, bb, rr: _plain_group_norm(
            xx, ss, bb, num_groups, eps, silu, rr
        ),
        x, scale, bias, add_row,
    )
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)
