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


def _onepass_kernel(x_ref, scale_ref, bias_ref, row_ref, o_ref, *, silu,
                    num_groups, eps, strip, has_row):
    """Single-pass GroupNorm(+SiLU): the whole [hw, c] sample sits in VMEM,
    so x is read from HBM once (stats) and written once (apply) — 2x tensor
    traffic, the bandwidth floor — instead of the two-kernel path's 3x
    (stats read + apply read + write). Strip-mined so the fp32 temporaries
    stay small; the per-group reduction that the two-pass design pushed to
    an XLA epilogue runs in-kernel as two tiny matmuls against a [c, G]
    group-indicator matrix (no lane-dim reshapes)."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cpg = c // num_groups

    def stats_body(i, carry):
        s, q = carry
        xs = x_ref[0, pl.ds(i * strip, strip), :].astype(jnp.float32)
        return (s + jnp.sum(xs, axis=0, keepdims=True),
                q + jnp.sum(xs * xs, axis=0, keepdims=True))

    zero = jnp.zeros((1, c), jnp.float32)
    s, q = jax.lax.fori_loop(0, hw // strip, stats_body, (zero, zero))
    if has_row:
        row = row_ref[0]  # [1, c] fp32
        # GN(x + row) from moments of x (see fused_group_norm docstring)
        q = q + 2.0 * row * s + hw * row * row
        s = s + hw * row
    # group-indicator matmuls: [1,c]@[c,G] sums each contiguous channel
    # group; @[G,c] broadcasts the per-group stat back per channel
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    m = (ch // cpg == gr).astype(jnp.float32)  # [c, G]
    n = hw * cpg
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    mean_c = dot(dot(s, m) / n, m.T)  # [1, c], constant within each group
    msq_c = dot(dot(q, m) / n, m.T)
    inv_c = jax.lax.rsqrt(msq_c - mean_c * mean_c + eps)
    a = inv_c * scale_ref[0]
    bb = bias_ref[0] - mean_c * a
    if has_row:
        bb = bb + row_ref[0] * a

    def apply_body(i, _):
        xs = x_ref[0, pl.ds(i * strip, strip), :].astype(jnp.float32)
        y = xs * a + bb
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * strip, strip), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hw // strip, apply_body, 0)


# cap block elements so the kernel's VMEM stack (bf16 in/out + fp32
# convert + fp32 square) stays well under the 16MB scoped limit: at 2^17
# elements the fp32 temporaries are 512KB each (VAE encoder blocks at
# 512^2 / C=512 OOMed with unbounded blocks)
_MAX_BLOCK_ELEMS = 1 << 17

# one-pass eligibility: the whole [hw, c] sample (in + out blocks) must sit
# in VMEM next to the fp32 strip temporaries. 3MB covers every UNet site
# (64^2 x 320 = 2.5MB the largest); the VAE's 512^2/256^2 decoder tensors
# stay on the two-pass path
_ONEPASS_MAX_BYTES = 3 * 1024 * 1024
# lower bound (elements): the one-pass win is per-instance overhead
# amortization; below this the two small kernels beat one serial one
# (on-chip microbench 2026-08-19). Tests monkeypatch this to 0 to exercise
# the kernel on small interpret-mode shapes.
_ONEPASS_MIN_ELEMS = 1 << 19


def _pick_hw_block(hw: int, c: int) -> Optional[int]:
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= hw and hw % cand == 0 and cand * c <= _MAX_BLOCK_ELEMS:
            return cand
    return None


def _onepass_ok(hw: int, c: int, dtype, num_groups: int) -> bool:
    from ctrlora_tpu.ops.kernel_flags import flags

    forced = flags().gn_onepass
    if forced is False:
        return False
    if forced is None:
        forced = False  # default pending its end-to-end A/B (gn1=1 enables)
    return (forced
            and hw * c >= _ONEPASS_MIN_ELEMS
            and hw * c * jnp.dtype(dtype).itemsize <= _ONEPASS_MAX_BYTES
            and c % num_groups == 0
            and _pick_hw_block(hw, c) is not None)


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

    if _onepass_ok(hw, c, x.dtype, num_groups):
        has_row = add_row is not None
        if has_row:
            row = add_row.astype(jnp.float32).reshape(-1, 1, c)
            rb = row.shape[0]  # 1 (shared) or b (per-sample)
        else:
            row = jnp.zeros((1, 1, c), jnp.float32)
            rb = 1
        out = pl.pallas_call(
            functools.partial(
                _onepass_kernel, silu=silu, num_groups=num_groups, eps=eps,
                strip=blk, has_row=has_row,
            ),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, 1, c),
                             (lambda i: (i, 0, 0)) if rb > 1
                             else (lambda i: (0, 0, 0))),
            ],
            out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
            interpret=interpret,
        )(xf, scale[None].astype(jnp.float32),
          bias[None].astype(jnp.float32), row)
        return out.reshape(orig_shape)

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
