"""Pallas TPU fused GEGLU feed-forward: (x @ W1 + b1) -> split -> a * gelu(g)
-> (@ W2 + b2), all in VMEM.

Why: the transformer FFN at SD's 64x64 sites materializes an
[8, 4096, 2560] bf16 intermediate (168 MB) in HBM between the up-projection
and the gate+down-projection; the profiled down-proj fusion reads it back at
only ~280 GiB/s of the chip's 819 GB/s (hlo_stats 2026-08-17: the
add_add_fusion.6x family, ~0.7 ms/step/site HBM-bound, on top of the
~0.5 ms up-proj). This kernel streams row blocks of x instead: HBM traffic
drops from ~3 passes over the 2F-wide tensor to one read of x and one write
of the output, and both matmuls run back-to-back on MXU-friendly shapes
(K = C and K = F, both >= 320).

Semantics match models/attention.py::FeedForward (reference:
ldm/modules/attention.py:48-75, glu=True): exact (erf) GELU on the second
half of the up-projection. Weights are the flax Dense params used by the
jnp path, so checkpoints are unaffected.

Differentiable via a recompute-based custom VJP (same scheme as
ops/group_norm.py): Pallas forward, jnp-reference backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu resolves wherever Mosaic is built (needed for VMEM scratch)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ctrlora_tpu.ops.kernel_flags import flags


def _mxu_dtype(x) -> jnp.dtype:
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (max abs error 1.5e-7) —
    Mosaic has no erf lowering; this stays elementwise so it fuses into the
    gate pass. fp32 in/out."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _geglu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, f, split):
    """split=1: straight up -> gelu -> down. split>1: software pipeline over
    `split` row sub-blocks — the profiled kernel runs at ~58% MFU because
    the VPU gelu pass serializes between the two MXU matmuls (hlo_stats
    2026-08-18: ff.* 0.7 ms/site vs ~0.41 ms matmul floor at the 64x64
    site). Issuing sub-block j+1's up-projection (MXU) BEFORE sub-block j's
    gelu (VPU) lets the in-order issue stream keep the VPU busy while the
    MXU crunches; per-element math is unchanged, so outputs stay
    bit-identical to split=1."""
    mxu = w1_ref.dtype

    def up(lo, n):  # [n, 2F] in compute dtype
        x = x_ref[pl.dslice(lo, n), :].astype(mxu)
        # fp32-accumulated dot cast to the compute dtype — identical
        # rounding to the jnp path's bf16 dot (XLA accumulates bf16 dots in
        # fp32 too)
        return (jax.lax.dot_general(
            x, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)).astype(mxu)

    def gate_down(lo, n, h):
        a, g = h[:, :f], h[:, f:].astype(jnp.float32)
        # exact-form GELU matching nn.gelu(approximate=False) via the A&S
        # erf polynomial (1.5e-7 — far below bf16 resolution)
        gated = a * (0.5 * g * (1.0 + _erf(g * (2.0 ** -0.5)))).astype(mxu)
        out = jax.lax.dot_general(
            gated, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[...].astype(jnp.float32)
        o_ref[pl.dslice(lo, n), :] = out.astype(o_ref.dtype)

    bs = x_ref.shape[0]
    sub = bs // split
    h_cur = up(0, sub)
    for j in range(split):
        h_next = up((j + 1) * sub, sub) if j + 1 < split else None
        gate_down(j * sub, sub, h_cur)
        h_cur = h_next


def _vmem_est(bs: int, c: int, f: int, isz: int) -> int:
    """Resident estimate: weights, x/out blocks, the [bs, 2F] up-projection
    at compute width, the fp32 gelu temp and the gated block."""
    est = isz * c * 2 * f + isz * f * c  # W1 + W2
    est += (isz + isz) * bs * c  # x block + out block
    est += isz * bs * 2 * f  # h (compute dtype)
    est += (4 + isz) * bs * f  # fp32 gelu temp + gated
    return est


_VMEM_LIMIT = int(14.5 * (1 << 20))


def _pick_rows(rows: int, c: int, f: int, isz: int) -> Optional[int]:
    for bs in (512, 256, 128):
        if rows % bs == 0 and _vmem_est(bs, c, f, isz) <= _VMEM_LIMIT:
            return bs
    return None


def _geglu_kernel_blocked(x_ref, w1a_ref, w1g_ref, b1a_ref, b1g_ref, w2_ref,
                          b2_ref, o_ref, acc_ref, *, nf):
    """F-blocked variant for widths whose weights exceed VMEM (the 16^2/8^2
    sites: C=1280, F=5120 — W1+W2 are 39 MB bf16, the resident kernel can't
    hold them). The grid's second axis streams F in fb-wide slices: the
    gate pair (a_j, g_j) needs only the matching W1 column block of each
    half, and the down-projection accumulates partial [bs, C] products in
    an fp32 scratch across j. Per-element math matches _geglu_kernel; only
    the fp32 accumulation order of the second dot differs (reassociation,
    not a formula change). XLA leaves ~0.47 MFU on these sites: the
    hlo_stats add_add_fusion.7x family is 102 ms/batch HBM-bound on the
    [8, 256, 5120] intermediate this kernel never materializes."""
    j = pl.program_id(1)
    mxu = w2_ref.dtype
    x = x_ref[...].astype(mxu)
    a = (jax.lax.dot_general(
        x, w1a_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1a_ref[...].astype(jnp.float32)).astype(mxu)
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1g_ref[...].astype(jnp.float32)
    gated = a * (0.5 * g * (1.0 + _erf(g * (2.0 ** -0.5)))).astype(mxu)
    part = jax.lax.dot_general(
        gated, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part + b2_ref[...].astype(jnp.float32)

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == nf - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _vmem_est_blocked(bs: int, c: int, fb: int, isz: int) -> int:
    est = isz * c * 2 * fb + isz * fb * c  # W1a+W1g blocks + W2 block
    est += (isz + isz) * bs * c  # x block + out block
    est += 4 * bs * c  # fp32 accumulator scratch
    est += (4 + isz) * bs * fb * 2  # a/g fp32 dots + casts
    est += isz * bs * fb  # gated block
    return est


def _pick_blocked(rows: int, c: int, f: int, isz: int):
    for bs in (512, 256, 128):
        if rows % bs:
            continue
        for fb in (512, 256):
            if f % fb == 0 and _vmem_est_blocked(bs, c, fb, isz) <= _VMEM_LIMIT:
                return bs, fb
    return None


def _reference(x, w1, b1, w2, b2):
    """jnp math identical to the FeedForward Dense path (fp32 dots when the
    inputs are fp32; bf16 inputs follow the module's compute dtype)."""
    h = jnp.dot(x, w1.astype(x.dtype)) + b1.astype(x.dtype)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(h, w2.astype(x.dtype)) + b2.astype(x.dtype)


def geglu_ffn_ok(x: jnp.ndarray, w1: jnp.ndarray) -> bool:
    # Default-on ON TPU since the 2026-08-18 ledger A/B: 4.40 vs 4.59
    # s/batch (-4.3% end-to-end) with bit-identical sampling checksums.
    # CTRLORA_KERNELS=geglu=0 force-disables for same-session comparisons;
    # geglu=1 forces the kernel even off-TPU (interpret mode — CPU parity
    # tests). The default gates on the same on-TPU check as the flash
    # kernels (accelerator backend AND pltpu importable): a non-TPU
    # accelerator would otherwise take an untested Mosaic lowering.
    forced = flags().geglu_ffn
    if forced is False:
        return False
    if forced is None:
        from ctrlora_tpu.utils.platform import on_tpu

        if not on_tpu():
            return False
    c, f2 = w1.shape
    f = f2 // 2
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    isz = jnp.dtype(_mxu_dtype(x)).itemsize
    if x.shape[-1] != c or f2 != 2 * f:
        return False
    if _pick_rows(rows, c, f, isz) is not None:
        return True
    # wide sites (C=1280, F=5120): the f-blocked kernel. Default ON since
    # its on-chip A/B win (ledger 2026-08-19: 4.036 vs 4.090 s/batch,
    # bit-identical checksums); CTRLORA_KERNELS=gblocked=0 restores the
    # XLA fallback (needs pltpu for VMEM scratch)
    return (flags().geglu_blocked is not False
            and pltpu is not None
            and _pick_blocked(rows, c, f, isz) is not None)


def geglu_shapes_ok(x, w1, b1, w2, b2) -> bool:
    """Full-signature check: the kernel hard-codes out width = x width, so
    a w2 wider than C would be silently truncated without this guard."""
    c, f2 = w1.shape
    f = f2 // 2
    return (
        geglu_ffn_ok(x, w1)
        and b1.shape == (2 * f,)
        and w2.shape == (f, c)
        and b2.shape == (c,)
    )


def _interpret() -> bool:
    from ctrlora_tpu.utils.platform import pallas_interpret

    return pallas_interpret()


def _forward(x, w1, b1, w2, b2):
    orig_shape = x.shape
    c = x.shape[-1]
    f = w1.shape[1] // 2
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    mxu = _mxu_dtype(x)
    isz = jnp.dtype(mxu).itemsize
    bs = _pick_rows(rows, c, f, isz)
    if bs is None:
        bsfb = _pick_blocked(rows, c, f, isz)
        assert bsfb is not None, "geglu_ffn_ok must gate this call"
        return _forward_blocked(x, w1, b1, w2, b2, *bsfb)
    xf = x.reshape(rows, c)
    split = flags().geglu_split or (2 if bs >= 256 else 1)
    if bs % split:
        split = 1
    out = pl.pallas_call(
        functools.partial(_geglu_kernel, f=f, split=split),
        grid=(rows // bs,),
        in_specs=[
            pl.BlockSpec((bs, c), lambda i: (i, 0)),
            pl.BlockSpec((c, 2 * f), lambda i: (0, 0)),
            pl.BlockSpec((2 * f,), lambda i: (0,)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bs, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        interpret=_interpret(),
    )(xf, w1.astype(mxu), b1.astype(mxu), w2.astype(mxu), b2.astype(mxu))
    return out.reshape(orig_shape)


def _forward_blocked(x, w1, b1, w2, b2, bs, fb):
    orig_shape = x.shape
    c = x.shape[-1]
    f = w1.shape[1] // 2
    nf = f // fb
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    mxu = _mxu_dtype(x)
    xf = x.reshape(rows, c)
    out = pl.pallas_call(
        functools.partial(_geglu_kernel_blocked, nf=nf),
        grid=(rows // bs, nf),
        in_specs=[
            pl.BlockSpec((bs, c), lambda i, j: (i, 0)),
            pl.BlockSpec((c, fb), lambda i, j: (0, j)),          # W1[:, :f] slice j
            pl.BlockSpec((c, fb), lambda i, j: (0, nf + j)),     # W1[:, f:] slice j
            # biases ship as [1, N] 2-D: Mosaic requires T(512)(128) tiling
            # for big 1-D bf16 operands but XLA assigns b1 [10240]
            # T(1024)(128) in the full graph — 2-D rows sidestep the layout
            # verifier mismatch (on-chip failure, 2026-08-19)
            pl.BlockSpec((1, fb), lambda i, j: (0, j)),
            pl.BlockSpec((1, fb), lambda i, j: (0, nf + j)),
            pl.BlockSpec((fb, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bs, c), jnp.float32)]
        if pltpu is not None else [],
        interpret=_interpret(),
    )(xf, w1.astype(mxu), w1.astype(mxu), b1.astype(mxu).reshape(1, -1),
      b1.astype(mxu).reshape(1, -1), w2.astype(mxu),
      b2.astype(mxu).reshape(1, -1))
    return out.reshape(orig_shape)


@jax.custom_vjp
def geglu_ffn(x, w1, b1, w2, b2):
    """Fused GEGLU FFN; w1 [C, 2F], b1 [2F], w2 [F, C], b2 [C]."""
    return _forward(x, w1, b1, w2, b2)


def _ffn_fwd(x, w1, b1, w2, b2):
    return _forward(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ffn_bwd(res, g):
    _, vjp = jax.vjp(_reference, *res)
    return vjp(g)


geglu_ffn.defvjp(_ffn_fwd, _ffn_bwd)
