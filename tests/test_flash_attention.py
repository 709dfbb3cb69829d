"""Flash attention forward+backward vs the XLA reference (interpret mode on
CPU; the same kernels compile on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlora_tpu.ops.flash_attention import flash_attention, xla_attention


SHAPES = [
    (1, 2, 256, 40, 256),   # SD self-attn head dim
    (1, 1, 128, 64, 384),   # rectangular q/k
    (2, 2, 256, 16, 128),
]


@pytest.mark.parametrize("b,h,sq,d,sk", SHAPES)
def test_forward_matches_xla(b, h, sq, d, sk):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d))
    k = jax.random.normal(ks[1], (b, h, sk, d))
    v = jax.random.normal(ks[2], (b, h, sk, d))
    out = flash_attention(q, k, v)
    ref = xla_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_backward_matches_xla():
    b, h, sq, d, sk = 1, 2, 256, 32, 256
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, sq, d))
    k = jax.random.normal(ks[1], (b, h, sk, d))
    v = jax.random.normal(ks[2], (b, h, sk, d))
    ct = jax.random.normal(ks[3], (b, h, sq, d))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * ct)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, d**-0.5) * ct)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3)


def test_backward_bf16_stable():
    b, h, sq, d, sk = 1, 1, 256, 40, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, sk, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, sk, d), jnp.bfloat16)

    g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v).astype(jnp.float32)))(q)
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_single_sweep_vmem_budget_decisions():
    """The itemized estimate must keep the on-chip-validated single sweep at
    SD's dominant shape (shrinking block_q to fit) and must reject the
    VAE's d=512 single-head case, which compiled DEGRADED inside big graphs
    when taken (perf/ledger.json)."""
    from ctrlora_tpu.ops.flash_attention import (
        _SINGLE_SWEEP_LIMIT, _single_sweep_vmem,
    )

    # SD 64x64 self-attention: [*, *, 4096, 40], bf16 in / bf16 MXU — the
    # cast-p block pushes block_q=512 over budget; the selector's fallback
    # block_q=256 must fit
    assert _single_sweep_vmem(512, 4096, 40, 2, 2) > _SINGLE_SWEEP_LIMIT
    assert _single_sweep_vmem(256, 4096, 40, 2, 2) <= _SINGLE_SWEEP_LIMIT
    # fp32 in / fp32 MXU at the same shape: fits at block_q=256
    assert _single_sweep_vmem(256, 4096, 40, 4, 4) <= _SINGLE_SWEEP_LIMIT
    # the VAE bottleneck attention (single head, d=512) must never sweep
    for bq in (512, 256, 128):
        assert _single_sweep_vmem(bq, 4096, 512, 2, 2) > _SINGLE_SWEEP_LIMIT
        assert _single_sweep_vmem(bq, 4096, 512, 4, 4) > _SINGLE_SWEEP_LIMIT
    # the 32x32 level [*, *, 1024, 80] easily sweeps in every dtype
    assert _single_sweep_vmem(512, 1024, 80, 2, 2) <= _SINGLE_SWEEP_LIMIT
    assert _single_sweep_vmem(512, 1024, 80, 4, 4) <= _SINGLE_SWEEP_LIMIT


def test_forward_bf16_mxu_matches_fp32_reference():
    """bf16 MXU operands (the default for bf16 inputs) must track the fp32
    reference within bf16 rounding."""
    b, h, sq, d, sk = 1, 2, 512, 40, 512
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    qf = jax.random.normal(ks[0], (b, h, sq, d))
    kf = jax.random.normal(ks[1], (b, h, sk, d))
    vf = jax.random.normal(ks[2], (b, h, sk, d))
    out = flash_attention(
        qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
    )
    ref = xla_attention(qf, kf, vf, d**-0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_forward_safemax_matches_default():
    """Softmax is shift-invariant for any constant: the default single-sweep
    (clamped exp2, no per-row max subtraction) must agree with the exact
    max-guarded kernel (CTRLORA_KERNELS=safemax)."""
    from ctrlora_tpu.ops.kernel_flags import override

    b, h, sq, d, sk = 1, 2, 256, 40, 256
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d))
    k = jax.random.normal(ks[1], (b, h, sk, d))
    v = jax.random.normal(ks[2], (b, h, sk, d))
    out = flash_attention(q, k, v)
    ref = xla_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    with override(safemax=True):
        guarded = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(guarded),
                               atol=2e-5, rtol=1e-4)


def test_forward_huge_logits_stay_finite():
    """The clamped-exp2 default must degrade gracefully (finite output, no
    NaN) even for logits far beyond SD's observed range."""
    b, h, sq, d, sk = 1, 1, 256, 40, 256
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = 60.0 * jax.random.normal(ks[0], (b, h, sq, d))
    k = 60.0 * jax.random.normal(ks[1], (b, h, sk, d))
    v = jax.random.normal(ks[2], (b, h, sk, d))
    out = flash_attention(q, k, v)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name,ov", [
    ("apipe", {"attn_pipe": True}),
    ("noclamp", {"attn_clamp": False}),
    ("hpack2", {"head_pack": 2}),
])
def test_forward_bshd_variant_knobs_match_default(name, ov):
    """Round-5 perf knobs on the hd-packed forward (head-loop software
    pipeline, clamp drop, block-diagonal head-pair packing) are pure
    schedule/layout changes — outputs must be bit-identical to the default
    packed kernel for in-range logits."""
    from ctrlora_tpu.ops.flash_attention import dot_product_attention_bshd
    from ctrlora_tpu.ops.kernel_flags import override

    b, s, h, d = 2, 256, 4, 40
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    base = dot_product_attention_bshd(q, k, v)
    with override(**ov):
        out = dot_product_attention_bshd(q, k, v)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_forward_bshd_matches_xla():
    """BSHD entry (natural projection layout, no BHSD transpose) must match
    the XLA reference; exercises the singleton-head-dim BlockSpec indexing
    in interpret mode."""
    from ctrlora_tpu.ops.flash_attention import _flash_attention_bshd

    b, sq, h, d, sk = 2, 256, 3, 40, 512
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d))
    k = jax.random.normal(ks[1], (b, sk, h, d))
    v = jax.random.normal(ks[2], (b, sk, h, d))
    out = _flash_attention_bshd(q, k, v, d**-0.5)
    tr = lambda t: t.transpose(0, 2, 1, 3)
    ref = tr(xla_attention(tr(q), tr(k), tr(v), d**-0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_backward_bshd_matches_xla():
    from ctrlora_tpu.ops.flash_attention import _flash_attention_bshd

    b, sq, h, d, sk = 1, 256, 2, 32, 256
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    q = jax.random.normal(ks[0], (b, sq, h, d))
    k = jax.random.normal(ks[1], (b, sk, h, d))
    v = jax.random.normal(ks[2], (b, sk, h, d))
    ct = jax.random.normal(ks[3], (b, sq, h, d))
    tr = lambda t: t.transpose(0, 2, 1, 3)

    gf = jax.grad(
        lambda q, k, v: jnp.sum(_flash_attention_bshd(q, k, v, d**-0.5) * ct),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(tr(xla_attention(tr(q), tr(k), tr(v), d**-0.5)) * ct),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3)


def test_cross_attention_module_layouts_match():
    """The module-level default (hd-packed BSHD layout) must be
    output-identical to the CTRLORA_KERNELS=bhsd transpose path (same
    params, same math, CPU fallback)."""
    from ctrlora_tpu.models.attention import CrossAttention
    from ctrlora_tpu.ops.kernel_flags import flags, override

    assert flags().attn_layout == "bshd"  # ledger winner is the default
    mod = CrossAttention(query_dim=64, heads=4, dim_head=16)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 256, 64))
    params = mod.init(jax.random.PRNGKey(8), x)["params"]
    out = mod.apply({"params": params}, x)
    with override(attn_layout="bhsd"):
        ref = mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_kernel_flags_env_parse(monkeypatch):
    """CTRLORA_KERNELS is the single env escape hatch; malformed tokens must
    warn and be ignored, never raise (ADVICE r3: PACKED_BQ=0 used to
    ZeroDivisionError at trace time)."""
    from ctrlora_tpu.ops import kernel_flags

    monkeypatch.setenv(
        "CTRLORA_KERNELS", "noflash,safemax,bq=256,geglu=0,fused_gn=1"
    )
    fl = kernel_flags.flags()
    assert not fl.use_flash and fl.safemax and fl.block_q == 256
    assert fl.geglu_ffn is False and fl.fused_group_norm is True

    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        monkeypatch.setenv("CTRLORA_KERNELS", "packed_bq=0,bq=abc,frobnicate")
        fl = kernel_flags.flags()
    assert fl == kernel_flags.KernelFlags()  # all malformed -> defaults
    assert len(w) == 3

    monkeypatch.setenv("CTRLORA_KERNELS", "")
    assert kernel_flags.flags() == kernel_flags.KernelFlags()
    # programmatic overrides stack on the env base and validate field names
    with kernel_flags.override(attn_layout="bhsd"):
        assert kernel_flags.flags().attn_layout == "bhsd"
    assert kernel_flags.flags().attn_layout == "bshd"
    with pytest.raises(TypeError):
        kernel_flags.set_flags(not_a_flag=1)


def test_forward_qkv_packed_matches_xla():
    """The fused-projection entry (_flash_attention_qkv: one [B,S,3HD]
    operand, lane offsets 0/HD/2HD) must match the XLA reference."""
    from ctrlora_tpu.ops.flash_attention import _flash_attention_qkv

    b, s, h, d = 2, 256, 3, 40
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, s, h * d))
    k = jax.random.normal(ks[1], (b, s, h * d))
    v = jax.random.normal(ks[2], (b, s, h * d))
    qkv = jnp.concatenate([q, k, v], axis=-1)
    out = _flash_attention_qkv(qkv, h, d, d**-0.5)
    tr = lambda t: t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    ref = xla_attention(tr(q), tr(k), tr(v), d**-0.5)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_backward_qkv_packed_matches_xla():
    from ctrlora_tpu.ops.flash_attention import _flash_attention_qkv

    b, s, h, d = 1, 256, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(12), 2)
    qkv = jax.random.normal(ks[0], (b, s, 3 * h * d))
    ct = jax.random.normal(ks[1], (b, s, h * d))
    tr = lambda t: t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def ref_fn(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = xla_attention(tr(q), tr(k), tr(v), d**-0.5)
        return jnp.sum(o.transpose(0, 2, 1, 3).reshape(b, s, h * d) * ct)

    gf = jax.grad(lambda t: jnp.sum(_flash_attention_qkv(t, h, d, d**-0.5) * ct))(qkv)
    gr = jax.grad(ref_fn)(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=5e-5, rtol=1e-3)


def test_cross_attention_module_qkv_packed_matches_default():
    """Module-level: CTRLORA_KERNELS=qkvpack must be output-identical to
    the split default (same params; CPU falls back through the same split
    so this pins the wiring + the fallback chain)."""
    from ctrlora_tpu.models.attention import CrossAttention
    from ctrlora_tpu.ops.kernel_flags import override

    mod = CrossAttention(query_dim=64, heads=4, dim_head=16)
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 256, 64))
    params = mod.init(jax.random.PRNGKey(14), x)["params"]
    out = mod.apply({"params": params}, x)
    with override(attn_qkv_packed=True):
        packed = mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(out),
                               atol=1e-5, rtol=1e-5)
