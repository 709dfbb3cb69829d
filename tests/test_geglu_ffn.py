"""Fused GEGLU FFN kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlora_tpu.ops.geglu_ffn import (
    _VMEM_LIMIT, _pick_rows, _reference, _vmem_est, geglu_ffn, geglu_ffn_ok,
)


def _make(rows, c, mult=4, dtype=jnp.float32, seed=0):
    f = c * mult
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (2, rows // 2, c), dtype)
    w1 = jax.random.normal(ks[1], (c, 2 * f), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (2 * f,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (f, c), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
    return x, w1, b1, w2, b2


def test_forward_matches_reference_fp32():
    from ctrlora_tpu.ops.kernel_flags import override

    x, w1, b1, w2, b2 = _make(256, 64)
    with override(geglu_ffn=True):
        assert geglu_ffn_ok(x, w1)
    # default (unset) is on ON TPU (2026-08-18 ledger A/B) but off on this
    # CPU host — interpret mode would drag the whole suite
    assert not geglu_ffn_ok(x, w1)
    with override(geglu_ffn=False):
        assert not geglu_ffn_ok(x, w1)  # geglu=0 force-disables
    with override(geglu_ffn=True):
        out = geglu_ffn(x, w1, b1, w2, b2)
    ref = _reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_forward_matches_reference_bf16():
    x, w1, b1, w2, b2 = _make(256, 64, dtype=jnp.bfloat16, seed=1)
    out = geglu_ffn(x, w1, b1, w2, b2)
    ref = _reference(
        x, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
        w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_gradients_match_reference():
    x, w1, b1, w2, b2 = _make(256, 64, seed=2)
    ct = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    gf = jax.grad(
        lambda *a: jnp.sum(geglu_ffn(*a) * ct), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    gr = jax.grad(
        lambda *a: jnp.sum(_reference(*a) * ct), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_row_block_budget_decisions():
    """SD 64x64 (C=320) must fit at bs=512; 32x32 (C=640) at bs=128; the
    16x16 level (C=1280) must fall back to the jnp path (weights alone
    approach the VMEM cap)."""
    assert _pick_rows(8 * 4096, 320, 1280, 2) == 512
    assert _vmem_est(512, 320, 1280, 2) <= _VMEM_LIMIT
    assert _pick_rows(8 * 1024, 640, 2560, 2) == 128
    assert _pick_rows(8 * 256, 1280, 5120, 2) is None
    # non-dividing row counts refuse the kernel
    assert _pick_rows(100, 320, 1280, 2) is None


def test_feedforward_module_uses_same_params():
    """The module's fused no-LoRA path must produce Dense-identical params
    (proj/kernel, proj/bias, out/kernel, out/bias) and Dense-identical
    outputs."""
    from ctrlora_tpu.models.attention import FeedForward
    from ctrlora_tpu.ops.kernel_flags import override

    ff = FeedForward(dim=64)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 64))
    params = ff.init(jax.random.PRNGKey(4), x)["params"]
    assert set(params) == {"proj", "out"}
    assert set(params["proj"]) == {"kernel", "bias"}
    with override(geglu_ffn=True):
        out = ff.apply({"params": params}, x)
    ref = _reference(
        x, params["proj"]["kernel"], params["proj"]["bias"],
        params["out"]["kernel"], params["out"]["bias"],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_blocked_forward_matches_reference():
    """F-blocked kernel (_forward_blocked): parity vs the jnp reference in
    interpret mode, at a shape that exercises multiple f blocks and the
    fp32 accumulator init/emit phases."""
    from ctrlora_tpu.ops.geglu_ffn import _forward_blocked

    rows, c, f = 256, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(21), 5)
    x = jax.random.normal(ks[0], (2, rows // 2, c)) * 0.5
    w1 = jax.random.normal(ks[1], (c, 2 * f)) * 0.05
    b1 = jax.random.normal(ks[2], (2 * f,)) * 0.05
    w2 = jax.random.normal(ks[3], (f, c)) * 0.05
    b2 = jax.random.normal(ks[4], (c,)) * 0.05
    out = _forward_blocked(x, w1, b1, w2, b2, 128, 256)  # bs=128, fb=256 -> nf=2
    ref = _reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_blocked_gating_wide_site():
    """The real 16^2 geometry (C=1280, F=5120, rows=2048): resident kernel
    rejects (weights 39 MB bf16 > VMEM), blocked admits — default ON since
    the 2026-08-19 A/B win; gblocked=0 restores the XLA fallback."""
    from ctrlora_tpu.ops.geglu_ffn import _pick_blocked
    from ctrlora_tpu.ops.kernel_flags import override

    assert _pick_rows(2048, 1280, 5120, 2) is None
    assert _pick_blocked(2048, 1280, 5120, 2) is not None
    x = jnp.zeros((8, 256, 1280), jnp.bfloat16)
    w1 = jnp.zeros((1280, 10240), jnp.bfloat16)
    with override(geglu_ffn=True):
        assert geglu_ffn_ok(x, w1)
    with override(geglu_ffn=True, geglu_blocked=False):
        assert not geglu_ffn_ok(x, w1)
