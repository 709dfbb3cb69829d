"""Fused Pallas GroupNorm vs the plain fp32 jnp math (interpret mode on
CPU), including gradients through the custom vjp and the GroupNorm32
module dispatch path."""

import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.ops.group_norm import (
    _plain_group_norm, fused_group_norm, group_norm,
)


def test_fused_matches_plain(rng):
    x = rng.normal(0, 1, (2, 8, 8, 64)).astype(np.float32)
    scale = rng.normal(1, 0.1, (64,)).astype(np.float32)
    bias = rng.normal(0, 0.1, (64,)).astype(np.float32)
    for silu in (False, True):
        want = _plain_group_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias), 32, 1e-5, silu)
        got = fused_group_norm(jnp.asarray(x), jnp.asarray(scale),
                               jnp.asarray(bias), 32, 1e-5, silu,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_fused_bf16_io(rng):
    x = rng.normal(0, 1, (1, 16, 16, 64)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    want = _plain_group_norm(xb, scale, bias, 32, 1e-5, False)
    got = fused_group_norm(xb, scale, bias, 32, 1e-5, False, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_custom_vjp_gradients(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, (64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(group_norm(x, s, b, None, 32, 1e-5, True) ** 2)

    def loss_plain(x, s, b):
        return jnp.sum(_plain_group_norm(x, s, b, 32, 1e-5, True) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(x, scale, bias)
    for a, b2 in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-4, atol=1e-5)


def test_groupnorm32_module_unchanged_on_cpu(rng):
    # on CPU the module keeps the plain path; this pins the dispatch guard
    from ctrlora_tpu.models.layers import GroupNorm32
    from ctrlora_tpu.ops.group_norm import group_norm_ok

    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 64)).astype(np.float32))
    assert not group_norm_ok(x, 32)  # cpu backend
    m = GroupNorm32()
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == x.shape


def test_add_row_fold_matches_explicit_add():
    """GN(x + row) via the stats-epilogue fold must equal materializing the
    add, for [C], [1,C], and per-batch [B,C] rows, with and without SiLU."""
    import numpy as np
    from ctrlora_tpu.ops.group_norm import fused_group_norm, group_norm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    # every row form once, silu alternating (each combo is an interpret-mode
    # trace, ~2s on the 1-core CI host — fast-lane budget)
    for shape, silu in [((64,), True), ((1, 64), False), ((2, 64), True)]:
        row = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = fused_group_norm(
            x + row.reshape(-1, 1, 1, 64), scale, bias, 32, 1e-5, silu,
            interpret=True,
        )
        out = fused_group_norm(
            x, scale, bias, 32, 1e-5, silu, interpret=True, add_row=row
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )


def test_onepass_matches_two_pass(rng, monkeypatch):
    """The one-pass VMEM-resident kernel (gn1=1) must match the two-pass
    default in fp32 stats semantics, for every row variant and silu, on
    both NHWC and [B,S,C] shapes (size gate patched out so the interpret
    run stays small)."""
    from ctrlora_tpu.ops import group_norm as gn_mod
    from ctrlora_tpu.ops import kernel_flags

    monkeypatch.setattr(gn_mod, "_ONEPASS_MIN_ELEMS", 0)
    c = 64
    x4 = jnp.asarray(rng.normal(0, 1, (2, 8, 8, c)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(0, 1, (1, 64, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, (c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))
    # variant set trimmed for the fast lane: x4 covers every row form (silu
    # alternates to cover both); x3 covers the [B,S,C] layout once per silu.
    # Each combo costs an interpret-mode trace (~2s on the 1-core CI host).
    combos = [(x4, None, False), (x4, (c,), True), (x4, (x4.shape[0], c), True),
              (x3, None, True), (x3, (c,), False)]
    for x, row_shape, silu in combos:
        row = (None if row_shape is None else
               jnp.asarray(rng.normal(0, 1, row_shape).astype(np.float32)))
        want = fused_group_norm(x, scale, bias, 32, 1e-5, silu,
                                interpret=True, add_row=row)
        with kernel_flags.override(gn_onepass=True):
            hw = int(np.prod(x.shape[1:-1]))
            assert gn_mod._onepass_ok(hw, c, x.dtype, 32)
            got = fused_group_norm(x, scale, bias, 32, 1e-5, silu,
                                   interpret=True, add_row=row)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_onepass_gating():
    """One-pass stays off by default, respects gn1=0, and never claims
    samples larger than the VMEM budget."""
    from ctrlora_tpu.ops import kernel_flags
    from ctrlora_tpu.ops.group_norm import _onepass_ok

    assert not _onepass_ok(64 * 64, 320, jnp.bfloat16, 32)  # default: off
    with kernel_flags.override(gn_onepass=True):
        assert _onepass_ok(64 * 64, 320, jnp.bfloat16, 32)  # 2.5MB: fits
        assert _onepass_ok(32 * 32, 640, jnp.bfloat16, 32)  # the 3.5x win
        assert not _onepass_ok(64 * 64, 512, jnp.bfloat16, 32)  # 4MB: VAE site
        assert not _onepass_ok(512 * 512, 128, jnp.bfloat16, 32)
        # below the 2^19-element floor the two-pass path wins (microbench)
        assert not _onepass_ok(16 * 16, 1280, jnp.bfloat16, 32)
        assert not _onepass_ok(8 * 8, 1280, jnp.bfloat16, 32)
    with kernel_flags.override(gn_onepass=False):
        assert not _onepass_ok(64 * 64, 320, jnp.bfloat16, 32)


def test_onepass_bf16_io(rng, monkeypatch):
    from ctrlora_tpu.ops import group_norm as gn_mod
    from ctrlora_tpu.ops import kernel_flags

    monkeypatch.setattr(gn_mod, "_ONEPASS_MIN_ELEMS", 0)
    xb = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 64)), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    want = _plain_group_norm(xb, scale, bias, 32, 1e-5, True)
    with kernel_flags.override(gn_onepass=True):
        got = fused_group_norm(xb, scale, bias, 32, 1e-5, True, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_add_row_gradients_flow():
    """d/d(add_row) of the custom-vjp group_norm must match the gradient of
    the explicit-add formulation (training uses this path for emb_proj)."""
    import numpy as np
    from ctrlora_tpu.ops.group_norm import group_norm

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 32)).astype(np.float32))
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    row = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))

    g1 = jax.grad(
        lambda r: jnp.sum(group_norm(x, scale, bias, r, 32, 1e-5, True) ** 2)
    )(row)
    g2 = jax.grad(
        lambda r: jnp.sum(
            group_norm(x + r[:, None, None, :], scale, bias, None, 32, 1e-5,
                       True) ** 2
        )
    )(row)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
