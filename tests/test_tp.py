"""Tensor-parallel (2-D data x model mesh) tests on the 8-device CPU mesh.

GSPMD is semantics-preserving, so the strongest check is equality: the TP
train step must produce the same loss/gradient effect as the plain
single-program step up to reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlora_tpu.configs import TrainConfig, tiny_test_config
from ctrlora_tpu.parallel.tp import (
    constrain, create_mesh_2d, shard_batch_2d, tensor_parallel,
)
from ctrlora_tpu.pipeline import CtrLoraPipeline
from ctrlora_tpu.training.step import make_train_step
from ctrlora_tpu.training.train_state import create_train_state


def _setup():
    cfg = tiny_test_config(n_loras=1)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    tcfg = TrainConfig(trainable="lora", learning_rate=1e-4)
    state, tx, _ = create_train_state(params, tcfg)
    B = 4
    batch = {
        "jpg": jax.random.uniform(jax.random.PRNGKey(3), (B, 32, 32, 3)),
        "hint": jnp.ones((B, 32, 32, 3), jnp.float32) * 0.5,
        "token_ids": jnp.ones((B, cfg.clip.max_length), jnp.int32),
        "task_idx": jnp.zeros((B,), jnp.int32),
    }
    return pipe, tcfg, tx, state, batch


def test_constrain_identity_without_context():
    x = jnp.ones((2, 3, 4))
    assert constrain(x, "data", None, "model") is x
    mesh = create_mesh_2d(2, 2)
    with tensor_parallel(mesh):
        with pytest.raises(ValueError):
            constrain(x, "data", None)  # rank mismatch


def test_mesh_2d_shape_and_axes():
    mesh = create_mesh_2d(2, 4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        create_mesh_2d(4, 4)  # 16 > 8 devices


@pytest.mark.slow
def test_tp_train_step_matches_plain():
    """One train step on a (2 data x 2 model) mesh == the unsharded step."""
    pipe, tcfg, tx, state, batch = _setup()
    rng = jax.random.PRNGKey(7)

    plain_step = make_train_step(pipe, tx, tcfg, donate=False)
    _, m_plain = plain_step(state, batch, rng)
    loss_plain = float(m_plain["loss"])

    mesh = create_mesh_2d(2, 2)
    with tensor_parallel(mesh):
        tp_step = make_train_step(pipe, tx, tcfg, donate=False)
        sharded = shard_batch_2d(mesh, batch)
        _, m_tp = tp_step(state, sharded, rng)
        loss_tp = float(m_tp["loss"])

    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_plain, rtol=2e-4)


@pytest.mark.slow
def test_tp_forward_matches_plain():
    """Controlled denoise forward under TP == unsharded forward."""
    from ctrlora_tpu.pipeline import Conditioning

    cfg = tiny_test_config(n_loras=1)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    B, lat = 4, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, lat, lat, 4))
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 16, cfg.clip.hidden_size))
    hz = jax.random.normal(jax.random.PRNGKey(3), (B, lat, lat, 4))

    def fwd(params, x, t, ctx, hz):
        return pipe.apply_model(
            params, x, t, ctx, [Conditioning(hz, lora_idx=jnp.int32(0))]
        )

    ref = np.asarray(jax.jit(fwd)(params, x, t, ctx, hz))
    mesh = create_mesh_2d(2, 4)
    with tensor_parallel(mesh):
        got = np.asarray(jax.jit(fwd)(params, x, t, ctx, hz))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_trainer_tp_flag_e2e(tmp_path):
    """The user-reachable TP surface: Trainer(tp=2) — what the train CLIs'
    --tp flag constructs — builds the 2-D mesh and completes steps with a
    finite loss on the virtual 8-device platform."""
    from ctrlora_tpu.training.trainer import Trainer

    pipe, tcfg, _, _, batch = _setup()
    tr = Trainer(pipe, tcfg, str(tmp_path), tp=2)
    assert tr.mesh.devices.shape == (4, 2)
    assert tr.mesh.axis_names == ("data", "model")
    state = tr.fit(iter([batch, batch]), max_steps=2)
    assert int(state.step) == 2
    with pytest.raises(ValueError):
        Trainer(pipe, tcfg, str(tmp_path), tp=3)  # 3 does not divide 8


@pytest.mark.slow
def test_tp_sample_jit_matches_plain():
    """tp_sample_jit (scripts/sample.py --tp) == plain jit output."""
    from ctrlora_tpu.parallel.tp import tp_sample_jit
    from ctrlora_tpu.pipeline import Conditioning
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

    cfg = tiny_test_config(n_loras=1)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    B = 4
    ids = jnp.ones((B, cfg.clip.max_length), jnp.int32)
    nids = jnp.zeros((B, cfg.clip.max_length), jnp.int32)
    hint = jnp.ones((B, 32, 32, 3), jnp.float32) * 0.5

    def sample_fn(params, hint, ids, nids, rng):
        ctx = pipe.encode_text_tokens(params, ids)
        unc = pipe.encode_text_tokens(params, nids)
        hz = pipe.encode_first_stage(params, hint)
        z = ddim_sample(
            pipe, params, rng, ctx, unc,
            [Conditioning(hz, lora_idx=jnp.int32(0))],
            (B, 16, 16, 4), DDIMConfig(steps=2, guidance_scale=7.5),
        )
        return pipe.decode_first_stage(params, z)

    rng = jax.random.PRNGKey(2)
    ref = np.asarray(jax.jit(sample_fn)(params, hint, ids, nids, rng))
    mesh = create_mesh_2d(2, 4)
    got = np.asarray(tp_sample_jit(sample_fn, mesh)(params, hint, ids, nids, rng))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


@pytest.mark.slow
def test_tp_shard_mapped_attention_matches_plain():
    """attention_bshd under a dividing (data, model) layout takes the
    shard_map route (whole heads per shard, collective-free) and must match
    the unsharded kernel; non-dividing heads fall back to the XLA path with
    the same output."""
    from ctrlora_tpu.parallel.tp import attention_bshd

    b, s, h, d = 4, 64, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    ref = np.asarray(attention_bshd(q, k, v))  # no ctx: plain path

    mesh = create_mesh_2d(2, 2)  # heads % 2 == 0 -> shard_map route
    with tensor_parallel(mesh):
        got = np.asarray(jax.jit(attention_bshd)(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    mesh4 = create_mesh_2d(2, 4)  # heads % 4 != 0 -> XLA fallback route
    with tensor_parallel(mesh4):
        got4 = np.asarray(jax.jit(attention_bshd)(q, k, v))
    np.testing.assert_allclose(got4, ref, atol=2e-5, rtol=2e-5)
