"""LoRA fusion: the fused control tree must reproduce the unfused path."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.configs import tiny_test_config
from ctrlora_tpu.lora_fuse import cast_params_for_inference, fuse_control_tree
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline


def test_fused_matches_unfused():
    cfg = tiny_test_config(n_loras=2, switchable_banks=True)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)

    # non-trivial lora + bank weights
    def randomize(path, x):
        ks = jax.tree_util.keystr(path)
        if any(s in ks for s in ("lora_up", "lora_down")):
            return jax.random.normal(jax.random.PRNGKey(hash(ks) % 2**31), x.shape) * 0.1
        if "zero_" in ks:
            return jax.random.normal(jax.random.PRNGKey(hash(ks) % 2**30), x.shape) * 0.1
        return x

    control = jax.tree_util.tree_map_with_path(randomize, params.control)
    params = params._replace(control=control)

    hint = jnp.ones((1, 16, 16, 4)) * 0.3
    t = jnp.array([500])
    ctx = jnp.ones((1, 16, 64))

    for slot in range(2):
        taps_ref = pipe.control.apply(
            params.control, hint, t, ctx, lora_idx=jnp.int32(slot)
        )
        fused = fuse_control_tree(params.control, slot, cfg.control.lora)
        taps_fused = pipe.fused_control.apply(fused, hint, t, ctx)
        for a, b in zip(taps_ref, taps_fused):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
            )

    # and through apply_model via per-condition control_params
    fused0 = fuse_control_tree(params.control, 0, cfg.control.lora)
    x = jnp.zeros((1, 16, 16, 4))
    out_ref = pipe.apply_model(
        params, x, t, ctx, [Conditioning(hint, lora_idx=jnp.int32(0))]
    )
    out_fused = pipe.apply_model(
        params, x, t, ctx, [Conditioning(hint, control_params=fused0)]
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_fused), atol=2e-5, rtol=1e-4
    )


def test_cast_params_for_inference():
    cfg = tiny_test_config(n_loras=1)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    cast = cast_params_for_inference(params)
    # kernels bf16, norm affines fp32
    k = cast.unet["params"]["in_conv"]["kernel"]
    assert k.dtype == jnp.bfloat16
    s = cast.unet["params"]["norm_out"]["scale"]
    assert s.dtype == jnp.float32
    # model still runs
    out = pipe.unet.apply(
        cast.unet, jnp.zeros((1, 8, 8, 4)), jnp.array([0]), jnp.zeros((1, 16, 64))
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_fused_matches_runtime_after_training():
    """Fuse a TRAINED (non-zero LoRA) checkpoint and require exact agreement
    with the runtime-LoRA path — the round-2 driver bench compared the two
    paths for the first time, so this pins their equivalence on weights that
    actually moved (reference fusion semantics: cldm/lora.py:237-291)."""
    from ctrlora_tpu.configs import TrainConfig
    from ctrlora_tpu.training.step import make_train_step
    from ctrlora_tpu.training.train_state import create_train_state

    cfg = tiny_test_config(n_loras=1, switchable_banks=True)
    pipe = CtrLoraPipeline(cfg)
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)

    # pretrained-like: zero-init output convs block all gradient flow into
    # the LoRA on a raw init, so bump them like a loaded SD checkpoint
    def bump(path, x):
        ks = jax.tree_util.keystr(path)
        if "kernel" in ks and any(
            s in ks for s in ("conv_out", "proj_out", "out_conv", "zero_")
        ):
            return jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.05
        return x

    params = params._replace(
        unet=jax.tree_util.tree_map_with_path(bump, params.unet),
        control=jax.tree_util.tree_map_with_path(bump, params.control),
    )

    tcfg = TrainConfig(trainable="lora", batch_size=1, learning_rate=1e-2)
    state, tx, _ = create_train_state(params, tcfg)
    step = make_train_step(pipe, tx, tcfg)
    batch = {
        "jpg": jnp.ones((1, 64, 64, 3)) * 0.2,
        "hint": jnp.ones((1, 64, 64, 3)) * 0.7,
        "token_ids": jnp.ones((1, cfg.clip.max_length), jnp.int32),
        "task_idx": jnp.zeros((1,), jnp.int32),
    }
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    # the step donates its input buffers; the post-step state holds the
    # only live copies
    trained = state.params

    # the LoRA actually moved
    moved = [
        float(jnp.abs(x).max())
        for path, x in jax.tree_util.tree_leaves_with_path(trained.control)
        if "lora_up" in jax.tree_util.keystr(path)
    ]
    assert max(moved) > 0, "training did not touch lora_up"

    hint = jnp.ones((1, 16, 16, 4)) * 0.3
    t = jnp.array([500])
    ctx = jnp.ones((1, 16, 64))
    x = jnp.zeros((1, 16, 16, 4))
    out_runtime = pipe.apply_model(
        trained, x, t, ctx, [Conditioning(hint, lora_idx=jnp.int32(0))]
    )
    fused = fuse_control_tree(trained.control, 0, cfg.control.lora)
    out_fused = pipe.apply_model(
        trained, x, t, ctx, [Conditioning(hint, control_params=fused)]
    )
    np.testing.assert_allclose(
        np.asarray(out_runtime), np.asarray(out_fused), atol=2e-5, rtol=1e-4
    )
