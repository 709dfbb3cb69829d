"""LoRA fusion: the fused control tree must reproduce the unfused path."""

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
