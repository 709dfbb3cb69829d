"""Time the per-batch fixed-cost pipeline stages (outside the DDIM scan):
CLIP text encode, VAE hint encode (512^2), VAE decode (64^2 latents ->
512^2 pixels). These run once per sample() call; the 5-step bench suggests
they cost ~0.9s/batch together.

Run: python perf/pipeline_fixed.py [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()
    reps = args.reps

    from ctrlora_tpu.configs import ctrlora_inference_config
    from ctrlora_tpu.lora_fuse import cast_params_for_inference
    from ctrlora_tpu.pipeline import CtrLoraPipeline

    cfg = ctrlora_inference_config(lora_num=1, lora_rank=128)
    pipe = CtrLoraPipeline(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = cast_params_for_inference(
            pipe.init(jax.random.PRNGKey(0), image_size=8)
        )
    params = jax.device_put(params, jax.devices()[0])

    def bench(label, fn, *args):
        def chained(params, *args):
            def body(_, c):
                return fn(params, *args, c)

            init = fn(params, *args, None)
            return jnp.sum(
                jax.lax.fori_loop(0, reps, body, init).astype(jnp.float32)
            )

        j = jax.jit(chained)
        np.asarray(j(params, *args))
        t0 = time.perf_counter()
        np.asarray(j(params, *args))
        dt = (time.perf_counter() - t0) / (reps + 1)
        print(f"  {label:28s} {dt*1e3:8.2f} ms", flush=True)

    B = 4
    ids = jnp.ones((B, cfg.clip.max_length), jnp.int32)
    hint = jnp.ones((B, 512, 512, 3), jnp.float32) * 0.5
    z = jnp.ones((B, 64, 64, 4), jnp.float32) * 0.1

    # text encode: chained via ids (carry unused; feed fresh each iter)
    bench("clip text encode b4", lambda p, ids, c: pipe.encode_text_tokens(p, ids)
          if c is None else pipe.encode_text_tokens(p, ids) + 1e-30 * c[:, :, :1].sum(),
          ids)
    bench("vae hint encode 512^2 b4", lambda p, h, c: pipe.encode_first_stage(p, h)
          if c is None else pipe.encode_first_stage(p, h) + 1e-30 * jnp.sum(c),
          hint)
    bench("vae decode 512^2 b4", lambda p, z, c: pipe.decode_first_stage(p, z)
          if c is None else pipe.decode_first_stage(p, z) + 1e-30 * jnp.sum(c),
          z)


if __name__ == "__main__":
    main()
