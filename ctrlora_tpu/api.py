"""Python API (reference: api.py — class CtrLoRA with create_model/sample).

Usage:
    from ctrlora_tpu.api import CtrLoRA
    ct = CtrLoRA(num_loras=1)
    ct.create_model(sd_file, basecn_file, lora_files=(lora_ckpt,))
    images = ct.sample(cond_image_paths, prompt, n_prompt, num_samples=1)

Differences from the reference: sampling runs as one jitted scan (recompiled
only when the image geometry or batch changes), the hint is VAE-encoded once,
and everything is deterministic under the `seed` argument.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ctrlora_tpu.annotators.util import HWC3
from ctrlora_tpu.configs import ModelConfig, ctrlora_inference_config
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params
from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample
from ctrlora_tpu.utils.loading import load_ctrlora


class CtrLoRA:
    def __init__(self, num_loras: int = 1, lora_rank: int = 128,
                 cfg: Optional[ModelConfig] = None, fuse: bool = True,
                 bf16: bool = True):
        self.num_loras = num_loras
        self.cfg = cfg or ctrlora_inference_config(lora_num=num_loras, lora_rank=lora_rank)
        self.pipe = CtrLoraPipeline(self.cfg)
        self.params: Optional[Params] = None
        # inference optimizations: fold LoRA deltas into the base weights
        # (lora_fuse.py) and cast kernels to bf16 once
        self.fuse = fuse and self.pipe.fused_control is not None
        self.bf16 = bf16
        self.fused_controls = None
        self._sample_fn = None
        self._sample_key = None

    # ------------------------------------------------------------------
    def create_model(
        self,
        sd_file: str = "ckpts/sd15/v1-5-pruned.ckpt",
        basecn_file: str = "ckpts/ctrlora-basecn/ctrlora_sd15_basecn700k.ckpt",
        lora_files: Sequence[str] = (),
    ) -> None:
        if not isinstance(lora_files, (tuple, list)):
            lora_files = (lora_files,)
        for f in (sd_file, basecn_file, *lora_files):
            assert os.path.exists(f), f"File not found: {f}"
        assert len(lora_files) == self.num_loras, (
            f"expected {self.num_loras} lora files, got {len(lora_files)}"
        )
        self.params = load_ctrlora(self.pipe, sd_file, basecn_file, lora_files)
        from ctrlora_tpu.lora_fuse import cast_params_for_inference, fuse_control_tree

        if self.fuse:
            self.fused_controls = tuple(
                fuse_control_tree(self.params.control, i, self.cfg.control.lora)
                for i in range(self.num_loras)
            )
        if self.bf16:
            self.params = cast_params_for_inference(self.params)
            if self.fused_controls is not None:
                self.fused_controls = tuple(
                    cast_params_for_inference(t) for t in self.fused_controls
                )
        self._sample_fn = None  # new params -> refresh jit cache key

    # ------------------------------------------------------------------
    def _get_sampler(self, shape_key):
        if self._sample_fn is None or self._sample_key != shape_key:
            pipe = self.pipe
            n_loras, B, H, W, steps, scale, eta, guess_mode = shape_key
            ddim = DDIMConfig(
                steps=steps, guidance_scale=scale, eta=eta, guess_mode=guess_mode
            )
            f = 2 ** (len(self.cfg.vae.ch_mult) - 1)

            @jax.jit
            def fn(params, fused_controls, hints, token_ids, n_token_ids,
                   lora_weights, control_scales, rng):
                ctx, unc = pipe.encode_text_cond_uncond(params, token_ids, n_token_ids)
                conds = []
                for i in range(n_loras):
                    hz = pipe.encode_first_stage(params, hints[i])
                    conds.append(
                        Conditioning(
                            hz,
                            lora_idx=jnp.int32(i),
                            weight=lora_weights[i],
                            control_params=(
                                fused_controls[i] if fused_controls else None
                            ),
                        )
                    )
                z = ddim_sample(
                    pipe, params, rng, ctx, unc, conds,
                    (B, H // f, W // f, 4), ddim, control_scales=control_scales,
                )
                img = pipe.decode_first_stage(params, z)
                return jnp.clip(img * 127.5 + 127.5, 0, 255).astype(jnp.uint8)

            self._sample_fn = fn
            self._sample_key = shape_key
        return self._sample_fn

    def sample(
        self,
        cond_image_paths,
        prompt: str,
        n_prompt: str = "",
        num_samples: int = 1,
        ddim_steps: int = 20,
        scale: float = 7.5,
        lora_weights: Tuple[float, ...] = (1.0, 1.0),
        seed: int = 0,
    ):
        assert self.params is not None, "Model is not loaded. Call create_model() first."
        if not isinstance(cond_image_paths, (tuple, list)):
            cond_image_paths = (cond_image_paths,)
        assert len(cond_image_paths) == self.num_loras, (
            f"Expected {self.num_loras} images, got {len(cond_image_paths)}"
        )
        images = []
        for p in cond_image_paths:
            arr = p if isinstance(p, np.ndarray) else np.array(Image.open(p))
            images.append(HWC3(arr))
        if self.num_loras == 2:
            images = list(center_crop_to_common(images[0], images[1]))
        return self._sample_images(
            images, prompt, n_prompt, num_samples, ddim_steps, scale, lora_weights, seed
        )

    def _sample_images(
        self, images, prompt, n_prompt, num_samples, ddim_steps, scale,
        lora_weights, seed, eta: float = 0.0, guess_mode: bool = False,
        control_scales=None,
    ):
        from ctrlora_tpu.utils.tokenizer import default_tokenizer

        H, W = images[0].shape[:2]
        hints = jnp.stack(
            [
                jnp.repeat(
                    jnp.asarray(img.astype(np.float32) / 255.0)[None], num_samples, 0
                )
                for img in images
            ]
        )  # [n_loras, B, H, W, 3]
        tok = default_tokenizer()
        ids = jnp.asarray(np.repeat(tok([prompt]), num_samples, axis=0))
        nids = jnp.asarray(np.repeat(tok([n_prompt]), num_samples, axis=0))
        weights = jnp.asarray(lora_weights[: self.num_loras], jnp.float32)
        taps = self.pipe.n_control_taps
        if control_scales is None:
            control_scales = jnp.ones((taps,), jnp.float32)
        else:
            control_scales = jnp.asarray(control_scales, jnp.float32)
        fn = self._get_sampler(
            (self.num_loras, num_samples, H, W, ddim_steps, float(scale),
             float(eta), bool(guess_mode))
        )
        out = fn(
            self.params, self.fused_controls, hints, ids, nids, weights,
            control_scales, jax.random.PRNGKey(seed),
        )
        out = np.asarray(out)
        return [Image.fromarray(out[i]) for i in range(num_samples)]


def center_crop_to_common(a: np.ndarray, b: np.ndarray):
    """Center-crop two condition images to their common size (reference:
    api.py:109-127)."""
    H, W = a.shape[:2]
    H2, W2 = b.shape[:2]
    if H2 > H:
        b = b[(H2 - H) // 2 : (H2 + H) // 2]
    else:
        a = a[(H - H2) // 2 : (H + H2) // 2]
    if W2 > W:
        b = b[:, (W2 - W) // 2 : (W2 + W) // 2]
    else:
        a = a[:, (W - W2) // 2 : (W + W2) // 2]
    return a, b
