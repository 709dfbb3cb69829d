"""Style-transfer pipeline: CtrLoRA + IP-Adapter image prompting.

Reference: app/gradio_ctrlora_style_transfer.py + cldm/cldm_style.py +
cldm/cldm_ctrlora_style_inference.py. A style image is embedded by a CLIP
vision tower, projected to 4 extra context tokens (ImageProjModel), and
injected into every attn2 via separate to_k_ip/to_v_ip projections scaled by
per-layer ip_scale. The control branch still sees only the text context.

Optional negative content prompt: subtract the CLIP *text* projection of a
content description from the image embedding before projection
(app:386-404), steering the style tokens away from content.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.api import CtrLoRA
from ctrlora_tpu.configs import ModelConfig, ctrlora_inference_config
from ctrlora_tpu.models.ip_adapter import (
    CLIPVisionConfig, CLIPVisionModel, ImageProjModel, clip_image_preprocess,
    convert_clip_vision, convert_image_proj, load_ip_adapter_into,
)
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
from ctrlora_tpu.sampling.ddim import (
    DDIMConfig, ddim_decode_from, ddim_sample, ddim_stochastic_encode,
)
from ctrlora_tpu.utils import ckpt_torch as bridge
from ctrlora_tpu.utils.loading import load_ctrlora


def style_config(lora_num: int = 1, lora_rank: int = 128, ip_tokens: int = 4) -> ModelConfig:
    cfg = ctrlora_inference_config(lora_num=lora_num, lora_rank=lora_rank)
    return dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, ip_tokens=ip_tokens)
    )


class StyleCtrLoRA(CtrLoRA):
    """CtrLoRA with IP-Adapter style control (reference's style-transfer app
    as a library)."""

    def __init__(self, num_loras: int = 1, lora_rank: int = 128, ip_tokens: int = 4):
        super().__init__(
            num_loras=num_loras, lora_rank=lora_rank,
            cfg=style_config(num_loras, lora_rank, ip_tokens),
        )
        self.ip_tokens = ip_tokens
        self.vision_cfg = CLIPVisionConfig()
        self.vision = CLIPVisionModel(self.vision_cfg)
        self.vision_params = None
        self.image_proj = ImageProjModel(
            cross_attention_dim=self.cfg.unet.context_dim or 768,
            clip_extra_context_tokens=ip_tokens,
        )
        self.image_proj_params = None

    # ------------------------------------------------------------------
    def load_ip_adapter(
        self, ip_ckpt: str, ip_scale: float = 1.0, target: str = "all",
        image_encoder_ckpt: Optional[str] = None,
    ) -> None:
        """ip_ckpt: HF ip-adapter file with {'image_proj': ..., 'ip_adapter':
        ...}; image_encoder_ckpt: CLIP ViT-H vision weights (.bin/.safetensors)."""
        assert self.params is not None, "call create_model() first"
        sd = bridge.load_torch_state_dict(ip_ckpt)
        ip_sd = {k[len("ip_adapter."):]: v for k, v in sd.items() if k.startswith("ip_adapter.")}
        proj_sd = {k[len("image_proj."):]: v for k, v in sd.items() if k.startswith("image_proj.")}
        if not ip_sd:  # nested-dict torch file
            import torch

            raw = torch.load(ip_ckpt, map_location="cpu", weights_only=False)
            ip_sd = {k: v.numpy() for k, v in raw["ip_adapter"].items()}
            proj_sd = {k: v.numpy() for k, v in raw["image_proj"].items()}
        unet_tree = bridge.tree_to_mutable(self.params.unet)
        load_ip_adapter_into(unet_tree, ip_sd, self.cfg.unet, ip_scale, target)
        self.params = self.params._replace(
            unet=jax.tree_util.tree_map(jnp.asarray, unet_tree)
        )
        self.image_proj_params = jax.tree_util.tree_map(
            jnp.asarray, convert_image_proj(proj_sd)
        )
        if image_encoder_ckpt:
            vsd = bridge.load_torch_state_dict(image_encoder_ckpt)
            self.vision_params = jax.tree_util.tree_map(
                jnp.asarray, convert_clip_vision(vsd, self.vision_cfg)
            )
        self._sample_fn = None

    # ------------------------------------------------------------------
    def embed_style(
        self,
        style_image: np.ndarray,  # uint8 RGB HWC
        neg_content_embeds: Optional[jnp.ndarray] = None,
        neg_content_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Style image -> [1, ip_tokens, context_dim] tokens."""
        assert self.vision_params is not None, "load_ip_adapter(image_encoder_ckpt=...)"
        px = jnp.asarray(clip_image_preprocess(style_image[None]))
        embeds = self.vision.apply(self.vision_params, px)
        if neg_content_embeds is not None:
            embeds = embeds - neg_content_scale * neg_content_embeds
        return self.image_proj.apply(self.image_proj_params, embeds)

    def embed_style_tokens_zero(self, batch: int = 1) -> jnp.ndarray:
        """Uncond style tokens = image_proj(zero embeds) (the reference's
        uncond_image_prompt_embeds); falls back to zeros without weights."""
        if self.image_proj_params is not None:
            z = jnp.zeros((batch, self.vision_cfg.projection_dim))
            return self.image_proj.apply(self.image_proj_params, z)
        return jnp.zeros((batch, self.ip_tokens, self.cfg.unet.context_dim or 768))

    def embed_neg_content(
        self, prompt: str, text_encoder_ckpt: str, scale: float = 1.0
    ) -> jnp.ndarray:
        """Negative-content embedding: projected ViT-H CLIP *text* embedding
        scaled, to be subtracted from the style image embedding
        (app/gradio_ctrlora_style_transfer.py:395-403)."""
        from ctrlora_tpu.configs import CLIPTextConfig
        from ctrlora_tpu.models.clip import CLIPTextModel
        from ctrlora_tpu.utils.tokenizer import default_tokenizer

        cfg = CLIPTextConfig(
            hidden_size=1024, intermediate_size=4096, num_layers=24,
            num_heads=16, layer="projected", projection_dim=1024,
            hidden_act="gelu",
        )
        model = CLIPTextModel(cfg)
        sd = bridge.load_torch_state_dict(text_encoder_ckpt)
        tree, _ = bridge.convert_tree(
            sd, bridge.clip_entries(cfg), prefix="text_model.", strict=False
        )
        if "text_projection.weight" in sd:
            tree["params"]["text_projection"] = {
                "kernel": np.asarray(sd["text_projection.weight"], np.float32).T
            }
        params = jax.tree_util.tree_map(jnp.asarray, tree)
        ids = jnp.asarray(default_tokenizer()([prompt]))
        return model.apply(params, ids) * scale

    # ------------------------------------------------------------------
    def sample_with_style(
        self,
        cond_images: Sequence[np.ndarray],  # uint8 HWC condition maps
        style_tokens: jnp.ndarray,  # [1, ip_tokens, D] from embed_style
        prompt: str,
        n_prompt: str = "",
        num_samples: int = 1,
        ddim_steps: int = 20,
        scale: float = 7.5,
        lora_weights: Tuple[float, ...] = (1.0, 1.0),
        seed: int = 0,
        img2img_image: Optional[np.ndarray] = None,  # uint8 HWC content image
        img2img_strength: float = 0.8,
    ):
        from PIL import Image

        from ctrlora_tpu.utils.tokenizer import default_tokenizer

        assert self.params is not None
        pipe = self.pipe
        H, W = cond_images[0].shape[:2]
        tok = default_tokenizer()
        ids = jnp.asarray(np.repeat(tok([prompt]), num_samples, axis=0))
        nids = jnp.asarray(np.repeat(tok([n_prompt]), num_samples, axis=0))
        ctx = pipe.encode_text_tokens(self.params, ids)
        unc = pipe.encode_text_tokens(self.params, nids)
        ip = jnp.repeat(style_tokens, num_samples, axis=0)

        conds = []
        for i, img in enumerate(cond_images):
            hint = jnp.repeat(
                jnp.asarray(img.astype(np.float32) / 255.0)[None], num_samples, 0
            )
            hz = pipe.encode_first_stage(self.params, hint)
            conds.append(
                Conditioning(hz, lora_idx=jnp.int32(i), weight=float(lora_weights[i]))
            )

        rng = jax.random.PRNGKey(seed)
        ddim = DDIMConfig(steps=ddim_steps, guidance_scale=scale)
        latent_shape = (num_samples, H // 8, W // 8, 4)
        if img2img_image is not None:
            x01 = jnp.repeat(
                jnp.asarray(img2img_image.astype(np.float32) / 127.5 - 1.0)[None],
                num_samples, 0,
            )
            z0 = pipe.encode_first_stage(self.params, x01)
            t_start = max(1, min(int(ddim_steps * img2img_strength), ddim_steps))
            rng, enc_rng = jax.random.split(rng)
            z_T = ddim_stochastic_encode(
                pipe, z0, jnp.full((num_samples,), t_start - 1, jnp.int32),
                enc_rng, ddim_steps,
            )
            z = ddim_decode_from(
                pipe, self.params, z_T, t_start, ctx, unc, conds, ddim, rng,
                ip_context=ip,
                uncond_ip_context=jnp.repeat(
                    self.embed_style_tokens_zero(1), num_samples, axis=0
                ) if self.image_proj_params is not None else None,
            )
        else:
            z = ddim_sample(
                pipe, self.params, rng, ctx, unc, conds, latent_shape, ddim,
                ip_context=ip,
                uncond_ip_context=jnp.repeat(
                    self.embed_style_tokens_zero(1), num_samples, axis=0
                ) if self.image_proj_params is not None else None,
            )
        img = pipe.decode_first_stage(self.params, z)
        out = np.asarray(jnp.clip(img * 127.5 + 127.5, 0, 255)).astype(np.uint8)
        return [Image.fromarray(out[i]) for i in range(num_samples)]
