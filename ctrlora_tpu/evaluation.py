"""Evaluation metrics, TPU/JAX-native.

The reference leans on torchmetrics (scripts/evaluate_control.py:65-69):
MSE / PSNR / SSIM / LPIPS on condition maps + CLIPScore on images.
MSE/PSNR/SSIM are jitted jax functions. LPIPS (models/lpips.py) and
CLIPScore (CLIPScorer below, over the in-tree CLIP towers) need pretrained
weights: pass the torch checkpoints to `MetricAccumulator(lpips_params=...,
clip_scorer=...)` — see scripts/evaluate_control.py `--lpips_ckpt` /
`--clip_ckpt`.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def load_eval_models(lpips_ckpt: Optional[str], clip_ckpt: Optional[str]):
    """Load the learned-metric weights the eval scripts accept:
    lpips_ckpt — torchvision VGG16 + lpips lin heads (or the lpips package's
    combined dict); clip_ckpt — HF openai/clip-vit-large-patch14 CLIPModel.
    Returns (lpips_params | None, CLIPScorer | None)."""
    from ctrlora_tpu.utils.ckpt_torch import load_torch_state_dict

    lpips_params = None
    scorer = None
    if lpips_ckpt:
        from ctrlora_tpu.models.lpips import convert_lpips

        lpips_params = convert_lpips(load_torch_state_dict(lpips_ckpt))
    if clip_ckpt:
        scorer = CLIPScorer.from_torch_state(load_torch_state_dict(clip_ckpt))
    return lpips_params, scorer


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over the whole batch (inputs [B,H,W,C] in [0,1])."""
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Batch PSNR matching torchmetrics' default (one MSE over the batch)."""
    m = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
    k1: float = 0.01, k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity with an 11x11 sigma-1.5 gaussian window
    (standard Wang et al. formulation, as torchmetrics defaults)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gaussian_kernel()[:, :, None, None]  # HWIO, per-channel depthwise

    def filt(x):
        b_, h, w, c = x.shape
        k = jnp.tile(win, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = filt(a * a) - mu_aa
    sig_b = filt(b * b) - mu_bb
    sig_ab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sig_a + sig_b + c2)
    )
    return jnp.mean(s)


class CLIPScorer:
    """torchmetrics.CLIPScore equivalent over the in-tree CLIP towers:
    100 * clamp(cos(image_embeds, text_embeds), min=0), meaned over samples
    (the clamp applies to the mean, as torchmetrics does).

    Built from an HF openai/clip-vit-large-patch14 state dict (the model
    the reference evaluation uses, scripts/evaluate_control.py:69)."""

    def __init__(self, text_apply, text_params, vision_apply, vision_params,
                 tokenizer=None, image_size: int = 224):
        from ctrlora_tpu.utils.tokenizer import default_tokenizer

        self.text_apply = jax.jit(text_apply)
        self.text_params = text_params
        self.vision_apply = jax.jit(vision_apply)
        self.vision_params = vision_params
        self.tokenizer = tokenizer or default_tokenizer()
        self.image_size = image_size

    @classmethod
    def from_torch_state(cls, sd: Dict[str, np.ndarray], tokenizer=None):
        """sd: full HF CLIPModel state dict (text_model.* + vision_model.* +
        text_projection / visual_projection)."""
        import dataclasses

        from ctrlora_tpu.configs import CLIPTextConfig
        from ctrlora_tpu.models.clip import CLIPTextModel
        from ctrlora_tpu.models.ip_adapter import (
            CLIPVisionConfig, CLIPVisionModel, convert_clip_vision,
        )
        from ctrlora_tpu.utils import ckpt_torch as bridge

        proj_dim = int(np.asarray(sd["text_projection.weight"]).shape[0])
        n_text = 1 + max(
            int(k.split(".")[3]) for k in sd if k.startswith("text_model.encoder.layers.")
        )
        hid = int(np.asarray(sd["text_model.embeddings.token_embedding.weight"]).shape[1])
        tcfg = CLIPTextConfig(
            hidden_size=hid, intermediate_size=4 * hid, num_layers=n_text,
            num_heads=hid // 64, layer="projected", projection_dim=proj_dim,
        )
        ttree, _ = bridge.convert_tree(sd, bridge.clip_entries(tcfg), prefix="text_model.")
        ttree["params"]["text_projection"] = {
            "kernel": np.asarray(sd["text_projection.weight"], np.float32).T
        }
        pw = np.asarray(sd["vision_model.embeddings.patch_embedding.weight"])
        n_vis = 1 + max(
            int(k.split(".")[3]) for k in sd if k.startswith("vision_model.encoder.layers.")
        )
        pos = np.asarray(sd["vision_model.embeddings.position_embedding.weight"])
        patch = pw.shape[-1]
        vhid = pw.shape[0]
        grid = int(round((pos.shape[0] - 1) ** 0.5))
        vcfg = CLIPVisionConfig(
            image_size=grid * patch, patch_size=patch, hidden_size=vhid,
            intermediate_size=4 * vhid, num_layers=n_vis, num_heads=vhid // 64,
            projection_dim=int(np.asarray(sd["visual_projection.weight"]).shape[0]),
            hidden_act="quick_gelu",
        )
        vtree = convert_clip_vision(sd, vcfg)
        text = CLIPTextModel(tcfg)
        vision = CLIPVisionModel(vcfg)
        return cls(
            text.apply, ttree, vision.apply, vtree,
            tokenizer=tokenizer, image_size=vcfg.image_size,
        )

    def embed(self, images_uint8: np.ndarray, prompts: Sequence[str]):
        from ctrlora_tpu.models.ip_adapter import clip_image_preprocess

        pixels = clip_image_preprocess(np.asarray(images_uint8), self.image_size)
        img = self.vision_apply(self.vision_params, jnp.asarray(pixels))
        ids = self.tokenizer([p.strip() for p in prompts])
        txt = self.text_apply(self.text_params, jnp.asarray(ids))
        return img, txt

    def __call__(self, images_uint8: np.ndarray, prompts: Sequence[str]) -> np.ndarray:
        """Per-sample (unclamped) 100*cosine scores [B]."""
        img, txt = self.embed(images_uint8, prompts)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return np.asarray(100.0 * jnp.sum(img * txt, axis=-1))


class MetricAccumulator:
    """Streaming mean over batches of the reference's five metrics.

    MSE/PSNR/SSIM always; LPIPS when `lpips_params` (models/lpips.py tree)
    is given; CLIPScore on (sample, prompt) pairs when `clip_scorer` is
    given."""

    def __init__(self, lpips_params=None, clip_scorer: Optional[CLIPScorer] = None):
        self._sums: Dict[str, float] = {}
        self._count = 0
        self._clip_sum = 0.0
        self._clip_count = 0
        self.lpips_params = lpips_params
        self.clip_scorer = clip_scorer

    def update(
        self,
        control: np.ndarray,
        gt_control: np.ndarray,
        sample: Optional[np.ndarray] = None,
        prompts: Optional[Sequence[str]] = None,
    ) -> None:
        a = jnp.asarray(control, jnp.float32)
        b = jnp.asarray(gt_control, jnp.float32)
        n = a.shape[0]
        vals = {
            "mse": float(mse(a, b)),
            "psnr": float(psnr(a, b)),
            "ssim": float(ssim(a, b)),
        }
        if self.lpips_params is not None:
            from ctrlora_tpu.models.lpips import lpips_jit

            vals["lpips"] = float(jnp.mean(lpips_jit(self.lpips_params, a, b)))
        for k, v in vals.items():
            self._sums[k] = self._sums.get(k, 0.0) + v * n
        self._count += n
        if self.clip_scorer is not None and sample is not None and prompts is not None:
            scores = self.clip_scorer(sample, prompts)
            self._clip_sum += float(np.sum(scores))
            self._clip_count += len(scores)

    def compute(self) -> Dict[str, float]:
        out = {k: v / max(self._count, 1) for k, v in self._sums.items()}
        if self._clip_count:
            # torchmetrics clamps the aggregated mean at 0
            out["clip score"] = max(self._clip_sum / self._clip_count, 0.0)
        return out
