#!/usr/bin/env python
"""Frechet distance between sample and reference image sets.

The reference points users at the external torch-fidelity CLI for FID/IS
(README-traineval.md:317-321; InceptionV3 weights are not shippable here).
This harness computes the same Frechet statistic over ANY feature extractor;
with a CLIP ViT image-encoder checkpoint it yields CLIP-FID (Kynkäänniemi et
al. 2022), a drop-in and often better-behaved variant.

  python scripts/evaluate_fid.py --dir_a out/sample --dir_b data/val \
      --image_encoder ckpts/ip-adapter/image_encoder.bin
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()

import numpy as np


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 (C1 C2)^{1/2})."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean))


def stats(feats: np.ndarray):
    return feats.mean(0), np.cov(feats, rowvar=False)


def clip_features(image_dir: str, encoder_ckpt: str, bs: int = 32) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from ctrlora_tpu.data.datasets import imread_rgb
    from ctrlora_tpu.models.ip_adapter import (
        CLIPVisionConfig, CLIPVisionModel, clip_image_preprocess, convert_clip_vision,
    )
    from ctrlora_tpu.utils.ckpt_torch import load_torch_state_dict

    cfg = CLIPVisionConfig()
    model = CLIPVisionModel(cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_clip_vision(load_torch_state_dict(encoder_ckpt), cfg)
    )
    apply = jax.jit(model.apply)
    names = sorted(os.listdir(image_dir))
    feats = []
    for i in range(0, len(names), bs):
        imgs = [imread_rgb(os.path.join(image_dir, n)) for n in names[i : i + bs]]
        imgs = [im for im in imgs if im is not None]
        if not imgs:
            continue
        px = jnp.asarray(clip_image_preprocess(np.stack([im for im in imgs])))
        feats.append(np.asarray(apply(params, px)))
    return np.concatenate(feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir_a", required=True)
    p.add_argument("--dir_b", required=True)
    p.add_argument("--image_encoder", required=True, help="CLIP vision ckpt")
    p.add_argument("--bs", type=int, default=32)
    args = p.parse_args()

    fa = clip_features(args.dir_a, args.image_encoder, args.bs)
    fb = clip_features(args.dir_b, args.image_encoder, args.bs)
    print(f"features: {fa.shape[0]} vs {fb.shape[0]} ({fa.shape[1]}-d)")
    fid = frechet_distance(*stats(fa), *stats(fb))
    print(f"CLIP-FID: {fid:.4f}")


if __name__ == "__main__":
    main()
