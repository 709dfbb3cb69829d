#!/usr/bin/env python
"""Frechet distance + Inception Score between sample and reference sets.

The reference points users at the external torch-fidelity CLI for FID/IS
(README-traineval.md:317-321). Both of its metrics are native here:
--inception_ckpt runs the in-tree FID InceptionV3 port
(models/inception.py, pytorch-fid protocol — comparable with published
numbers), --image_encoder runs CLIP-FID (Kynkäänniemi et al. 2022) over a
CLIP ViT image tower.

  python scripts/evaluate_fid.py --dir_a out/sample --dir_b data/val \
      --inception_ckpt ckpts/pt_inception-2015-12-05-6726825d.pth
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


def inception_outputs(image_dir: str, ckpt: str, bs: int = 32):
    """pool3 features + fc logits via the FID InceptionV3 port
    (models/inception.py; pt_inception-2015-12-05 weights)."""
    import jax
    import jax.numpy as jnp

    from ctrlora_tpu.data.datasets import imread_rgb
    from ctrlora_tpu.models.inception import (
        convert_inception, fid_preprocess, inception_features,
    )
    from ctrlora_tpu.utils.ckpt_torch import load_torch_state_dict

    params = convert_inception(load_torch_state_dict(ckpt))
    apply = jax.jit(inception_features)
    names = sorted(os.listdir(image_dir))
    feats, logits = [], []
    for i in range(0, len(names), bs):
        imgs = [imread_rgb(os.path.join(image_dir, n)) for n in names[i : i + bs]]
        imgs = [im for im in imgs if im is not None]
        if not imgs:
            continue
        x = fid_preprocess(np.stack(imgs))
        f, l = apply(params, jnp.asarray(x))
        feats.append(np.asarray(f))
        logits.append(np.asarray(l))
    return np.concatenate(feats), np.concatenate(logits)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir_a", required=True)
    p.add_argument("--dir_b", default=None, help="reference set (omit for IS-only)")
    p.add_argument("--image_encoder", default=None, help="CLIP vision ckpt (CLIP-FID)")
    p.add_argument("--inception_ckpt", default=None,
                   help="pt_inception-2015-12-05 ckpt (Inception-FID + IS)")
    p.add_argument("--bs", type=int, default=32)
    args = p.parse_args()
    assert args.image_encoder or args.inception_ckpt, (
        "provide --image_encoder (CLIP-FID) and/or --inception_ckpt"
    )

    if args.inception_ckpt:
        from ctrlora_tpu.models.inception import inception_score

        fa, la = inception_outputs(args.dir_a, args.inception_ckpt, args.bs)
        is_mean, is_std = inception_score(la)
        print(f"IS: {is_mean:.4f} +/- {is_std:.4f}")
        if args.dir_b:
            fb, _ = inception_outputs(args.dir_b, args.inception_ckpt, args.bs)
            print(f"features: {fa.shape[0]} vs {fb.shape[0]} ({fa.shape[1]}-d)")
            print(f"FID: {frechet_distance(*stats(fa), *stats(fb)):.4f}")

    if args.image_encoder:
        assert args.dir_b, "CLIP-FID needs --dir_b"
        fa = clip_features(args.dir_a, args.image_encoder, args.bs)
        fb = clip_features(args.dir_b, args.image_encoder, args.bs)
        print(f"features: {fa.shape[0]} vs {fb.shape[0]} ({fa.shape[1]}-d)")
        fid = frechet_distance(*stats(fa), *stats(fb))
        print(f"CLIP-FID: {fid:.4f}")


if __name__ == "__main__":
    main()
