"""LPIPS perceptual metric (VGG16 variant), TPU/JAX-native.

Matches the `lpips` package's LPIPS(net='vgg') — which is what torchmetrics'
LearnedPerceptualImagePatchSimilarity wraps and what the reference evaluation
uses (reference: scripts/evaluate_control.py:65,128) — bit-for-bit in fp32:

  x in [0,1] --(normalize)--> 2x-1 --ScalingLayer--> VGG16 features at
  relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 --channel-unit-normalize-->
  squared diff --1x1 learned lin head--> spatial mean --sum over taps.

Weights load from either a torchvision VGG16 state dict ('features.{i}.*')
merged with the lpips lin heads ('lin{k}.model.1.weight'), or from the
lpips package's own naming ('net.slice{k}.{i}.*'). Both use the same conv
layer indices, so one bridge covers both.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, n_convs) per VGG16 block; a 2x2 maxpool sits between blocks
VGG16_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# torchvision vgg16.features conv-layer indices, block by block
_CONV_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(rng: jax.Array) -> Dict:
    """Random-weight LPIPS tree (tests / structure reference)."""
    params: Dict = {}
    cin = 3
    n = 0
    for (cout, convs) in VGG16_PLAN:
        for _ in range(convs):
            rng, k1, k2 = jax.random.split(rng, 3)
            params[f"conv{n}"] = {
                "kernel": jax.random.normal(k1, (3, 3, cin, cout), jnp.float32)
                * (2.0 / (9 * cin)) ** 0.5,
                "bias": jnp.zeros((cout,), jnp.float32),
            }
            cin = cout
            n += 1
    for k, (cout, _) in enumerate(VGG16_PLAN):
        rng, k1 = jax.random.split(rng)
        params[f"lin{k}"] = {
            "kernel": jax.random.uniform(k1, (cout,), jnp.float32, 0.0, 0.1)
        }
    return params


def convert_lpips(sd: Mapping[str, np.ndarray]) -> Dict:
    """Torch state dict -> flax-style tree.

    Accepts torchvision keys ('features.{i}.weight') and/or lpips package
    keys ('net.slice{k}.{i}.weight'); lin heads as 'lin{k}.model.1.weight'
    (shape [1,C,1,1])."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def conv_weight(slice_idx: int, layer_idx: int) -> tuple:
        for key in (
            f"features.{layer_idx}",
            f"net.slice{slice_idx + 1}.{layer_idx}",
            f"net.net.slice{slice_idx + 1}.{layer_idx}",
        ):
            if key + ".weight" in sd:
                return sd[key + ".weight"], sd[key + ".bias"]
        raise KeyError(f"no VGG conv weight for features.{layer_idx}")

    params: Dict = {}
    n = 0
    for b, idxs in enumerate(_CONV_IDX):
        for i in idxs:
            w, bias = conv_weight(b, i)
            # torch OIHW -> flax HWIO
            params[f"conv{n}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": bias}
            n += 1
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in sd:
                params[f"lin{k}"] = {"kernel": sd[key].reshape(-1)}
                break
        else:
            raise KeyError(f"no lin head weight lin{k}")
    return jax.tree_util.tree_map(jnp.asarray, params)


def _vgg_taps(params: Dict, x: jnp.ndarray) -> list:
    """x NHWC (scaled) -> the five relu feature maps."""
    taps = []
    n = 0
    for b, (_, convs) in enumerate(VGG16_PLAN):
        for _ in range(convs):
            p = params[f"conv{n}"]
            x = jax.lax.conv_general_dilated(
                x, p["kernel"], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]
            x = jax.nn.relu(x)
            n += 1
        taps.append(x)
        if b < len(VGG16_PLAN) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return taps


def lpips(
    params: Dict, a: jnp.ndarray, b: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """Per-image LPIPS distance [B]. Inputs NHWC RGB; [0,1] when
    normalize=True (torchmetrics normalize=True), else already [-1,1]."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if normalize:
        a = 2.0 * a - 1.0
        b = 2.0 * b - 1.0
    shift = _SHIFT.reshape(1, 1, 1, 3)
    scale = _SCALE.reshape(1, 1, 1, 3)
    ta = _vgg_taps(params, (a - shift) / scale)
    tb = _vgg_taps(params, (b - shift) / scale)
    total = 0.0
    for k, (fa, fb) in enumerate(zip(ta, tb)):
        na = fa / (jnp.sqrt(jnp.sum(fa * fa, axis=-1, keepdims=True)) + 1e-10)
        nb = fb / (jnp.sqrt(jnp.sum(fb * fb, axis=-1, keepdims=True)) + 1e-10)
        diff = (na - nb) ** 2
        w = params[f"lin{k}"]["kernel"]  # [C]
        total = total + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
    return total


lpips_jit = jax.jit(lpips, static_argnames=("normalize",))
