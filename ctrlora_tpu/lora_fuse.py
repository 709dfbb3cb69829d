"""LoRA fusion: fold adapter deltas into the base weights for inference.

W_fused = W + scale * down[slot] @ up[slot]   (reference runtime instead
computes base(x) + up(down(x)) on every call, cldm/lora.py:285-291; its
_fuse_lora exists but is never used on the hot path).

At rank 128 the unfused path adds rank*(in+out) MACs per site — up to ~80%
extra FLOPs on the 320-wide linears — so fusing is a large inference win.
Fusion also selects the slot's zero-conv/norm banks, producing a control
tree for a lora-free config: the jitted sampler then contains zero LoRA ops.

For multi-LoRA inference each condition gets its own fused control tree
(params are per-Conditioning, still one compiled function).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.configs import ControlNetConfig, LoRAConfig


def _is_lora_site(node: dict) -> bool:
    return isinstance(node, dict) and "lora_down" in node and "kernel" in node


def fuse_control_tree(
    control_tree: Dict,
    slot: int,
    lora: LoRAConfig,
    lora_scale: float = 1.0,
    dtype=None,
) -> Dict:
    """Return a new control tree with slot `slot` folded in and all stacked
    lora/bank axes removed. Works on jnp or np trees."""
    alpha = (lora.network_alpha / lora.rank) if lora.network_alpha else 1.0
    scale = lora_scale * alpha

    def fuse(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = fuse(v)
            else:
                out[k] = v
        if "lora_down" in out and "kernel" in out:
            down = jnp.asarray(out.pop("lora_down"))[slot]
            up = jnp.asarray(out.pop("lora_up"))[slot]
            kernel = jnp.asarray(out["kernel"])
            out["kernel"] = (kernel + scale * (down @ up)).astype(kernel.dtype)
        # switchable banks: zero convs [n,1,1,ci,co]/[n,co], norms [n,c]
        for name in ("kernel", "bias", "scale"):
            v = out.get(name)
            if v is None or isinstance(v, dict):
                continue
            expected = {"kernel": (4,), "bias": (1,), "scale": (1,)}[name]
            if v.ndim == expected[0] + 1 and lora.switchable_banks:
                out[name] = jnp.asarray(v)[slot]
        return out

    fused = fuse(control_tree)
    if dtype is not None:
        fused = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "astype") else x, fused
        )
    return fused


def assert_fused_structure(tree: Any) -> None:
    """Reject a control override tree that still carries runtime-LoRA leaves.

    Flax's apply silently ignores extra `lora_down`/`lora_up` collections, so
    passing an UNFUSED tree as `Conditioning.control_params` would silently
    drop the LoRA deltas instead of erroring. Overrides must come from
    `fuse_control_tree`."""
    bad = []

    def walk(path, node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("lora_down", "lora_up"):
                    bad.append(f"{path}/{k}")
                else:
                    walk(f"{path}/{k}", v)

    walk("", tree)
    if bad:
        raise ValueError(
            "Conditioning.control_params must be a FUSED tree (lora_fuse."
            "fuse_control_tree); got runtime-LoRA leaves "
            + ", ".join(bad[:3])
            + (" ..." if len(bad) > 3 else "")
        )


def fused_control_config(cfg: ControlNetConfig) -> ControlNetConfig:
    """Config for the fused tree: no LoRA params, no banks."""
    return dataclasses.replace(cfg, lora=LoRAConfig(n_loras=0))


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Cast weight matrices/kernels to the compute dtype once (instead of
    per-use casts of fp32 masters inside the sampling scan); norm affines
    stay fp32 (they are applied in fp32 anyway)."""

    def cast(path, x):
        names = [getattr(p, "key", "") for p in path]
        leaf = names[-1] if names else ""
        if leaf in ("kernel",) and hasattr(x, "astype"):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, params)
