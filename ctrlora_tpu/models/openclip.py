"""OpenCLIP text-tower bridge (reference: ldm/modules/encoders/modules.py:
134-186, FrozenOpenCLIPEmbedder on laion ViT-H-14, layer='penultimate').

No ctrlora config instantiates this encoder; it exists for surface parity
with the vendored SD codebase. The tower is architecturally our
CLIPTextModel with gelu activation and the 'penultimate' layer mode (23 of
24 blocks + ln_final); only the checkpoint naming differs — open_clip packs
q/k/v into `attn.in_proj_weight` and names blocks `transformer.resblocks.N`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.configs import CLIPTextConfig


def openclip_vith_text_config(layer: str = "penultimate") -> CLIPTextConfig:
    """laion/ViT-H-14 text tower (the reference's arch default)."""
    return CLIPTextConfig(
        vocab_size=49408, hidden_size=1024, intermediate_size=4096,
        num_layers=24, num_heads=16, max_length=77, layer=layer,
        hidden_act="gelu",
    )


def convert_openclip_text(sd: Dict[str, np.ndarray], cfg: CLIPTextConfig) -> Dict:
    """open_clip text-tower state dict -> CLIPTextModel params tree."""
    as32 = lambda k: np.asarray(sd[k], np.float32)
    p: Dict = {
        "token_embedding": jnp.asarray(as32("token_embedding.weight")),
        "position_embedding": jnp.asarray(as32("positional_embedding")),
        "final_layer_norm": {
            "scale": jnp.asarray(as32("ln_final.weight")),
            "bias": jnp.asarray(as32("ln_final.bias")),
        },
    }
    d = cfg.hidden_size
    for i in range(cfg.num_layers):
        t = f"transformer.resblocks.{i}"
        wqkv = as32(f"{t}.attn.in_proj_weight")  # [3d, d], rows q|k|v
        bqkv = as32(f"{t}.attn.in_proj_bias")
        attn = {}
        for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            attn[nm] = {
                "kernel": jnp.asarray(wqkv[j * d : (j + 1) * d].T),
                "bias": jnp.asarray(bqkv[j * d : (j + 1) * d]),
            }
        attn["out_proj"] = {
            "kernel": jnp.asarray(as32(f"{t}.attn.out_proj.weight").T),
            "bias": jnp.asarray(as32(f"{t}.attn.out_proj.bias")),
        }
        p[f"layer_{i}"] = {
            "self_attn": attn,
            "layer_norm1": {
                "scale": jnp.asarray(as32(f"{t}.ln_1.weight")),
                "bias": jnp.asarray(as32(f"{t}.ln_1.bias")),
            },
            "layer_norm2": {
                "scale": jnp.asarray(as32(f"{t}.ln_2.weight")),
                "bias": jnp.asarray(as32(f"{t}.ln_2.bias")),
            },
            "fc1": {
                "kernel": jnp.asarray(as32(f"{t}.mlp.c_fc.weight").T),
                "bias": jnp.asarray(as32(f"{t}.mlp.c_fc.bias")),
            },
            "fc2": {
                "kernel": jnp.asarray(as32(f"{t}.mlp.c_proj.weight").T),
                "bias": jnp.asarray(as32(f"{t}.mlp.c_proj.bias")),
            },
        }
    return {"params": p}
