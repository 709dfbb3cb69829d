"""Checkpoint composition: SD + Base ControlNet + per-slot LoRAs -> Params.

Replicates the reference's 3-stage partial load (api.py:27-62):
  1. SD checkpoint fills UNet + VAE + CLIP (strict=False there; here the
     mapped subtrees).
  2. Base-CN checkpoint fills control-branch base weights, skipping LoRA /
     zero-conv / norm keys (check_key filter).
  3. Each LoRA checkpoint fills bank slot i: lora matrices + that slot's
     zero convs and transformer norms (switchable banks).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.pipeline import CtrLoraPipeline, Params
from ctrlora_tpu.utils import ckpt_torch as bridge


def check_key(k: str) -> bool:
    """Keys belonging to a LoRA slot (reference: api.py:28-29)."""
    return (
        "lora_layer" in k or "zero_convs" in k or "middle_block_out" in k or "norm" in k
    )


def _to_np(tree):
    return bridge.tree_to_mutable(tree)


def load_sd_into(pipe: CtrLoraPipeline, params_np: dict, sd: dict) -> None:
    for sub, entries, prefix in (
        ("unet", bridge.unet_entries(pipe.cfg.unet, ip=pipe.cfg.unet.ip_tokens > 0),
         "model.diffusion_model."),
        ("vae", bridge.vae_entries(pipe.cfg.vae), "first_stage_model."),
        ("clip", bridge.clip_entries(pipe.cfg.clip),
         "cond_stage_model.transformer.text_model."),
    ):
        tree, missing = bridge.convert_tree(sd, entries, prefix=prefix, strict=False)
        _merge(params_np[sub], tree)


def load_basecn_into(
    pipe: CtrLoraPipeline, params_np: dict, sd: dict, skip: str = "slots"
) -> None:
    """skip='slots': inference rule — skip LoRA + zero convs + norms (they
    come from the per-slot LoRA files; reference api.py:52-53).
    skip='lora': finetune-init rule — copy everything except LoRA keys
    (reference train_ctrlora_finetune.py:95-103)."""
    pfx = "control_model."
    if skip == "slots":
        keep = lambda k: not check_key(k)
    elif skip == "lora":
        keep = lambda k: "lora" not in k
    else:
        raise ValueError(skip)
    sd = {k: v for k, v in sd.items() if k.startswith(pfx) and keep(k[len(pfx):])}
    if pipe.cfg.control.variant == "lite":
        from ctrlora_tpu.models.lite import lite_entries

        entries = lite_entries(pipe.cfg.control.unet, pipe.cfg.control.hint_channels)
    else:
        entries = bridge.controlnet_entries(pipe.cfg.control)
    tree, _ = bridge.convert_tree(sd, entries, prefix=pfx, strict=False)
    _merge(params_np["control"], tree)


def load_lora_slot_into(
    pipe: CtrLoraPipeline, params_np: dict, sd: dict, slot: int,
    task: Optional[str] = None,
) -> int:
    sd = {k: v for k, v in sd.items() if k.startswith("control_model.")}
    style = "module"
    if any(".loras_dict." in k for k in sd):
        style = "dict"
    used = bridge.load_lora_bank(
        sd, pipe.cfg.control, params_np["control"], slot,
        key_style=style, task=task,
    )
    used += bridge.load_switchable_bank(sd, pipe.cfg.control, params_np["control"], slot)
    return len(used)


def _merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst.setdefault(k, {}), v)
        else:
            if k in dst and np.shape(dst[k]) != np.shape(v):
                raise ValueError(
                    f"shape mismatch for {k}: {np.shape(dst[k])} vs {np.shape(v)}"
                )
            dst[k] = np.asarray(v, np.float32)


def load_ctrlora(
    pipe: CtrLoraPipeline,
    sd_file: Optional[str] = None,
    basecn_file: Optional[str] = None,
    lora_files: Sequence[str] = (),
    tasks: Optional[Sequence[str]] = None,
    seed: int = 0,
    basecn_skip: str = "slots",
) -> Params:
    """Build Params from torch checkpoint files (any may be None to keep the
    random init for that stage)."""
    import jax

    params = pipe.init(jax.random.PRNGKey(seed), image_size=8)
    np_params = {
        "unet": _to_np(params.unet),
        "control": _to_np(params.control) if params.control is not None else None,
        "vae": _to_np(params.vae),
        "clip": _to_np(params.clip),
    }
    if sd_file:
        load_sd_into(pipe, np_params, bridge.load_torch_state_dict(sd_file))
    if basecn_file:
        load_basecn_into(
            pipe, np_params, bridge.load_torch_state_dict(basecn_file),
            skip=basecn_skip,
        )
    for i, lf in enumerate(lora_files):
        n = load_lora_slot_into(
            pipe, np_params, bridge.load_torch_state_dict(lf), i,
            task=tasks[i] if tasks else None,
        )
        if n == 0:
            raise ValueError(f"no LoRA keys found in {lf}")
    to_jax = lambda t: jax.tree_util.tree_map(jnp.asarray, t) if t is not None else None
    return Params(
        to_jax(np_params["unet"]), to_jax(np_params["control"]),
        to_jax(np_params["vae"]), to_jax(np_params["clip"]),
    )
