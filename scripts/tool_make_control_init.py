#!/usr/bin/env python
"""Initialize a ControlNet from the SD UNet encoder
(reference: scripts/tool_make_control_init.py — keys 'control_<name>' copy
from 'model.diffusion_<name>'; newly-added layers — zero convs, hint block —
keep fresh init).

Writes a torch checkpoint with control_model.* keys usable by the trainers.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sd_ckpt", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--hint_mode", choices=["latent", "image"], default="latent")
    args = p.parse_args()

    import jax
    import torch

    from ctrlora_tpu.configs import ControlNetConfig, LoRAConfig
    from ctrlora_tpu.models.unet import ControlNet
    from ctrlora_tpu.utils import ckpt_torch as bridge
    import jax.numpy as jnp

    cfg = ControlNetConfig(hint_mode=args.hint_mode, lora=LoRAConfig(n_loras=0))
    sd = bridge.load_torch_state_dict(args.sd_ckpt)

    # fresh control params for the newly-added layers
    cn = ControlNet(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, cfg.unet.context_dim))
    kwargs = {}
    if args.hint_mode == "image":
        kwargs["hint"] = jnp.zeros((1, 64, 64, cfg.hint_channels))
    params = cn.init(jax.random.PRNGKey(0), x, t, ctx, **kwargs)
    tree = bridge.tree_to_mutable(params)

    # copy encoder+middle weights from the SD UNet (control_<x> <- model.diffusion_<x>)
    enc_entries = bridge.unet_entries(cfg.unet, decoder=False)
    copied, new = 0, []
    src, _ = bridge.convert_tree(
        sd, enc_entries, prefix="model.diffusion_model.", strict=False
    )
    from ctrlora_tpu.utils.loading import _merge

    _merge(tree, src)
    out = bridge.export_tree(tree, bridge.controlnet_entries(cfg), prefix="control_model.")
    for tkey, _, _ in bridge.controlnet_entries(cfg):
        if "model.diffusion_model." + tkey not in sd:
            new.append(tkey)
    for k in new:
        print(f"These weights are newly added: control_model.{k}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output_path)), exist_ok=True)
    torch.save({k: torch.from_numpy(v) for k, v in out.items()}, args.output_path)
    print("Done.")


if __name__ == "__main__":
    main()
