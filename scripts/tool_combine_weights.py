#!/usr/bin/env python
"""Combine SD + Base ControlNet + LoRA into a single torch checkpoint for
ComfyUI-style deployment (reference: scripts/tool_combine_weights.py —
a plain dict union plus a zero logvar buffer)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sd_ckpt", default="./ckpts/sd15/v1-5-pruned.ckpt")
    p.add_argument("--base_ckpt", default="./ckpts/ctrlora-basecn/ctrlora_sd15_basecn700k.ckpt")
    p.add_argument("--lora_ckpt", required=True)
    p.add_argument("--save_path", required=True)
    args = p.parse_args()

    import torch

    from ctrlora_tpu.utils.ckpt_torch import load_torch_state_dict

    sd = {
        k: v for k, v in load_torch_state_dict(args.sd_ckpt).items()
        if not k.startswith("model_ema.")
    }
    base = load_torch_state_dict(args.base_ckpt)
    lora = load_torch_state_dict(args.lora_ckpt)

    ckpt = {}
    ckpt.update(sd)
    ckpt.update(base)
    ckpt.update(lora)
    out = {k: torch.from_numpy(v) for k, v in ckpt.items()}
    out["logvar"] = torch.zeros(1000)

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
    torch.save(out, args.save_path)
    print(f"Saved combined weights to [{args.save_path}]")


if __name__ == "__main__":
    main()
