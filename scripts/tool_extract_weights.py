#!/usr/bin/env python
"""Extract control / LoRA weights from a trained checkpoint
(reference: scripts/tool_extract_weights.py).

Accepts either an orbax TrainState directory produced by our trainers or a
torch .ckpt, and writes reference-format torch checkpoints:

  -t control          -> control_model.* base weights (no LoRA)
  -t lora             -> slot-0 LoRA + zero convs + norms (module key style)
  -t lora --from_base -> one LoRA ckpt per task/slot into a directory
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctrlora_tpu.utils.platform import ensure_platform_from_env

ensure_platform_from_env()


def load_control_tree(args):
    """Return (control_tree_np, cfg.control, tasks)."""
    from ctrlora_tpu.configs import (
        ctrlora_finetune_config, ctrlora_pretrain_config, load_model_config,
    )
    from ctrlora_tpu.pipeline import CtrLoraPipeline
    from ctrlora_tpu.utils import ckpt_torch as bridge

    if args.config:
        cfg = load_model_config(args.config)
    elif args.from_base:
        cfg = ctrlora_pretrain_config(lora_rank=args.lora_rank)
    else:
        cfg = ctrlora_finetune_config(lora_rank=args.lora_rank)
    pipe = CtrLoraPipeline(cfg)

    if os.path.isdir(args.ckpt):  # orbax TrainState
        import jax

        from ctrlora_tpu.configs import TrainConfig
        from ctrlora_tpu.training.train_state import create_train_state
        from ctrlora_tpu.training.trainer import restore_train_state

        params = pipe.init(jax.random.PRNGKey(0), image_size=8)
        state, _, _ = create_train_state(params, TrainConfig())
        state = restore_train_state(args.ckpt, state)
        control = bridge.tree_to_mutable(state.params.control)
    else:  # torch ckpt holding our exported or reference keys
        sd = bridge.load_torch_state_dict(args.ckpt)
        tree, _ = bridge.convert_tree(
            sd, bridge.controlnet_entries(cfg.control),
            prefix="control_model.", strict=False,
        )
        control = tree
        # also pull LoRA banks if present
        np_params = {"control": control}
        from ctrlora_tpu.utils.loading import load_lora_slot_into

        # ensure bank arrays exist before slot writes
        import jax

        full = bridge.tree_to_mutable(
            pipe.init(jax.random.PRNGKey(0), image_size=8).control
        )
        from ctrlora_tpu.utils.loading import _merge

        _merge(full, control)
        control = full
        for slot, task in enumerate(cfg.tasks or [None]):
            load_lora_slot_into(pipe, {"control": control}, sd, slot, task=task)
    return control, cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-t", "--type", required=True, choices=["control", "lora"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--from_base", action="store_true")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--slot", type=int, default=0)
    p.add_argument(
        "--tasks", type=str, nargs="+", default=None,
        help="slot->task names for --from_base output files; overrides the "
             "config's tasks (pass the same list given to "
             "train_ctrlora_pretrain.py --tasks)",
    )
    args = p.parse_args()

    import torch

    from ctrlora_tpu.utils import ckpt_torch as bridge

    control, cfg = load_control_tree(args)

    def save(d, path):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        torch.save({k: torch.from_numpy(v) for k, v in d.items()}, path)
        print(f"Extracted weights saved to {path}")

    if args.type == "control":
        save(bridge.export_control_base(control, cfg.control), args.save_path)
    elif args.from_base:
        os.makedirs(args.save_path, exist_ok=True)
        tasks = (args.tasks or cfg.tasks
                 or [f"slot{i}" for i in range(cfg.control.lora.n_loras)])
        assert len(tasks) == cfg.control.lora.n_loras, (
            f"{len(tasks)} task names for {cfg.control.lora.n_loras} LoRA slots"
        )
        for slot, task in enumerate(tasks):
            d = bridge.export_lora_slot(control, cfg.control, slot=slot)
            save(d, os.path.join(args.save_path, f"{task}.ckpt"))
    else:
        save(
            bridge.export_lora_slot(control, cfg.control, slot=args.slot),
            args.save_path,
        )
    print("Done.")


if __name__ == "__main__":
    main()
