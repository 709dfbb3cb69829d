"""ctrlora-tpu: TPU-native CtrLoRA — controllable Stable Diffusion with a
Base ControlNet and switchable per-condition LoRA adapters, in JAX/Flax/Pallas.
"""

__version__ = "0.1.0"

from ctrlora_tpu.configs import (  # noqa: F401
    CLIPTextConfig, ControlNetConfig, DiffusionConfig, LoRAConfig, ModelConfig,
    TrainConfig, UNetConfig, VAEConfig, cnlite_config, cnxs_config,
    ctrlora_finetune_config, ctrlora_inference_config, ctrlora_pretrain_config,
    load_model_config, sd15_config, tiny_test_config,
)
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline, Params  # noqa: F401


def __getattr__(name):
    # lazy heavy imports
    if name == "CtrLoRA":
        from ctrlora_tpu.api import CtrLoRA

        return CtrLoRA
    if name == "StyleCtrLoRA":
        from ctrlora_tpu.style import StyleCtrLoRA

        return StyleCtrLoRA
    raise AttributeError(name)
