"""Configuration dataclasses for the CtrLoRA-TPU framework.

The reference drives everything through OmegaConf YAML trees with `target:`
class paths (configs/*.yaml + ldm/util.py:72). Here the equivalent is plain
dataclasses with YAML loaders: configs stay declarative, but the set of
instantiable components is a registry of names rather than arbitrary import
paths.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import yaml


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    """Stacked LoRA adapter configuration for the control branch.

    n_loras == 0 means no LoRA params at all (vanilla / full finetune).
    The adapters live as a leading [n_loras, ...] axis on every LoRA site so
    that switching adapters is an integer gather, never a recompile
    (reference instead re-points python modules per batch:
    cldm/cldm_ctrlora_pretrain.py:68-75).
    """

    n_loras: int = 0
    rank: int = 128
    network_alpha: Optional[float] = None
    # Per-LoRA banks of zero-convs and transformer norms, used by the
    # switchable inference model (reference: cldm/cldm_ctrlora_inference.py:32-48).
    switchable_banks: bool = False


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD1.5 UNet / ControlNet trunk hyperparameters.

    Field semantics match the reference UNetModel
    (ldm/modules/diffusionmodules/openaimodel.py:412) with TPU-native
    defaults: NHWC layout, bfloat16 compute, fp32 norms.
    """

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: Optional[int] = 768
    dropout: float = 0.0
    use_checkpoint: bool = True  # rematerialization of res/transformer blocks
    dtype: str = "bfloat16"  # compute dtype; params are always fp32
    use_flash_attention: bool = True  # Pallas flash attention on TPU
    # IP-Adapter image-prompt cross attention (reference:
    # ldm/modules/attention_ip.py:196-289); number of image tokens appended
    # to the text context when > 0.
    ip_tokens: int = 0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    """Control branch = UNet encoder+middle with zero-conv output taps.

    hint_mode:
      'image'  — vanilla ControlNet: 8-conv hint encoder from 3ch pixels
                 (reference: cldm/cldm.py:147-163).
      'latent' — CtrLoRA: hint arrives VAE-encoded in latent space and feeds
                 the first conv directly; noisy x is NOT an input
                 (reference: cldm/cldm_ctrlora_pretrain.py:22,52-66).
    """

    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    hint_channels: int = 3
    hint_mode: str = "latent"
    lora: LoRAConfig = dataclasses.field(default_factory=LoRAConfig)
    # 'controlnet' (decoder-side residuals), 'lite' (attention-free branch,
    # encoder-side residuals; reference cldm/cldm_lite.py), or 'xs'
    # (two-stream cross infusion; reference cldm/cldm_xs.py)
    variant: str = "controlnet"
    # ControlNet-XS knobs (variant='xs'; reference configs/cnxs_sd15.yaml)
    control_model_ratio: float = 0.2
    infusion2control: Optional[str] = "cat"
    guiding: str = "encoder_double"
    learn_embedding: bool = False


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL (reference: ldm/models/autoencoder.py:13 + ddconfig)."""

    embed_dim: int = 4
    z_channels: int = 4
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_channels: int = 3
    double_z: bool = True
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """openai/clip-vit-large-patch14 text tower (reference:
    ldm/modules/encoders/modules.py:88)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # 'last' = final_layer_norm(hidden states); 'hidden' = intermediate layer
    # (clip-skip); 'pooled' = EOS pooled embedding; 'projected' = pooled @
    # text_projection (CLIPTextModelWithProjection, used by the style app's
    # negative-content embedding).
    layer: str = "last"
    layer_idx: Optional[int] = None
    hidden_act: str = "quick_gelu"  # openai CLIP; laion ViT-H uses 'gelu'
    projection_dim: Optional[int] = None
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """LatentDiffusion-level knobs (reference: configs/*.yaml model.params)."""

    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.00085
    linear_end: float = 0.012
    cosine_s: float = 8e-3
    scale_factor: float = 0.18215
    parameterization: str = "eps"  # 'eps' | 'x0' | 'v'
    v_posterior: float = 0.0
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    logvar_init: float = 0.0
    only_mid_control: bool = False
    global_average_pooling: bool = False
    sd_locked: bool = True


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full model tree: SD1.5 + control branch + frozen towers."""

    name: str = "ctrlora_sd15"
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    control: Optional[ControlNetConfig] = dataclasses.field(default_factory=ControlNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    clip: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    # task names for pretrain-style stacked LoRAs; index order == lora index
    tasks: Tuple[str, ...] = ()


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2  # torch.optim.AdamW default
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    batch_size: int = 4
    grad_accum: int = 1
    max_steps: int = 700_000
    # Which control-branch params train. 'all' (pretrain), 'lora' (finetune
    # with LoRA: lora + zero convs + transformer norms), 'full' (finetune
    # without LoRA). Reference rules: cldm/cldm_ctrlora_finetune.py:84-108.
    trainable: str = "all"
    norm_trainable: bool = True
    zero_trainable: bool = True
    sd_locked: bool = True
    prompt_dropout: float = 0.3
    # EMA of the trainable params (reference: ldm/modules/ema.py LitEma via
    # use_ema, hooked at ddpm.py:465-467; all shipped configs say False)
    use_ema: bool = False
    ema_decay: float = 0.9999
    # ZeRO-style optimizer-state sharding over the data mesh axis
    shard_opt_state: bool = False
    seed: int = 42
    log_every: int = 100
    ckpt_every: int = 10_000
    image_log_every: int = 1000


# ---------------------------------------------------------------------------
# Presets and YAML IO
# ---------------------------------------------------------------------------

MULTIGEN_TASKS = (
    "hed", "canny", "seg", "depth", "normal", "openpose", "hedsketch",
    "bbox", "outpainting",
)


def _unet(dtype: str = "bfloat16") -> UNetConfig:
    return UNetConfig(dtype=dtype)


def sd15_config() -> ModelConfig:
    """Vanilla SD1.5 + image-hint ControlNet (reference: configs/cldm_v15.yaml)."""
    return ModelConfig(
        name="cldm_v15",
        control=ControlNetConfig(hint_mode="image", lora=LoRAConfig(n_loras=0)),
    )


def cnxs_config() -> ModelConfig:
    """ControlNet-XS baseline (reference: configs/cnxs_sd15.yaml)."""
    return ModelConfig(
        name="cnxs_sd15",
        control=ControlNetConfig(
            hint_mode="image", lora=LoRAConfig(n_loras=0), variant="xs"
        ),
    )


def cnlite_config() -> ModelConfig:
    """ControlNet-Lite baseline (reference: configs/cnlite_sd15.yaml)."""
    return ModelConfig(
        name="cnlite_sd15",
        control=ControlNetConfig(
            hint_mode="image", lora=LoRAConfig(n_loras=0), variant="lite"
        ),
    )


def ctrlora_pretrain_config(
    tasks: Sequence[str] = MULTIGEN_TASKS, lora_rank: int = 128
) -> ModelConfig:
    """9-task Base ControlNet pretrain (reference:
    configs/ctrlora_pretrain_sd15_9tasks_rank128.yaml)."""
    return ModelConfig(
        name="ctrlora_pretrain",
        control=ControlNetConfig(
            hint_mode="latent",
            lora=LoRAConfig(n_loras=len(tasks), rank=lora_rank),
        ),
        tasks=tuple(tasks),
    )


def ctrlora_finetune_config(
    lora_rank: int = 128, ft_with_lora: bool = True
) -> ModelConfig:
    """Novel-condition finetune (reference: configs/ctrlora_finetune_sd15_rank*.yaml)."""
    return ModelConfig(
        name="ctrlora_finetune",
        control=ControlNetConfig(
            hint_mode="latent",
            lora=LoRAConfig(n_loras=1 if ft_with_lora else 0, rank=lora_rank),
        ),
    )


def ctrlora_inference_config(lora_num: int = 1, lora_rank: int = 128) -> ModelConfig:
    """Switchable N-LoRA inference model (reference:
    configs/inference/ctrlora_sd15_rank*_{1,2}lora*.yaml).

    Rematerialization is OFF here: there is no backward pass at inference,
    and jax.checkpoint barriers block XLA fusion inside the sampling scan.
    """
    unet = UNetConfig(use_checkpoint=False)
    return ModelConfig(
        name="ctrlora_inference",
        unet=unet,
        control=ControlNetConfig(
            unet=unet,
            hint_mode="latent",
            lora=LoRAConfig(n_loras=lora_num, rank=lora_rank, switchable_banks=True),
        ),
        # The VAE runs in bf16 here like everywhere else (VAEConfig's
        # default; a deliberate departure from the reference's fp32 torch
        # VAE): the on-chip A/B 2026-08-19 measured 4.061 vs 4.095 s/batch
        # on the headline, and decode error vs fp32 is ~1% of signal
        # (tests/test_models.py::test_vae_bf16_decode_matches_fp32) —
        # invisible in the 8-bit output. Train configs share the bf16
        # default: the frozen encoder's ~1e-2 relative latent error is
        # orders below the diffusion noise added at any trained timestep.
    )


def tiny_test_config(
    n_loras: int = 0, switchable_banks: bool = False, hint_mode: str = "latent"
) -> ModelConfig:
    """Miniature model for unit tests: same topology, tiny widths."""
    unet = UNetConfig(
        model_channels=32,
        channel_mult=(1, 2),
        num_res_blocks=1,
        attention_resolutions=(2,),
        num_heads=2,
        context_dim=64,
        dtype="float32",
        use_checkpoint=False,
        use_flash_attention=False,
    )
    return ModelConfig(
        name="tiny",
        unet=unet,
        control=ControlNetConfig(
            unet=unet,
            hint_mode=hint_mode,
            lora=LoRAConfig(n_loras=n_loras, rank=4, switchable_banks=switchable_banks),
        ),
        vae=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, dtype="float32"),
        clip=CLIPTextConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=2, max_length=16,
        ),
        tasks=tuple(f"task{i}" for i in range(n_loras)),
    )


_PRESETS = {
    "cldm_v15": sd15_config,
    "cnlite_sd15": cnlite_config,
    "cnxs_sd15": cnxs_config,
    "ctrlora_pretrain": ctrlora_pretrain_config,
    "ctrlora_finetune": ctrlora_finetune_config,
    "ctrlora_inference": ctrlora_inference_config,
    "tiny": tiny_test_config,  # CPU-sized model for tests/smoke runs
}


def _dataclass_from_dict(cls, d):
    if d is None:
        return None
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        ftype = fields[k].type
        target = {
            "unet": UNetConfig, "control": ControlNetConfig, "vae": VAEConfig,
            "clip": CLIPTextConfig, "diffusion": DiffusionConfig, "lora": LoRAConfig,
        }.get(k)
        if target is not None and isinstance(v, dict):
            v = _dataclass_from_dict(target, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def load_model_config(path_or_preset: str, **overrides) -> ModelConfig:
    """Load a ModelConfig from a preset name or a YAML file.

    YAML layout: `preset: <name>` plus nested overrides, or a full
    ModelConfig tree under `model:`.
    """
    if path_or_preset in _PRESETS:
        return _PRESETS[path_or_preset](**overrides)
    with open(path_or_preset) as f:
        raw = yaml.safe_load(f)
    if "preset" in raw:
        preset = raw.pop("preset")
        base = dataclasses.asdict(_PRESETS[preset]())
        _deep_update(base, raw.get("model", raw))
        return _dataclass_from_dict(ModelConfig, base)
    return _dataclass_from_dict(ModelConfig, raw.get("model", raw))


def _deep_update(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def save_model_config(cfg: ModelConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump({"model": dataclasses.asdict(cfg)}, f, sort_keys=False)
