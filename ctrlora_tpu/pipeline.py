"""CtrLoRA pipeline: the functional equivalent of the reference's LDM tree.

The reference composes LatentDiffusion subclasses holding live torch modules
(ControlLDM / ControlPretrainLDM / ControlFinetuneLDM / ControlInferenceLDM,
cldm/cldm*.py). Here the same roles collapse into one functional bundle:

  * modules are static Flax definitions,
  * weights live in a `Params` pytree (unet / control / vae / clip),
  * `apply_model` covers every variant through data, not subclassing:
      - no control (plain SD) when hint is None,
      - image-hint vanilla ControlNet (cfg.control.hint_mode == 'image'),
      - latent-hint CtrLoRA with per-call `lora_idx` (pretrain/finetune),
      - multi-condition weighted control sums (inference with N LoRAs,
        reference cldm/cldm_ctrlora_inference.py:156-178).

Everything is jit-compatible; LoRA/task switching is a traced integer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ctrlora_tpu.configs import ModelConfig
from ctrlora_tpu.models.clip import CLIPTextModel
from ctrlora_tpu.models.unet import ControlNet, UNet
from ctrlora_tpu.models.vae import AutoencoderKL, sample_posterior
from ctrlora_tpu.schedules import DiffusionSchedule, make_schedule
from ctrlora_tpu.utils.tokenizer import default_tokenizer


class Params(NamedTuple):
    unet: Any
    control: Any  # None when the model has no control branch
    vae: Any
    clip: Any


@dataclasses.dataclass(frozen=True)
class Conditioning:
    """One control condition: a latent (or pixel) hint plus its adapter index
    and blend weight. Multi-LoRA inference passes several of these.

    control_params: optional override tree for the control branch — used by
    the LoRA-fused inference path where each condition carries its own fused
    weights (see lora_fuse.py). Must match the pipeline's control module
    structure.
    """

    hint: jnp.ndarray  # latent-mode: [B,h,w,4] VAE-encoded; image-mode: [B,H,W,3]
    lora_idx: Optional[jnp.ndarray] = None  # int32 scalar
    weight: float = 1.0
    control_params: Optional[Any] = None


class CtrLoraPipeline:
    """Static module bundle + schedule. All methods are pure functions of
    (params, inputs) and safe to close over in jit."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.unet = UNet(cfg.unet)
        self.control = None
        self.control_mode = "decoder"
        self.xs_unet = None
        if cfg.control is not None:
            if cfg.control.variant == "xs":
                from ctrlora_tpu.models.xs import XSUNet

                self.xs_unet = XSUNet(
                    cfg.unet,
                    hint_channels=cfg.control.hint_channels,
                    control_model_ratio=cfg.control.control_model_ratio,
                    infusion2control=cfg.control.infusion2control,
                    guiding=cfg.control.guiding,
                    learn_embedding=cfg.control.learn_embedding,
                )
            elif cfg.control.variant == "lite":
                from ctrlora_tpu.models.lite import ControlNetLite

                self.control = ControlNetLite(
                    cfg.control.unet, hint_channels=cfg.control.hint_channels
                )
                self.control_mode = "encoder"
            else:
                self.control = ControlNet(cfg.control)
        # module for LoRA-fused per-condition control params (lora_fuse.py)
        self.fused_control = None
        if (
            cfg.control is not None
            and cfg.control.variant != "lite"
            and cfg.control.lora.n_loras > 0
        ):
            from ctrlora_tpu.lora_fuse import fused_control_config

            self.fused_control = ControlNet(fused_control_config(cfg.control))
        self.vae = AutoencoderKL(cfg.vae)
        self.clip = CLIPTextModel(cfg.clip)
        self.schedule: DiffusionSchedule = make_schedule(
            beta_schedule=cfg.diffusion.beta_schedule,
            timesteps=cfg.diffusion.timesteps,
            linear_start=cfg.diffusion.linear_start,
            linear_end=cfg.diffusion.linear_end,
            cosine_s=cfg.diffusion.cosine_s,
            v_posterior=cfg.diffusion.v_posterior,
            parameterization=cfg.diffusion.parameterization,
        )
        self.n_control_taps = None
        if self.control is not None:
            from ctrlora_tpu.models.unet import encoder_plan

            self.n_control_taps = len(encoder_plan(cfg.control.unet)[0]) + 1

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, image_size: int = 64) -> Params:
        """Random-init all parameter trees (tiny shapes are fine: params are
        shape-independent)."""
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        s = image_size
        x = jnp.zeros((1, s, s, self.cfg.unet.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, self.cfg.clip.max_length, self.cfg.clip.hidden_size))
        if self.xs_unet is not None:
            hint = jnp.zeros((1, s * 8, s * 8, self.cfg.control.hint_channels))
            unet_params = self.xs_unet.init(r1, x, t, ctx, hint=hint)
        else:
            unet_params = self.unet.init(r1, x, t, ctx)
        control_params = None
        if self.control is not None:
            if self.cfg.control.variant == "lite":
                hint = jnp.zeros((1, s * 8, s * 8, self.cfg.control.hint_channels))
                control_params = self.control.init(r2, x, t, ctx, hint=hint)
            elif self.cfg.control.hint_mode == "image":
                hint = jnp.zeros((1, s * 8, s * 8, self.cfg.control.hint_channels))
                control_params = self.control.init(
                    r2, x, t, ctx, hint=hint, lora_idx=jnp.int32(0)
                )
            else:
                control_params = self.control.init(r2, x, t, ctx, lora_idx=jnp.int32(0))
        vae_params = self.vae.init(
            r3, jnp.zeros((1, s * 8, s * 8, self.cfg.vae.in_channels))
        )
        clip_params = self.clip.init(
            r4, jnp.zeros((1, self.cfg.clip.max_length), jnp.int32)
        )
        return Params(unet_params, control_params, vae_params, clip_params)

    # ------------------------------------------------------------------
    # frozen towers
    # ------------------------------------------------------------------
    def encode_first_stage(
        self, params: Params, img: jnp.ndarray, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """img in [-1, 1] NHWC -> scaled latent z (reference:
        ddpm.py:655-662: z = scale_factor * posterior.sample())."""
        mean, logvar = self.vae.apply(params.vae, img, method=AutoencoderKL.encode)
        z = mean if rng is None else sample_posterior(mean, logvar, rng)
        return self.cfg.diffusion.scale_factor * z

    def first_stage_from_moments(
        self, moments: jnp.ndarray, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """encode_first_stage from precomputed posterior moments
        (mean | logvar concatenated on channels — training/latent_cache.py).
        Same sampling + scaling semantics as the pixel path."""
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean if rng is None else sample_posterior(mean, logvar, rng)
        return self.cfg.diffusion.scale_factor * z

    def decode_first_stage(self, params: Params, z: jnp.ndarray) -> jnp.ndarray:
        return self.vae.apply(
            params.vae, z / self.cfg.diffusion.scale_factor, method=AutoencoderKL.decode
        )

    def encode_text_tokens(self, params: Params, token_ids: jnp.ndarray) -> jnp.ndarray:
        L = self.cfg.clip.max_length
        if token_ids.shape[1] == L:
            return self.clip.apply(params.clip, token_ids)
        # windowed 'clip hack' (cldm/hack.py:32-68): encode each 77-window
        outs = [
            self.clip.apply(params.clip, token_ids[:, i * L : (i + 1) * L])
            for i in range(token_ids.shape[1] // L)
        ]
        return jnp.concatenate(outs, axis=1)

    def encode_text_cond_uncond(
        self, params: Params, token_ids: jnp.ndarray, uncond_ids: jnp.ndarray
    ):
        """Encode the CFG pair as ONE batched CLIP call (the two encodes are
        the same graph; batching halves the launch count and doubles the
        per-matmul batch in the prep phase)."""
        both = self.encode_text_tokens(
            params, jnp.concatenate([token_ids, uncond_ids], axis=0)
        )
        b = token_ids.shape[0]
        return both[:b], both[b:]

    def encode_text(self, params: Params, prompts: Sequence[str], windows: int = 1):
        """Host-side helper: tokenize + encode (not jittable)."""
        ids = default_tokenizer()(prompts, windows=windows)
        if int(ids.max()) >= self.cfg.clip.vocab_size:
            raise ValueError(
                f"tokenizer produced id {int(ids.max())} >= model vocab "
                f"{self.cfg.clip.vocab_size}; config/tokenizer mismatch"
            )
        return self.encode_text_tokens(params, jnp.asarray(ids))

    # ------------------------------------------------------------------
    # the denoiser
    # ------------------------------------------------------------------
    def emb_proj_tables(
        self,
        params: Params,
        timesteps: jnp.ndarray,  # [S] int32, in sampling order
        conds: Optional[Sequence[Conditioning]] = None,
    ) -> Optional[dict]:
        """Precompute every t-dependent projection for a batch of S steps.

        Samplers use a batch-uniform timestep per step, so the TimestepEmbed
        MLP and all per-ResBlock emb_proj Linears depend only on the step
        index — but inside a lax.scan XLA cannot hoist them (t is dynamic),
        and the ~35 latency-bound in-loop kernels cost ~23 ms/step on TPU
        (perf/step_glue.py bisect: const-t 69.2 vs dyn-t 91.9 ms/step).
        Computing them here for all S steps at once and gathering one [C]
        row per step removes that cost.

        Returns {'unet': {block: [S, C]}, 'control': (per-cond dict, ...)},
        or None when the variant has no hoistable structure (lite/xs).
        Numerical identity with the in-loop path is by construction: the
        same Dense/TimestepEmbed modules run on the same param subtrees.
        """
        if self.xs_unet is not None or self.control_mode == "encoder":
            return None
        from flax import linen as nn

        from ctrlora_tpu.models.layers import Dense, TimestepEmbed

        def branch_tables(tree, model_channels, dtype, lora_cfg, lora_idx):
            has_lora = "lora_down" in tree["time_embed"]["dense0"]
            temb = TimestepEmbed(
                model_channels, dtype=dtype, lora=lora_cfg if has_lora else None
            ).apply({"params": tree["time_embed"]}, timesteps, lora_idx)
            x = nn.silu(temb)
            rows = {}
            for name, sub in tree.items():
                if not hasattr(sub, "keys") or "emb_proj" not in sub:
                    continue
                p = sub["emb_proj"]
                lcfg = lora_cfg if "lora_down" in p else None
                rows[name] = Dense(
                    p["kernel"].shape[-1], dtype=dtype, lora=lcfg
                ).apply({"params": p}, x, lora_idx)
            return rows

        ucfg = self.cfg.unet
        out = {
            "unet": branch_tables(
                params.unet["params"], ucfg.model_channels, ucfg.compute_dtype,
                None, None,
            ),
            "control": (),
        }
        if conds:
            ccfg = self.cfg.control
            lora = ccfg.lora if ccfg.lora.n_loras > 0 else None
            ctables = []
            for cond in conds:
                cparams = cond.control_params
                if cparams is None:
                    cparams = params.control
                ctables.append(
                    branch_tables(
                        cparams["params"], ccfg.unet.model_channels,
                        ccfg.unet.compute_dtype, lora, cond.lora_idx,
                    )
                )
            out["control"] = tuple(ctables)
        return out

    def xattn_kv_tables(
        self,
        params: Params,
        context: jnp.ndarray,  # [B, Sk, D], already CFG-stacked if applicable
        conds: Optional[Sequence[Conditioning]] = None,
    ) -> Optional[dict]:
        """Precompute every cross-attention site's fused K|V projection of
        the text context for a sampler scan.

        The context is loop-invariant across the S denoising steps, so the
        `ctx @ [wk|wv]` dot at each of the ~23 transformer sites (UNet 16 +
        ControlNet 7) reruns identical work every step inside the scan — XLA
        cannot hoist it because the surrounding while-loop carries x. This
        computes the exact same fused dot once per site up front; the scan
        closes over the results as loop constants (CrossAttention consumes
        them via `kv` and skips its in-loop projection).

        Returns {'unet': {site: (kv_block0, ...)}, 'control': (per-cond
        dict or None, ...)}, or None when the variant has no hoistable sites
        (lite/xs) or the UNet context carries IP-adapter tokens (the unet
        branch then sees a different, concatenated context). A branch whose
        attn k/v carry runtime-LoRA params (nofuse path) gets None — its
        projections stay in-loop.
        """
        if self.xs_unet is not None or self.control_mode == "encoder":
            return None
        if self.cfg.unet.ip_tokens:
            return None

        def branch(tree, dtype):
            ctx = context.astype(dtype)
            out = {}
            for name, sub in tree.items():
                if not (name.endswith("_attn") and hasattr(sub, "keys")):
                    continue
                rows = []
                i = 0
                while f"block_{i}" in sub:
                    a2 = sub[f"block_{i}"]["attn2"]
                    if "lora_down" in a2["to_k"]:
                        return None
                    wkv = jnp.concatenate(
                        [a2["to_k"]["kernel"], a2["to_v"]["kernel"]], axis=1
                    )
                    rows.append(jnp.dot(ctx, wkv.astype(dtype)))
                    i += 1
                out[name] = tuple(rows)
            return out

        unet_kv = branch(params.unet["params"], self.cfg.unet.compute_dtype)
        ctables = []
        if conds:
            cdt = self.cfg.control.unet.compute_dtype
            for cond in conds:
                cparams = cond.control_params
                if cparams is None:
                    cparams = params.control
                ctables.append(branch(cparams["params"], cdt))
        return {"unet": unet_kv, "control": tuple(ctables)}

    def apply_control(
        self,
        params: Params,
        x_noisy: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        conds: Sequence[Conditioning],
        control_scales: Optional[jnp.ndarray] = None,
        emb_rows: Optional[Sequence[dict]] = None,  # per cond, emb_proj_tables rows
        kv_rows: Optional[Sequence[dict]] = None,  # per cond, xattn_kv_tables
    ) -> Tuple[jnp.ndarray, ...]:
        """Run the control branch for each condition and blend residuals
        (reference: cldm_ctrlora_inference.py:166-176)."""
        assert self.control is not None
        n = self.n_control_taps
        if control_scales is None:
            control_scales = jnp.ones((n,), jnp.float32)
        total = None
        for j, cond in enumerate(conds):
            rows = emb_rows[j] if emb_rows is not None else None
            kvr = kv_rows[j] if kv_rows is not None else None
            cparams = cond.control_params
            control_module = self.control
            if cparams is not None and self.fused_control is not None:
                from ctrlora_tpu.lora_fuse import assert_fused_structure

                assert_fused_structure(cparams)
                control_module = self.fused_control
            elif cparams is None:
                cparams = params.control
            if self.cfg.control.variant == "lite":
                taps = control_module.apply(
                    cparams, x_noisy, t, context, hint=cond.hint
                )
            elif self.cfg.control.hint_mode == "image":
                taps = control_module.apply(
                    cparams, x_noisy, t, context,
                    hint=cond.hint, lora_idx=cond.lora_idx, emb_rows=rows,
                    kv_rows=kvr,
                )
            else:
                taps = control_module.apply(
                    cparams, cond.hint, t, context, lora_idx=cond.lora_idx,
                    emb_rows=rows, kv_rows=kvr,
                )
            taps = [c * control_scales[i] * cond.weight for i, c in enumerate(taps)]
            if self.cfg.diffusion.global_average_pooling:
                taps = [jnp.mean(c, axis=(1, 2), keepdims=True) for c in taps]
            total = taps if total is None else [a + b for a, b in zip(total, taps)]
        return tuple(total)

    def apply_model(
        self,
        params: Params,
        x_noisy: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        conds: Optional[Sequence[Conditioning]] = None,
        control_scales: Optional[jnp.ndarray] = None,
        ip_context: Optional[jnp.ndarray] = None,
        control_batch_mask: Optional[jnp.ndarray] = None,
        emb_rows: Optional[dict] = None,
        kv_rows: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Predict model output (eps by default) for noisy latents.

        ip_context [B, ip_tokens, D]: image-prompt tokens appended to the
        UNet's cross-attention context only — the control branch sees just
        the text context (reference: cldm_ctrlora_style_inference.py:163-187).
        control_batch_mask [B]: per-example control on/off — guess mode runs
        the uncond half of a CFG batch without control (reference:
        app/gradio_ctrlora.py:308 un_cond c_concat=None).
        emb_rows: one step's rows from emb_proj_tables (timestep must be
        batch-uniform and equal the t this table row was built for).
        kv_rows: xattn_kv_tables output — hoisted cross-attn K|V projections
        of this exact `context` (and per-cond control branches).
        """
        if self.xs_unet is not None:
            # ControlNet-XS: one fused two-stream forward
            hint = conds[0].hint if conds else None
            return self.xs_unet.apply(
                params.unet, x_noisy, t, context, hint=hint,
                no_control=not conds,
            )
        control = None
        if conds:
            control = self.apply_control(
                params, x_noisy, t, context, conds, control_scales,
                emb_rows=emb_rows["control"] if emb_rows is not None else None,
                kv_rows=kv_rows["control"] if kv_rows is not None else None,
            )
            if control_batch_mask is not None:
                m = control_batch_mask.reshape(-1, 1, 1, 1)
                control = tuple(c * m.astype(c.dtype) for c in control)
        if ip_context is not None:
            assert self.cfg.unet.ip_tokens == ip_context.shape[1], (
                f"unet expects {self.cfg.unet.ip_tokens} ip tokens"
            )
            context = jnp.concatenate([context, ip_context.astype(context.dtype)], axis=1)
        return self.unet.apply(
            params.unet, x_noisy, t, context,
            control=control, only_mid_control=self.cfg.diffusion.only_mid_control,
            control_mode=self.control_mode,
            emb_rows=emb_rows["unet"] if emb_rows is not None else None,
            kv_rows=kv_rows["unet"] if kv_rows is not None else None,
        )
