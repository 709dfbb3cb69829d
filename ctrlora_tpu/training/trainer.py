"""Training loop: mesh setup, metrics logging, periodic checkpoints and
image logging.

Covers what the reference delegates to PyTorch Lightning + callbacks
(pl.Trainer in scripts/train_ctrlora_*.py, ImageLogger/CheckpointEveryNSteps
in cldm/logger.py): step loop, loss logging, step-frequency checkpointing
(params + optimizer state via orbax), and periodic sample grids.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.configs import TrainConfig
from ctrlora_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ctrlora_tpu.pipeline import Conditioning, CtrLoraPipeline
from ctrlora_tpu.training.step import make_train_step
from ctrlora_tpu.training.train_state import TrainState, count_trainable, create_train_state


class Trainer:
    def __init__(
        self,
        pipe: CtrLoraPipeline,
        cfg: TrainConfig,
        workdir: str,
        params=None,
        use_mesh: bool = True,
        tp: int = 1,
    ):
        """``tp > 1`` trains over a 2-D ``(data, model)`` mesh: batch sharded
        on ``data``, attention heads / GEGLU hidden sharded on ``model``
        (parallel/tp.py). Requires tp | device_count; the reference has no
        tensor parallelism at all (Lightning DDP only)."""
        self.pipe = pipe
        self.cfg = cfg
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        os.makedirs(os.path.join(workdir, "image_log"), exist_ok=True)
        if params is None:
            params = pipe.init(jax.random.PRNGKey(cfg.seed))
        else:
            # own a copy: the donating train step consumes the state's
            # buffers, which would invalidate the caller's `params` tree
            params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            )
        is_xs = pipe.cfg.control is not None and pipe.cfg.control.variant == "xs"
        self.state, self.tx, self.mask = create_train_state(params, cfg, xs=is_xs)
        self.step_fn = make_train_step(pipe, self.tx, cfg, mask=self.mask)
        self.tp = int(tp)
        if self.tp > 1:
            from ctrlora_tpu.parallel.tp import create_mesh_2d

            ndev = jax.device_count()
            if ndev % self.tp != 0:
                raise ValueError(
                    f"--tp {self.tp} does not divide {ndev} devices"
                )
            self.mesh = create_mesh_2d(ndev // self.tp, self.tp)
        else:
            self.mesh = create_mesh() if use_mesh else None
        if self.mesh is not None:
            if cfg.shard_opt_state:
                # ZeRO-style: replicate params (forward stays gather-free),
                # shard the Adam moments — the largest training buffers —
                # over the data axis
                from ctrlora_tpu.parallel.mesh import shard_largest_axis

                self.state = self.state._replace(
                    step=replicate(self.mesh, self.state.step),
                    params=replicate(self.mesh, self.state.params),
                    opt_state=shard_largest_axis(self.mesh, self.state.opt_state),
                    ema=replicate(self.mesh, self.state.ema),
                )
            else:
                self.state = replicate(self.mesh, self.state)
        n_train = count_trainable(self.state.params, self.mask)
        self._log_host(
            {"event": "init", "trainable_params_m": round(n_train / 1e6, 2),
             "devices": jax.device_count()}
        )
        # trainable-params audit file (reference writes ./tmp/*_trainable_params.txt,
        # cldm_ctrlora_finetune.py:87)
        with open(os.path.join(workdir, "trainable_params.txt"), "w") as f:
            for path, m in jax.tree_util.tree_leaves_with_path(self.mask):
                if m:
                    f.write(jax.tree_util.keystr(path) + "\n")

    def _tp_scope(self):
        """Trace-time TP context: sharding constraints + XLA kernel paths
        are applied to functions *traced* inside it (first step only; later
        steps hit the jit cache), so it must wrap every step call."""
        if self.tp > 1:
            from ctrlora_tpu.parallel.tp import tensor_parallel

            return tensor_parallel(self.mesh)
        import contextlib

        return contextlib.nullcontext()

    def _log_host(self, d: dict) -> None:
        if jax.process_index() != 0:
            return
        d.setdefault("time", round(time.time(), 2))
        line = json.dumps(d)
        print(line, flush=True)
        with open(os.path.join(self.workdir, "metrics.jsonl"), "a") as f:
            f.write(line + "\n")

    # ------------------------------------------------------------------
    def fit(
        self,
        batches: Iterable[dict],
        max_steps: Optional[int] = None,
        sample_hook: Optional[Callable[[TrainState, int], None]] = None,
    ) -> TrainState:
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        rng = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.perf_counter()
        window = []
        for batch in batches:
            step = int(self.state.step)
            if step >= max_steps:
                break
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            with self._tp_scope():
                self.state, metrics = self.step_fn(self.state, batch, rng)
            window.append(metrics)
            step += 1
            if step % cfg.log_every == 0:
                m = {
                    k: round(float(np.mean([float(w[k]) for w in window])), 5)
                    for k in window[0]
                }
                dt = time.perf_counter() - t0
                self._log_host(
                    {"event": "train", "step": step,
                     "steps_per_sec": round(len(window) / dt, 3), **m}
                )
                window, t0 = [], time.perf_counter()
            if step % cfg.ckpt_every == 0:
                self.save(step)
            if sample_hook is not None and step % cfg.image_log_every == 0:
                sample_hook(self.state, step, batch)
        return self.state

    # ------------------------------------------------------------------
    def eval_params(self):
        """Params for evaluation/sampling: the EMA shadow when enabled
        (the reference's ema_scope), else the live params."""
        if self.cfg.use_ema and self.state.ema is not None:
            from ctrlora_tpu.training.ema import ema_params

            return ema_params(self.state.params, self.state.ema)
        return self.state.params

    # ------------------------------------------------------------------
    def save(self, step: int) -> str:
        path = os.path.join(self.workdir, f"ckpt_{step:08d}")
        save_train_state(path, self.state)
        self._log_host({"event": "ckpt", "step": step, "path": path})
        return path

    def restore(self, path: str) -> None:
        self.state = restore_train_state(path, self.state)


def _pack_zero_size(tree):
    """Orbax refuses zero-size arrays (the EMA's untracked-leaf
    placeholders); pad them to 1-element sentinels for serialization."""
    return jax.tree_util.tree_map(
        lambda x: jnp.zeros((1,), x.dtype) if x.size == 0 else x, tree
    )


def save_train_state(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _pack_zero_size(state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), _pack_zero_size(template))
    # squeeze the sentinels back to the template's zero-size placeholders
    return jax.tree_util.tree_map(
        lambda t, r: r[:0] if (hasattr(t, "size") and t.size == 0) else r,
        template, restored,
    )


def _txt_strip(prompts, width: int, height: int = 48) -> np.ndarray:
    """Render prompts as an image strip (role of log_txt_as_img,
    ldm/util.py:11) — B tiles side by side."""
    from PIL import Image, ImageDraw

    tiles = []
    per = max(1, width // max(1, len(prompts)))
    for p in prompts:
        tile = Image.new("RGB", (per, height), "white")
        d = ImageDraw.Draw(tile)
        txt = str(p)
        # crude wrap at ~per/7 px per char
        n = max(4, per // 7)
        d.text((2, 2), "\n".join(txt[i : i + n] for i in range(0, len(txt), n))[:256],
               fill="black")
        tiles.append(np.asarray(tile))
    strip = np.concatenate(tiles, axis=1)
    if strip.shape[1] < width:  # pad to grid width
        pad = np.full((height, width - strip.shape[1], 3), 255, np.uint8)
        strip = np.concatenate([strip, pad], axis=1)
    return strip[:, :width]


def make_image_log_hook(pipe: CtrLoraPipeline, workdir: str, ddim_steps: int = 20):
    """Periodic training grid (role of ImageLogger, cldm/logger.py:12-78):
    control / VAE reconstruction / CFG-9.0 samples rows plus the prompts
    rendered as text, mirroring the reference's log_images keys
    (cldm/cldm.py:351-409: reconstruction, control, conditioning,
    samples_cfg_scale_9.00)."""
    from ctrlora_tpu.sampling.ddim import DDIMConfig, ddim_sample

    def hook(state: TrainState, step: int, batch: dict) -> None:
        from PIL import Image

        params = state.params
        if state.ema is not None:
            from ctrlora_tpu.training.ema import ema_params

            params = ema_params(params, state.ema)
        cached = "jpg_moments" in batch  # latent-cached loader batches
        B = min(2, batch["token_ids"].shape[0])
        ids = jnp.asarray(batch["token_ids"][:B])
        ctx = pipe.encode_text_tokens(params, ids)
        unc = pipe.encode_text_tokens(params, jnp.zeros_like(ids))
        if cached:
            # display pixels via the decoder: hint_in = scale * posterior
            # mean is EXACTLY what encode_first_stage(hint, rng=None) gives
            hint_z = pipe.first_stage_from_moments(
                jnp.asarray(batch["hint_moments"][:B])
            )
            hint = pipe.decode_first_stage(params, hint_z) * 0.5 + 0.5
            jpg = None
            hint_in = hint_z if (
                pipe.cfg.control is not None
                and pipe.cfg.control.hint_mode == "latent"
            ) else hint
        else:
            hint = jnp.asarray(batch["hint"][:B])
            jpg = jnp.asarray(batch["jpg"][:B])
            if pipe.cfg.control is not None and pipe.cfg.control.hint_mode == "latent":
                hint_in = pipe.encode_first_stage(params, hint)
            else:
                hint_in = hint
        task = batch.get("task_idx")
        conds = [Conditioning(hint_in, lora_idx=jnp.int32(int(task[0])) if task is not None else None)]
        f = 2 ** (len(pipe.cfg.vae.ch_mult) - 1)
        h, w = hint.shape[1] // f, hint.shape[2] // f
        z = ddim_sample(
            pipe, params, jax.random.PRNGKey(step), ctx, unc, conds,
            (B, h, w, 4), DDIMConfig(steps=ddim_steps, guidance_scale=9.0),
        )
        img = pipe.decode_first_stage(params, z)
        if cached:  # decode(posterior mean) IS the reconstruction
            recon = pipe.decode_first_stage(
                params,
                pipe.first_stage_from_moments(jnp.asarray(batch["jpg_moments"][:B])),
            )
        else:
            recon = pipe.decode_first_stage(params, pipe.encode_first_stage(params, jpg))

        def to_u8_row(x, signed=True):
            x = jnp.clip(x * 127.5 + 127.5, 0, 255) if signed else jnp.clip(x * 255, 0, 255)
            arr = np.asarray(x).astype(np.uint8)
            return np.concatenate(list(arr), axis=1)  # B tiles side by side

        rows = [
            to_u8_row(hint, signed=False),  # control
            to_u8_row(recon),  # reconstruction
            to_u8_row(img),  # samples_cfg_scale_9.0
        ]
        txts = batch.get("txt")
        if txts is not None:
            rows.insert(0, _txt_strip(list(txts[:B]), rows[0].shape[1]))
        grid = np.concatenate(rows, axis=0)
        Image.fromarray(grid).save(
            os.path.join(workdir, "image_log", f"step_{step:08d}.png")
        )

    return hook
