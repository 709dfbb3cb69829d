"""Latent-moments cache (training/latent_cache.py): the cached train path
must be EXACT — same loss, same rng stream — not an approximation.

Reference behavior being preserved: LatentDiffusion.get_input re-encodes
target+hint pixels every step (ldm/models/diffusion/ddpm.py:655-662,
cldm/cldm.py:318); the moments of that encode are deterministic per image,
only the posterior sample varies per visit.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ctrlora_tpu.configs import tiny_test_config
from ctrlora_tpu.models.vae import AutoencoderKL
from ctrlora_tpu.pipeline import CtrLoraPipeline
from ctrlora_tpu.training.step import loss_for_batch


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config(n_loras=1, hint_mode="latent")
    pipe = CtrLoraPipeline(cfg)
    # param shapes are spatial-size independent; init at the smallest legal
    # size (4x VAE downsampling) — tracing at 32 cost ~100s of fast-lane CPU
    params = pipe.init(jax.random.PRNGKey(0), image_size=8)
    return pipe, params


def _moments(pipe, params, img):
    m, lv = pipe.vae.apply(params.vae, img, method=AutoencoderKL.encode)
    return jnp.concatenate([m, lv], axis=-1)


def test_cached_loss_bit_equal(tiny):
    """Pixel batch and moments batch must produce the identical loss under
    the same rng (same split order inside loss_for_batch)."""
    pipe, params = tiny
    rng = jax.random.PRNGKey(7)
    B, S = 2, 16  # smallest multiple of the tiny VAE's 4x downsampling
    # that leaves a nonempty latent attention site (fast-lane budget)
    jpg = jax.random.uniform(jax.random.PRNGKey(1), (B, S, S, 3), jnp.float32, -1, 1)
    hint = jax.random.uniform(jax.random.PRNGKey(2), (B, S, S, 3), jnp.float32, 0, 1)
    ids = jnp.ones((B, pipe.cfg.clip.max_length), jnp.int32)
    pix = {"jpg": jpg, "hint": hint, "token_ids": ids,
           "task_idx": jnp.zeros((B,), jnp.int32)}
    cac = {"jpg_moments": _moments(pipe, params, jpg),
           "hint_moments": _moments(pipe, params, hint),
           "token_ids": ids, "task_idx": jnp.zeros((B,), jnp.int32)}
    l_pix, m_pix = jax.jit(
        lambda p, b, r: loss_for_batch(pipe, p, b, r)
    )(params, pix, rng)
    l_cac, m_cac = jax.jit(
        lambda p, b, r: loss_for_batch(pipe, p, b, r)
    )(params, cac, rng)
    assert float(l_pix) == float(l_cac), (float(l_pix), float(l_cac))
    assert float(m_pix["t_mean"]) == float(m_cac["t_mean"])  # same t draws


def test_precompute_and_wrapper_roundtrip(tmp_path, tiny):
    """precompute_moments over a real CustomDataset + LatentCachedDataset:
    prompt dropout must follow the wrapped dataset's rng draw exactly and
    the loader must stack the moment keys."""
    from PIL import Image

    pipe, params = tiny
    from ctrlora_tpu.data.datasets import CustomDataset
    from ctrlora_tpu.data.loader import Loader
    from ctrlora_tpu.data.scheduler import SingleTaskSchedule
    from ctrlora_tpu.training.latent_cache import (
        LatentCachedDataset, precompute_moments,
    )

    root = tmp_path / "ds"
    (root / "source").mkdir(parents=True)
    (root / "target").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(5):
        a = rng.integers(0, 255, (32, 32, 3), np.uint8)
        b = rng.integers(0, 255, (32, 32, 3), np.uint8)
        Image.fromarray(a).save(root / "source" / f"{i}.png")
        Image.fromarray(b).save(root / "target" / f"{i}.png")
        lines.append(
            '{"source": "source/%d.png", "target": "target/%d.png", '
            '"prompt": "p%d"}' % (i, i, i)
        )
    (root / "prompt.json").write_text("\n".join(lines))

    ds = CustomDataset(str(root), drop_rate=0.5, resolution=32)
    jm, hm = precompute_moments(pipe, params, ds, batch_size=2, log=lambda *_: None)
    assert jm.shape[0] == 5 and hm.shape[0] == 5
    assert jm.shape[-1] == 2 * pipe.cfg.vae.z_channels

    wrapped = LatentCachedDataset(ds, jm, hm)
    # dropout parity: identical rng -> identical prompt choice
    for i in range(5):
        p_pix = ds.get(i, np.random.default_rng((1, i)))["txt"]
        p_cac = wrapped.get(i, np.random.default_rng((1, i)))["txt"]
        assert p_pix == p_cac

    # moments must match a direct encode of the dataset's pixels. Not
    # required bit-equal: the pre-pass encodes batch-8 programs while the
    # train step encodes batch-B, and XLA's conv algorithm (and thus fp32
    # reassociation) is shape-dependent — low-order-bit differences only.
    ex = ds.get(3, np.random.default_rng(0))
    direct = _moments(pipe, params, jnp.asarray(ex["jpg"])[None])[0]
    np.testing.assert_allclose(np.asarray(direct), jm[3], atol=3e-5, rtol=1e-4)

    sched = SingleTaskSchedule(size=5, batch_size=2, seed=0)
    loader = Loader([wrapped], sched, num_workers=1,
                    max_length=pipe.cfg.clip.max_length)
    batch = next(iter(loader))
    assert set(batch) == {"jpg_moments", "hint_moments", "token_ids", "task_idx"}
    assert batch["jpg_moments"].shape[0] == 2
