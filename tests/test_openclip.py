"""OpenCLIP text-tower parity vs a hand-built torch oracle (reference:
ldm/modules/encoders/modules.py:134-186 uses open_clip's text transformer,
whose blocks are ln_1 -> nn.MultiheadAttention(causal) -> ln_2 -> c_fc/
GELU/c_proj with pre-LN residuals; open_clip itself is not installed, so
the oracle builds that published block structure from torch primitives and
exports state-dict keys in open_clip naming)."""

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # torch stage-parity: heavyweight, full lane only
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ctrlora_tpu.models.clip import CLIPTextModel  # noqa: E402
from ctrlora_tpu.models.openclip import (  # noqa: E402
    convert_openclip_text, openclip_vith_text_config,
)


class _Block(torch.nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(d)
        self.attn = torch.nn.MultiheadAttention(d, h, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(d)
        self.mlp = torch.nn.ModuleDict({
            "c_fc": torch.nn.Linear(d, 4 * d),
            "c_proj": torch.nn.Linear(4 * d, d),
        })

    def forward(self, x, mask):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + a
        h = self.ln_2(x)
        return x + self.mlp["c_proj"](torch.nn.functional.gelu(self.mlp["c_fc"](h)))


class _Tower(torch.nn.Module):
    def __init__(self, vocab, d, h, layers, ctx):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, d)
        self.positional_embedding = torch.nn.Parameter(torch.randn(ctx, d) * 0.01)
        self.resblocks = torch.nn.ModuleList(_Block(d, h) for _ in range(layers))
        self.ln_final = torch.nn.LayerNorm(d)

    def forward(self, ids, stop_early):
        s = ids.shape[1]
        mask = torch.full((s, s), float("-inf")).triu(1)
        x = self.token_embedding(ids) + self.positional_embedding[:s]
        for blk in self.resblocks[: len(self.resblocks) - stop_early]:
            x = blk(x, mask)
        return self.ln_final(x)

    def open_clip_sd(self):
        sd = {
            "token_embedding.weight": self.token_embedding.weight,
            "positional_embedding": self.positional_embedding,
            "ln_final.weight": self.ln_final.weight,
            "ln_final.bias": self.ln_final.bias,
        }
        for i, b in enumerate(self.resblocks):
            t = f"transformer.resblocks.{i}"
            sd[f"{t}.attn.in_proj_weight"] = b.attn.in_proj_weight
            sd[f"{t}.attn.in_proj_bias"] = b.attn.in_proj_bias
            sd[f"{t}.attn.out_proj.weight"] = b.attn.out_proj.weight
            sd[f"{t}.attn.out_proj.bias"] = b.attn.out_proj.bias
            sd[f"{t}.ln_1.weight"] = b.ln_1.weight
            sd[f"{t}.ln_1.bias"] = b.ln_1.bias
            sd[f"{t}.ln_2.weight"] = b.ln_2.weight
            sd[f"{t}.ln_2.bias"] = b.ln_2.bias
            sd[f"{t}.mlp.c_fc.weight"] = b.mlp["c_fc"].weight
            sd[f"{t}.mlp.c_fc.bias"] = b.mlp["c_fc"].bias
            sd[f"{t}.mlp.c_proj.weight"] = b.mlp["c_proj"].weight
            sd[f"{t}.mlp.c_proj.bias"] = b.mlp["c_proj"].bias
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize("layer,stop_early", [("last", 0), ("penultimate", 1)])
def test_openclip_text_parity(layer, stop_early):
    import dataclasses

    torch.manual_seed(0)
    tower = _Tower(vocab=96, d=32, h=4, layers=3, ctx=24).eval()
    cfg = dataclasses.replace(
        openclip_vith_text_config(layer),
        vocab_size=96, hidden_size=32, intermediate_size=128,
        num_layers=3, num_heads=4, max_length=24, dtype="float32",
    )
    params = convert_openclip_text(tower.open_clip_sd(), cfg)

    ids = np.random.default_rng(0).integers(0, 96, (2, 24))
    with torch.no_grad():
        want = tower(torch.as_tensor(ids), stop_early).numpy()
    got = np.asarray(CLIPTextModel(cfg).apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
