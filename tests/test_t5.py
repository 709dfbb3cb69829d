"""FrozenT5 encoder parity vs transformers (reference:
ldm/modules/encoders/modules.py:58-86 wraps T5EncoderModel)."""

import jax.numpy as jnp
import numpy as np
import pytest


pytestmark = pytest.mark.slow  # torch stage-parity: heavyweight, full lane only
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ctrlora_tpu.models.t5 import (  # noqa: E402
    T5Config, T5TextModel, convert_t5, position_bias_table,
)


def _tiny_hf():
    cfg = transformers.T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(cfg).eval()
    ours = T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
    )
    return model, ours


def test_t5_encoder_parity():
    hf, cfg = _tiny_hf()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_t5(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, (2, 11))
    with torch.no_grad():
        want = hf(
            input_ids=torch.as_tensor(ids),
            attention_mask=torch.ones_like(torch.as_tensor(ids)),
        ).last_hidden_state.numpy()

    got = np.asarray(T5TextModel(cfg).apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_t5_position_buckets_match_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    cfg = T5Config(relative_attention_num_buckets=8,
                   relative_attention_max_distance=20)
    s = 13
    ctx = torch.arange(s)[:, None]
    mem = torch.arange(s)[None, :]
    want = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=8, max_distance=20
    ).numpy()
    got = position_bias_table(s, cfg)
    np.testing.assert_array_equal(got, want)
