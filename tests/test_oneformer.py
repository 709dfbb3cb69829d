"""OneFormer parity: bridged random weights, jax port vs the vendored torch
reference (annotator/oneformer), stage by stage and end to end."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch stage-parity: heavyweight, full lane only
import torch

from reference_shim import install_oneformer_shims

import jax.numpy as jnp

from ctrlora_tpu.annotators.oneformer import (
    OneFormerConfig, convert_oneformer, oneformer_forward, task_tokens,
)
from ctrlora_tpu.annotators.oneformer.decoder import DecoderConfig, decoder_forward
from ctrlora_tpu.annotators.oneformer.pixel_decoder import (
    PixelDecoderConfig, pixel_decoder_forward,
)
from ctrlora_tpu.annotators.oneformer.swin import SwinConfig, swin_forward

TINY = OneFormerConfig(
    swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window_size=4),
    pixel=PixelDecoderConfig(conv_dim=32, mask_dim=32, nheads=4,
                             dim_feedforward=64, enc_layers=2,
                             in_channels=(8, 16, 32, 64)),
    dec=DecoderConfig(hidden_dim=32, num_queries=6, nheads=4, dim_feedforward=64,
                      dec_layers=3, class_dec_layers=1, num_classes=7),
)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


@pytest.fixture(scope="module")
def oracle():
    swin_mod, msda_mod, dec_mod, ShapeSpec = install_oneformer_shims()
    torch.manual_seed(0)
    backbone = swin_mod.SwinTransformer(
        pretrain_img_size=64, patch_size=4, in_chans=3, embed_dim=8,
        depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8], window_size=4,
        out_indices=(0, 1, 2, 3),
    )
    shapes = {
        "res2": ShapeSpec(channels=8, stride=4),
        "res3": ShapeSpec(channels=16, stride=8),
        "res4": ShapeSpec(channels=32, stride=16),
        "res5": ShapeSpec(channels=64, stride=32),
    }
    pixel = msda_mod.MSDeformAttnPixelDecoder(
        input_shape=shapes, transformer_dropout=0.0, transformer_nheads=4,
        transformer_dim_feedforward=64, transformer_enc_layers=2,
        conv_dim=32, mask_dim=32, norm="GN",
        transformer_in_features=["res3", "res4", "res5"], common_stride=4,
    )
    predictor = dec_mod.ContrastiveMultiScaleMaskedTransformerDecoder(
        in_channels=32, mask_classification=True, num_classes=7, hidden_dim=32,
        num_queries=6, nheads=4, dropout=0.0, dim_feedforward=64, enc_layers=0,
        is_train=False, dec_layers=3, class_dec_layers=1, pre_norm=False,
        mask_dim=32, enforce_input_project=False, use_task_norm=True,
    )
    task_mlp = dec_mod.MLP(77, 32, 32, 2)
    for i, m in enumerate((backbone, pixel, predictor, task_mlp)):
        _randomize(m, 100 + i).eval()

    sd = {}
    for prefix, m in (
        ("backbone.", backbone),
        ("sem_seg_head.pixel_decoder.", pixel),
        ("sem_seg_head.predictor.", predictor),
        ("task_mlp.", task_mlp),
    ):
        sd.update({prefix + k: v.numpy() for k, v in m.state_dict().items()})
    params = convert_oneformer(sd, TINY)
    return backbone, pixel, predictor, task_mlp, params


def _image(rng, h=64, w=64):
    return rng.normal(0, 1, (1, h, w, 3)).astype(np.float32)


def test_swin_parity(oracle, rng):
    backbone, _, _, _, params = oracle
    x = _image(rng)
    with torch.no_grad():
        want = backbone(torch.as_tensor(x).permute(0, 3, 1, 2))
    got = swin_forward(params["backbone"], jnp.asarray(x), TINY.swin)
    for k in ("res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_swin_parity_nondivisible_size(oracle, rng):
    # 52x44: exercises patch/window padding and shifted-window masking
    backbone, _, _, _, params = oracle
    x = _image(rng, 52, 44)
    with torch.no_grad():
        want = backbone(torch.as_tensor(x).permute(0, 3, 1, 2))
    got = swin_forward(params["backbone"], jnp.asarray(x), TINY.swin)
    for k in ("res2", "res5"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_pixel_decoder_parity(oracle, rng):
    backbone, pixel, _, _, params = oracle
    x = _image(rng)
    with torch.no_grad():
        feats = backbone(torch.as_tensor(x).permute(0, 3, 1, 2))
        want_mask, _, want_ms, _, _ = pixel.forward_features(feats)
    got_feats = swin_forward(params["backbone"], jnp.asarray(x), TINY.swin)
    got_mask, got_ms = pixel_decoder_forward(
        params["pixel_decoder"], got_feats, TINY.pixel
    )
    np.testing.assert_allclose(
        np.asarray(got_mask), want_mask.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5,
    )
    for g, w in zip(got_ms, want_ms):
        np.testing.assert_allclose(
            np.asarray(g), w.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
        )


def test_full_model_parity(oracle, rng):
    backbone, pixel, predictor, task_mlp, params = oracle
    x = _image(rng)
    tok = task_tokens("semantic")[None].astype(np.float32)
    with torch.no_grad():
        feats = backbone(torch.as_tensor(x).permute(0, 3, 1, 2))
        mask_f, _, ms, _, _ = pixel.forward_features(feats)
        tasks = task_mlp(torch.as_tensor(tok))
        out = predictor(ms, mask_f, tasks)
        want_cls = out["pred_logits"].numpy()
        want_masks = out["pred_masks"].numpy()

    got_feats = swin_forward(params["backbone"], jnp.asarray(x), TINY.swin)
    got_mask, got_ms = pixel_decoder_forward(
        params["pixel_decoder"], got_feats, TINY.pixel
    )
    got_cls, got_masks = decoder_forward(
        params["predictor"], got_ms, got_mask, jnp.asarray(tok), TINY.dec
    )
    np.testing.assert_allclose(np.asarray(got_cls), want_cls, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_masks), want_masks, rtol=1e-3, atol=1e-4)


def test_task_tokens_match_reference_tokenizer():
    # zero-padded CLIP BPE with SOT/EOT framing (data/tokenizer.py:99-111)
    tok = task_tokens("semantic")
    assert tok.shape == (77,)
    assert tok[0] == 49406 and 49407 in tok
    eot_pos = int(np.argmax(tok == 49407))
    assert np.all(tok[eot_pos + 1 :] == 0)


def test_detector_contract(oracle, rng):
    """OneformerDetector on tiny weights: uint8 RGB in -> palette map out."""
    from ctrlora_tpu.annotators.oneformer import OneformerDetector

    _, _, _, _, params = oracle
    import dataclasses

    cfg = dataclasses.replace(TINY, min_size_test=64, max_size_test=128, palette="coco")
    det = OneformerDetector(cfg, params=params)
    img = (rng.uniform(0, 255, (70, 90, 3))).astype(np.uint8)
    out = det(img)
    assert out.shape == (70, 90, 3) and out.dtype == np.uint8
    seg = det.semantic_map(img)
    assert seg.shape == (70, 90) and seg.max() < TINY.dec.num_classes
