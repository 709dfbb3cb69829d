"""ZoeDepth (BEiT-L DPT + metric-bins head) parity vs the vendored reference
with random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)]


@pytest.fixture(scope="module")
def ref_model():
    install_shims()
    import torch
    from annotator.zoe.zoedepth.models.zoedepth.zoedepth_v1 import ZoeDepth
    from annotator.zoe.zoedepth.utils.config import get_config

    torch.manual_seed(0)
    model = ZoeDepth.build_from_config(get_config("zoedepth", "infer")).eval()
    with torch.no_grad():
        for name, prm in model.named_parameters():
            if "gamma_" in name or "relative_position_bias_table" in name:
                prm.copy_(torch.randn_like(prm) * 0.2)
    return model


def test_rel_pos_index_matches_timm_port(ref_model):
    from timm.models.beit import gen_relative_position_index as torch_gen

    from ctrlora_tpu.annotators.zoe import gen_relative_position_index

    for wh, ww in [(24, 24), (12, 16), (3, 5)]:
        mine = gen_relative_position_index(wh, ww)
        theirs = torch_gen((wh, ww)).numpy()
        np.testing.assert_array_equal(mine, theirs)


def test_zoe_forward_parity(ref_model):
    """Full model forward (prep bypassed) at a non-square, non-train size so
    the rel-pos interpolation path is exercised."""
    import torch

    from ctrlora_tpu.annotators.zoe import convert_zoe, zoe_forward

    model = ref_model
    model.core.prep = lambda x: x  # bypass resize+normalize; feed prepped
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_zoe(sd))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 192, 256), np.float32) * 0.5
    with torch.no_grad():
        out_ref = model(torch.from_numpy(x))["metric_depth"].numpy()

    out = zoe_forward(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(out_ref, (0, 2, 3, 1)), np.asarray(out),
        atol=5e-4, rtol=2e-3,
    )


@pytest.mark.slow
def test_zoe_detector_protocol(ref_model, tmp_path):
    """Detector end-to-end vs the reference infer(): raw metric depth must
    agree in absolute terms. (A random-weight 345M model produces a depth
    RANGE at fp32-noise level ~2e-4 — min_temp=0.0212 makes the log-binomial
    near-argmax — so the reference's percentile normalization of that range
    is not comparable; the normalization math itself is covered by
    test_zoe_infer_protocol_mechanics.)"""
    import torch

    from ctrlora_tpu.annotators.zoe import ZoeDetector

    model = ref_model
    ckpt = tmp_path / "ZoeD_M12_N.pt"
    torch.save({"model": model.state_dict()}, ckpt)
    det = ZoeDetector(ckpt_path=str(ckpt))

    img = np.random.default_rng(1).integers(0, 255, (48, 64, 3), np.uint8)
    out = det(img)
    assert out.shape == (48, 64) and out.dtype == np.uint8

    img01 = img.astype(np.float32) / 255.0
    with torch.no_grad():
        t = torch.from_numpy(img01).permute(2, 0, 1)[None]
        depth_ref = model.infer(t)[0, 0].numpy()
    mine = det._infer_pad(img01)
    mine_flip = det._infer_pad(img01[:, ::-1])[:, ::-1]
    depth = (mine + mine_flip) / 2.0
    np.testing.assert_allclose(depth, depth_ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_zoe_infer_protocol_mechanics(ref_model, tmp_path):
    """Exact check of the infer plumbing (reflect pad amounts, minimal
    keep-aspect multiple-of-32 resize with align_corners=True, bicubic
    align_corners=False upsample back, crop, flip average, percentile
    normalization) with the 345M model swapped for an analytic function —
    conditioning-independent."""
    import torch
    import torch.nn.functional as F

    from ctrlora_tpu.annotators.zoe import ZoeDetector, minimal_resize_size

    model = ref_model
    ckpt = tmp_path / "ZoeD_M12_N.pt"
    torch.save({"model": model.state_dict()}, ckpt)
    det = ZoeDetector(ckpt_path=str(ckpt))
    # analytic "model": smooth function of the input with spatial structure
    det._fwd = lambda p, x: (jnp.sin(3.0 * x[..., 0:1]) + 0.1 * x[..., 1:2] ** 2)

    img = np.random.default_rng(2).integers(0, 255, (40, 56, 3), np.uint8)
    out = det(img)

    def torch_infer(t):  # replicate depth_model.py:57-97 with the analytic fn
        h, w = t.shape[2], t.shape[3]
        nh, nw = minimal_resize_size(h, w)
        xr = F.interpolate(t, (nh, nw), mode="bilinear", align_corners=True)
        xr = (xr - 0.5) / 0.5
        d = torch.sin(3.0 * xr[:, 0:1]) + 0.1 * xr[:, 1:2] ** 2
        if (nh, nw) != (h, w):
            d = F.interpolate(d, (h, w), mode="bicubic", align_corners=False)
        return d

    def torch_pad_infer(t):
        h, w = t.shape[2], t.shape[3]
        ph = int(np.sqrt(h / 2) * 3)
        pw = int(np.sqrt(w / 2) * 3)
        tp = F.pad(t, (pw, pw, ph, ph), mode="reflect")
        d = torch_infer(tp)
        return d[:, :, ph:-ph, pw:-pw]

    with torch.no_grad():
        t = torch.from_numpy(img.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
        d = torch_pad_infer(t)
        d_flip = torch.flip(torch_pad_infer(torch.flip(t, dims=[3])), dims=[3])
        depth = ((d + d_flip) / 2)[0, 0].numpy()
    vmin, vmax = np.percentile(depth, 2), np.percentile(depth, 85)
    expect = 1.0 - (depth - vmin) / (vmax - vmin)
    expect = (expect * 255.0).clip(0, 255).astype(np.uint8)
    assert np.abs(out.astype(int) - expect.astype(int)).max() <= 1
