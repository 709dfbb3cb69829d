"""DensePose pipeline tests: backbone/FPN parity vs the vendored
detectron2, ROIAlign/ConvTranspose vs torch oracles, NMS properties, and
the full detector contract on synthetic weights."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from types import SimpleNamespace

from reference_shim import install_densepose_shims

import jax.numpy as jnp

from ctrlora_tpu.annotators.densepose import (
    DenseposeDetector, convert_densepose, decode_deltas, fpn_forward,
    level_anchors, nms, resnet_forward, roi_align,
)


def _tiny_resnet_cfg():
    # build_resnet_backbone reads these fields; DEPTH 50 -> stages (3,4,6,3)
    return SimpleNamespace(MODEL=SimpleNamespace(
        RESNETS=SimpleNamespace(
            DEPTH=50, NORM="FrozenBN", OUT_FEATURES=["res2", "res3", "res4", "res5"],
            NUM_GROUPS=1, WIDTH_PER_GROUP=4, STEM_OUT_CHANNELS=8,
            RES2_OUT_CHANNELS=16, STRIDE_IN_1X1=True, RES5_DILATION=1,
            DEFORM_ON_PER_STAGE=[False] * 4, DEFORM_MODULATED=False,
            DEFORM_NUM_GROUPS=1,
        ),
        BACKBONE=SimpleNamespace(FREEZE_AT=0),
    ))


@pytest.fixture(scope="module")
def oracle_backbone():
    resnet_mod, fpn_mod, ShapeSpec = install_densepose_shims()
    torch.manual_seed(0)
    bottom_up = resnet_mod.build_resnet_backbone(
        _tiny_resnet_cfg(), ShapeSpec(channels=3, stride=1)
    )
    fpn = fpn_mod.FPN(
        bottom_up=bottom_up, in_features=["res2", "res3", "res4", "res5"],
        out_channels=16, norm="", top_block=fpn_mod.LastLevelMaxPool(),
        fuse_type="sum",
    )
    with torch.no_grad():
        g = torch.Generator().manual_seed(7)
        for p in fpn.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in fpn.named_buffers():
            if "running_mean" in name:
                b.normal_(0, 0.1, generator=g)
            elif "running_var" in name:
                b.uniform_(0.5, 1.5, generator=g)
    fpn.eval()
    sd = {}
    sd.update({"backbone.bottom_up." + k: v.numpy() for k, v in bottom_up.state_dict().items()})
    sd.update({
        "backbone." + k: v.numpy() for k, v in fpn.state_dict().items()
        if not k.startswith("bottom_up.")
    })
    return fpn, sd


def test_resnet_fpn_parity(oracle_backbone, rng):
    fpn, sd = oracle_backbone
    params = convert_densepose(
        {k: v for k, v in sd.items() if k.startswith("backbone.")}
        | _dummy_head_sd(), stages=(3, 4, 6, 3),
    )
    x = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = fpn(torch.as_tensor(x).permute(0, 3, 1, 2))
    feats = resnet_forward(params["backbone"], jnp.asarray(x), stages=(3, 4, 6, 3))
    got = fpn_forward(params["fpn"], feats)
    for i, name in enumerate(["p2", "p3", "p4", "p5", "p6"]):
        np.testing.assert_allclose(
            np.asarray(got[i]), want[name].permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5, err_msg=name,
        )


def _dummy_head_sd():
    """Minimal rpn/box/decoder/densepose tensors so convert_densepose runs."""
    rng = np.random.default_rng(3)
    c = 16  # fpn channels in the tiny oracle
    sd = {}

    def conv(k, cout, cin, ks, bias=True):
        sd[k + ".weight"] = rng.normal(0, 0.1, (cout, cin, ks, ks)).astype(np.float32)
        if bias:
            sd[k + ".bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)

    def gn(k, ch):
        sd[k + ".weight"] = np.ones(ch, np.float32)
        sd[k + ".bias"] = np.zeros(ch, np.float32)

    def fc(k, cout, cin):
        sd[k + ".weight"] = rng.normal(0, 0.05, (cout, cin)).astype(np.float32)
        sd[k + ".bias"] = np.zeros(cout, np.float32)

    conv("proposal_generator.rpn_head.conv", c, c, 3)
    conv("proposal_generator.rpn_head.objectness_logits", 3, c, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", 12, c, 1)
    fc("roi_heads.box_head.fc1", 32, 7 * 7 * c)
    fc("roi_heads.box_head.fc2", 32, 32)
    fc("roi_heads.box_predictor.cls_score", 2, 32)
    fc("roi_heads.box_predictor.bbox_pred", 4, 32)
    for i in range(4):
        for j in range(max(1, i)):
            base = f"roi_heads.decoder.scale_heads.{i}.{2 * j}"
            conv(base, 32, c if j == 0 else 32, 3, bias=False)
            gn(base + ".norm", 32)
    conv("roi_heads.decoder.predictor", c, 32, 1)
    hb = "roi_heads.densepose_head."
    conv(hb + "ASPP.convs.0.0", 32, c, 1, bias=False)
    gn(hb + "ASPP.convs.0.1", 32)
    for i in range(3):
        conv(hb + f"ASPP.convs.{i + 1}.0", 32, c, 3, bias=False)
        gn(hb + f"ASPP.convs.{i + 1}.1", 32)
    conv(hb + "ASPP.convs.4.1", 32, c, 1, bias=False)
    conv(hb + "ASPP.project.0", 32, 5 * 32, 1, bias=False)
    gn(hb + "ASPP.project.1", 32)
    for i in range(2):
        conv(hb + f"body_conv_fcn{i + 1}", 32, 32, 3)
    pb = "roi_heads.densepose_predictor."
    for name, ch in (("ann_index_lowres", 2), ("index_uv_lowres", 25),
                     ("u_lowres", 25), ("v_lowres", 25)):
        sd[pb + name + ".weight"] = rng.normal(0, 0.05, (32, ch, 4, 4)).astype(np.float32)
        sd[pb + name + ".bias"] = np.zeros(ch, np.float32)
    return sd


def test_roi_align_matches_torchvision_arithmetic(rng):
    """Naive per-sample oracle of roi_align(aligned=False, sampling=2)."""
    feat = rng.normal(0, 1, (1, 12, 15, 3)).astype(np.float32)
    boxes = np.array([[4.0, 2.0, 40.0, 30.0], [0.0, 0.0, 60.0, 48.0]], np.float32)
    scale, out, samp = 0.25, 4, 2
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), scale, out, samp))

    f = feat[0]
    h, w = f.shape[:2]

    def bil(y, x):
        if y < -1 or y > h or x < -1 or x > w:
            return np.zeros(3, np.float32)
        y, x = min(max(y, 0.0), h - 1), min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        wy, wx = y - y0, x - x0
        return (f[y0, x0] * (1 - wy) * (1 - wx) + f[y0, x1] * (1 - wy) * wx
                + f[y1, x0] * wy * (1 - wx) + f[y1, x1] * wy * wx)

    for bi, (x1b, y1b, x2b, y2b) in enumerate(boxes):
        rx, ry = x1b * scale, y1b * scale
        bw = max((x2b - x1b) * scale, 1.0) / out
        bh = max((y2b - y1b) * scale, 1.0) / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(3, np.float32)
                for sy in range(samp):
                    for sx in range(samp):
                        yq = ry + i * bh + (sy + 0.5) * bh / samp
                        xq = rx + j * bw + (sx + 0.5) * bw / samp
                        acc += bil(yq, xq)
                np.testing.assert_allclose(
                    got[bi, i, j], acc / (samp * samp), rtol=1e-4, atol=1e-5
                )


def test_conv_transpose_matches_torch(rng):
    """The chart predictor's ConvTranspose2d(k4, s2, p1) bridge."""
    from ctrlora_tpu.annotators.densepose import deeplab_head_forward  # noqa: F401
    import jax

    x = rng.normal(0, 1, (2, 5, 5, 6)).astype(np.float32)
    w = rng.normal(0, 0.1, (6, 3, 4, 4)).astype(np.float32)  # [cin, cout, k, k]
    b = rng.normal(0, 0.1, (3,)).astype(np.float32)
    with torch.no_grad():
        want = F.conv_transpose2d(
            torch.as_tensor(x).permute(0, 3, 1, 2), torch.as_tensor(w),
            torch.as_tensor(b), stride=2, padding=1,
        ).permute(0, 2, 3, 1).numpy()
    got = jax.lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    ) + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_nms_properties(rng):
    boxes = rng.uniform(0, 100, (200, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (200, 2))
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    keep = nms(boxes, scores, 0.5)
    kept = boxes[keep]

    def iou(a, b):
        x1 = np.maximum(a[0], b[0]); y1 = np.maximum(a[1], b[1])
        x2 = np.minimum(a[2], b[2]); y2 = np.minimum(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        area = lambda t: (t[2] - t[0]) * (t[3] - t[1])
        return inter / (area(a) + area(b) - inter)

    # kept boxes are mutually below threshold, ordered by score
    assert all(scores[keep][i] >= scores[keep][i + 1] for i in range(len(keep) - 1))
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert iou(kept[i], kept[j]) <= 0.5 + 1e-6
    # every suppressed box overlaps a kept, higher-scored box
    for s in set(range(200)) - set(keep.tolist()):
        assert any(
            iou(boxes[s], boxes[k]) > 0.5 and scores[k] >= scores[s] for k in keep
        )


def test_decode_deltas_roundtrip(rng):
    anchors = np.array([[10, 10, 50, 90], [0, 0, 32, 32]], np.float32)
    # zero deltas reproduce the anchors
    np.testing.assert_allclose(
        decode_deltas(anchors, np.zeros((2, 4), np.float32)), anchors, atol=1e-5
    )
    # known shift: dx=1 moves the center by one width
    d = np.array([[1.0, 0, 0, 0]], np.float32)
    out = decode_deltas(anchors[:1], d)
    np.testing.assert_allclose(out[0, 0] - anchors[0, 0], 40.0, atol=1e-4)


def test_anchors_layout():
    a = level_anchors(2, 3, stride=16, size=32)
    assert a.shape == (2 * 3 * 3, 4)
    # first anchor centered at (0, 0), aspect 0.5 -> w = sqrt(2)*32
    w = a[0, 2] - a[0, 0]
    np.testing.assert_allclose(w, 32 * np.sqrt(2), rtol=1e-5)
    np.testing.assert_allclose((a[0, 0] + a[0, 2]) / 2, 0.0, atol=1e-5)


@pytest.mark.slow
def test_detector_contract(oracle_backbone, rng, monkeypatch):
    """Full pipeline on tiny synthetic weights: RGB in, IUV-colored map out."""
    import ctrlora_tpu.annotators.densepose as dp

    _, sd = oracle_backbone
    params = convert_densepose(sd | _dummy_head_sd(), stages=(3, 4, 6, 3))
    monkeypatch.setattr(dp, "MIN_SIZE_TEST", 64)
    monkeypatch.setattr(dp, "MAX_SIZE_TEST", 128)
    monkeypatch.setattr(dp, "SCORE_THRESH", 0.0)  # random weights: keep any
    det = DenseposeDetector(params=params)
    # the tiny oracle resnet downsamples like the real one; stages arg only
    # affects convert — forward reads the tree, so patch the trunk stages
    monkeypatch.setattr(
        dp, "resnet_forward",
        lambda p, x, stages=(3, 4, 6, 3): resnet_forward(p, x, stages=(3, 4, 6, 3)),
    )
    det._trunk = lambda p, x: det._trunk_fn(p, x)  # un-jitted, uses patched fn
    img = (rng.uniform(0, 255, (80, 100, 3))).astype(np.uint8)
    out = det(img)
    assert out.shape == (80, 100, 3) and out.dtype == np.uint8
