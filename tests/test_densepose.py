"""DensePose pipeline tests: backbone/FPN parity vs the vendored
detectron2, ROIAlign/ConvTranspose vs torch oracles, NMS properties, and
the full detector contract on synthetic weights."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch stage-parity: heavyweight, full lane only
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


def _np_conv2d(x, w, b=None, stride=1, pad=0, dil=1):
    """NCHW conv, torch semantics, via kernel-offset accumulation."""
    n, cin, h, wd = x.shape
    cout, _, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - dil * (kh - 1) - 1) // stride + 1
    ow = (wd + 2 * pad - dil * (kw - 1) - 1) // stride + 1
    out = np.zeros((n, cout, oh, ow), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, :, i * dil : i * dil + oh * stride : stride,
                       j * dil : j * dil + ow * stride : stride]
            out += np.einsum("nchw,oc->nohw", patch, w[:, :, i, j])
    if b is not None:
        out += b[None, :, None, None]
    return out


def _np_gn32(x, g, b, eps=1e-5):
    n, c, h, w = x.shape
    xg = x.reshape(n, 32, c // 32, h, w)
    m = xg.mean(axis=(2, 3, 4), keepdims=True)
    v = xg.var(axis=(2, 3, 4), keepdims=True)
    xg = (xg - m) / np.sqrt(v + eps)
    return xg.reshape(n, c, h, w) * g[None, :, None, None] + b[None, :, None, None]


def _np_convtranspose(x, w, b, stride=2, pad=1):
    """torch ConvTranspose2d: zero-insert upsample then correlate with the
    spatially-flipped, channel-transposed kernel (w is [cin, cout, k, k])."""
    n, cin, h, wd = x.shape
    _, cout, k, _ = w.shape
    z = np.zeros((n, cin, stride * (h - 1) + 1, stride * (wd - 1) + 1), x.dtype)
    z[:, :, ::stride, ::stride] = x
    wf = w[:, :, ::-1, ::-1].transpose(1, 0, 2, 3)  # -> [cout, cin, k, k]
    return _np_conv2d(z, wf, b, stride=1, pad=k - 1 - pad)


def _np_bilinear2x(x):
    """align_corners=False bilinear x2 (torch F.interpolate default)."""
    n, c, h, w = x.shape
    oh, ow = 2 * h, 2 * w
    ys = (np.arange(oh) + 0.5) / 2 - 0.5
    xs = (np.arange(ow) + 0.5) / 2 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - np.floor(ys), 0, 1)[None, None, :, None]
    fx = np.clip(xs - np.floor(xs), 0, 1)[None, None, None, :]
    fy = np.where((ys < 0)[None, None, :, None], 0.0, fy)
    fx = np.where((xs < 0)[None, None, None, :], 0.0, fx)
    a = x[:, :, y0][:, :, :, x0]
    bq = x[:, :, y0][:, :, :, x1]
    cq = x[:, :, y1][:, :, :, x0]
    d = x[:, :, y1][:, :, :, x1]
    return (a * (1 - fy) * (1 - fx) + bq * (1 - fy) * fx
            + cq * fy * (1 - fx) + d * fy * fx)


def test_deeplab_chart_head_weight_level_parity():
    """Round-2 gap: the DeepLab chart head had no weight-level validation.
    Synthesize a structurally exact head state dict (the test_bbox
    technique), push it through the convert_densepose bridge + jitted
    deeplab_head_forward, and match an independent numpy oracle that
    implements the published densepose-deeplab conventions from scratch
    (ASPP 1x1/dilated-6,12,56/image-pool branches, GN32, stacked 3x3 convs,
    ConvTranspose2d(k4,s2,p1) predictors, align_corners=False x2 upsample).
    Reference behavior: annotator/densepose/__init__.py:23-42 runs the
    published R_101_FPN_DL checkpoint through exactly this head."""
    from ctrlora_tpu.annotators.densepose import (
        convert_densepose, deeplab_head_forward,
    )

    sd = _dummy_head_sd()
    rng = np.random.default_rng(11)
    # non-trivial GN affines so normalization bugs can't hide
    for k in list(sd):
        if k.endswith(".norm.weight") or (".1.weight" in k and sd[k].ndim == 1):
            sd[k] = rng.uniform(0.5, 1.5, sd[k].shape).astype(np.float32)
        if k.endswith(".norm.bias") or (".1.bias" in k and sd[k].ndim == 1):
            sd[k] = rng.normal(0, 0.2, sd[k].shape).astype(np.float32)
    c = 16  # fpn channel width in the fixture
    stub = dict(sd)
    stub["backbone.bottom_up.stem.conv1.weight"] = rng.normal(
        0, 0.1, (8, 3, 7, 7)
    ).astype(np.float32)
    stub["backbone.bottom_up.stem.conv1.bias"] = np.zeros(8, np.float32)
    for si, nb in enumerate((1, 1, 1, 1)):
        for bi in range(nb):
            base = f"backbone.bottom_up.res{si+2}.{bi}"
            for cn, (co, ci) in (("conv1", (8, 8)), ("conv2", (8, 8)), ("conv3", (8, 8))):
                stub[f"{base}.{cn}.weight"] = rng.normal(0, 0.1, (co, ci, 1, 1)).astype(np.float32)
                stub[f"{base}.{cn}.bias"] = np.zeros(co, np.float32)
    for i in range(2, 6):
        stub[f"backbone.fpn_lateral{i}.weight"] = rng.normal(0, 0.1, (c, 8, 1, 1)).astype(np.float32)
        stub[f"backbone.fpn_lateral{i}.bias"] = np.zeros(c, np.float32)
        stub[f"backbone.fpn_output{i}.weight"] = rng.normal(0, 0.1, (c, c, 3, 3)).astype(np.float32)
        stub[f"backbone.fpn_output{i}.bias"] = np.zeros(c, np.float32)
    params = convert_densepose(stub, stages=(1, 1, 1, 1))

    n_stacked = int(params["dp_head"]["n_stacked"])
    assert n_stacked == 2  # the fixture's stacked-conv count was discovered
    pooled = rng.normal(0, 1, (2, 28, 28, c)).astype(np.float32)
    got = deeplab_head_forward(params["dp_head"], jnp.asarray(pooled),
                               n_stacked=n_stacked)
    got = {k: np.asarray(v) for k, v in got.items()}

    # ---- independent numpy oracle on the RAW state dict (NCHW) ----
    hb = "roi_heads.densepose_head."
    x = pooled.transpose(0, 3, 1, 2).astype(np.float64)

    def relu(v):
        return np.maximum(v, 0)

    def gn(base, v):
        return _np_gn32(v, sd[base + ".weight"], sd[base + ".bias"])

    branches = [relu(gn(hb + "ASPP.convs.0.1",
                        _np_conv2d(x, sd[hb + "ASPP.convs.0.0.weight"])))]
    for i, d in enumerate((6, 12, 56)):
        y = _np_conv2d(x, sd[hb + f"ASPP.convs.{i+1}.0.weight"], pad=d, dil=d)
        branches.append(relu(gn(hb + f"ASPP.convs.{i+1}.1", y)))
    pool = x.mean(axis=(2, 3), keepdims=True)
    pool = relu(_np_conv2d(pool, sd[hb + "ASPP.convs.4.1.weight"],
                           sd.get(hb + "ASPP.convs.4.1.bias")))
    branches.append(np.broadcast_to(
        pool, (pool.shape[0], pool.shape[1], x.shape[2], x.shape[3])
    ))
    y = np.concatenate(branches, axis=1)
    y = relu(gn(hb + "ASPP.project.1",
                _np_conv2d(y, sd[hb + "ASPP.project.0.weight"])))
    for i in range(n_stacked):
        y = relu(_np_conv2d(y, sd[hb + f"body_conv_fcn{i+1}.weight"],
                            sd[hb + f"body_conv_fcn{i+1}.bias"], pad=1))
    pb = "roi_heads.densepose_predictor."
    for name, key in (("ann_index_lowres", "coarse_segm"),
                      ("index_uv_lowres", "fine_segm"),
                      ("u_lowres", "u"), ("v_lowres", "v")):
        o = _np_convtranspose(y, sd[pb + name + ".weight"], sd[pb + name + ".bias"])
        o = _np_bilinear2x(o).transpose(0, 2, 3, 1)  # -> NHWC like the port
        np.testing.assert_allclose(
            got[key], o, atol=2e-3, rtol=1e-3,
            err_msg=f"chart head output {key} diverges from the numpy oracle",
        )
