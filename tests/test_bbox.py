"""YOLOv4 bbox annotator: cfg-driven graph, darknet weight parsing, decode
math, NMS, and the reference's mask-drawing contract.

No torch oracle exists offline (the reference runs via cvlib/OpenCV-DNN and
this image's cv2 5.0 has no dnn module), so correctness is established by
structural invariants, a full random-weights round trip, hand-computed
decode cases, and exact replication of the reference's numpy drawing code.
The cfg itself is read from the reference tree (read-only, test-time only).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ctrlora_tpu.annotators.bbox import (
    COCO_CLASSES, COLOR_DICT, YoloV4, decode_yolo, draw_bbox_mask, nms_boxes,
)

REF_CFG = "/root/reference/annotator/bbox/yolov4.cfg"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_CFG), reason="reference yolov4.cfg unavailable"
)


@pytest.fixture(scope="module")
def net():
    return YoloV4(REF_CFG)


def test_cfg_structure(net):
    kinds = [k for k, _ in net.layers]
    assert kinds.count("convolutional") == 110
    assert kinds.count("yolo") == 3
    assert kinds.count("shortcut") == 23
    assert kinds.count("upsample") == 2
    assert len(net.conv_specs) == 110
    # YOLOv4 heads: 255 = 3*(5+80) filters, masks cover all 9 anchors
    assert [m["mask"] for m in net.yolo_meta] == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    assert all(m["anchors"].shape == (9, 2) for m in net.yolo_meta)
    assert net.yolo_meta[0]["scale_x_y"] == 1.2
    # the real yolov4.weights is 257,717,640 bytes: 20-byte header +
    # 64,429,405 fp32 (= 64,363,101 params + BN running mean/var) — our
    # computed layout must match the published file exactly
    assert 20 + 4 * net.n_weight_floats() == 257717640
    assert len(COCO_CLASSES) == 80
    assert set(COCO_CLASSES) | {"background"} == set(COLOR_DICT)


@pytest.mark.slow  # fast-lane budget (VERDICT r5 #7): >25s on CPU
def test_weights_roundtrip_and_forward(net, tmp_path):
    rng = np.random.default_rng(0)
    n = net.n_weight_floats()
    # abs: the BN running-variance slots must be non-negative (as in any
    # real darknet file) or the fold's sqrt produces NaN
    buf = np.abs(rng.standard_normal(n) * 0.01).astype(np.float32)
    wfile = tmp_path / "yolov4.weights"
    with open(wfile, "wb") as f:
        np.asarray([0, 2, 5], np.int32).tofile(f)  # major=0 minor=2 rev
        np.asarray([32013312], np.int64).tofile(f)  # seen
        buf.tofile(f)
    params = net.load_weights(str(wfile))  # asserts full consumption
    assert len(params) == 110

    x = jnp.asarray(rng.standard_normal((1, 160, 160, 3)).astype(np.float32))
    raws = net.forward(params, x)
    # strides 8/16/32 -> grids 20, 10, 5; 255 channels each
    assert [tuple(r.shape) for r in raws] == [
        (1, 20, 20, 255), (1, 10, 10, 255), (1, 5, 5, 255)
    ]
    for r in raws:
        assert np.isfinite(np.asarray(r)).all()


def test_decode_math():
    """Hand-computed single-cell case with scale_x_y."""
    meta = {
        "mask": [0], "anchors": np.array([[32.0, 64.0]], np.float32),
        "scale_x_y": 1.2, "classes": 2,
    }
    gh = gw = 2
    raw = np.full((gh, gw, 1 * 7), -1e9, np.float32)  # sigmoid -> 0
    # cell (row=1, col=0): tx=0, ty=0, tw=ln2, th=0, obj=large, cls=[large, -inf]
    raw[1, 0] = [0.0, 0.0, np.log(2.0), 0.0, 20.0, 20.0, -20.0]
    boxes, scores = decode_yolo(raw, meta, 416, 416)
    i = 1 * gw + 0
    # bx = (sig(0)*1.2 - 0.1 + col)/gw = (0.5*1.2 - 0.1 + 0)/2 = 0.25
    np.testing.assert_allclose(boxes[i, 0], 0.25, rtol=1e-6)
    np.testing.assert_allclose(boxes[i, 1], (0.5 * 1.2 - 0.1 + 1) / 2, rtol=1e-6)
    np.testing.assert_allclose(boxes[i, 2], 2.0 * 32 / 416, rtol=1e-6)
    np.testing.assert_allclose(boxes[i, 3], 1.0 * 64 / 416, rtol=1e-6)
    np.testing.assert_allclose(scores[i, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(scores[i, 1], 0.0, atol=1e-6)


def test_nms():
    boxes = np.array([
        [0, 0, 10, 10],    # A
        [1, 1, 10, 10],    # overlaps A heavily -> suppressed
        [50, 50, 10, 10],  # far away -> kept
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_boxes(boxes, scores, score_thr=0.5, nms_thr=0.5)
    assert keep == [0, 2]
    # below-threshold boxes never survive
    assert nms_boxes(boxes, np.array([0.4, 0.3, 0.2], np.float32), 0.5, 0.5) == []


def test_mask_drawing_matches_reference_semantics():
    """Exact contract of annotator/bbox/__init__.py:115-145: negative x2/y2
    clamp to the image edge, larger boxes are painted first (area
    descending), colors from color_dict."""
    shape = (20, 30, 3)
    bboxes = [[0, 0, 20, 15], [2, 2, 6, 6], [5, 5, -1, -1]]
    labels = ["person", "dog", "cat"]
    mask = draw_bbox_mask(shape, bboxes, labels)
    # the negative-coord 'cat' box spans (5,5)-(30,20): area 375, largest ->
    # painted first, then person (300), then dog (16)
    assert tuple(mask[19, 29]) == COLOR_DICT["cat"]
    assert tuple(mask[1, 1]) == COLOR_DICT["person"]
    assert tuple(mask[3, 3]) == COLOR_DICT["dog"]
    assert tuple(mask[10, 10]) == COLOR_DICT["person"]  # person over cat
    assert tuple(mask[0, 25]) == (0, 0, 0)  # untouched background


def test_weights_file_numeric_parity(tmp_path, rng):
    """Weight-level check (round-1 gap): synthesize a darknet .weights file
    for a small cfg exercising every layer kind, parse it through
    YoloV4.load_weights, and match the forward against an independent numpy
    oracle implementing darknet's documented conventions (BN params stored
    bias/scale/mean/var, kernels [f,cin,k,k] row-major, eps on std)."""
    import numpy as np

    from ctrlora_tpu.annotators.bbox import YoloV4

    cfg = """
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=mish

[shortcut]
from=-2
activation=linear

[maxpool]
size=5
stride=1

[route]
layers=-1,-3

[convolutional]
batch_normalize=0
filters=255
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=12,16, 19,36, 40,28
classes=80
scale_x_y=1.2
"""
    cfg_path = tmp_path / "tiny.cfg"
    cfg_path.write_text(cfg)
    net = YoloV4(str(cfg_path))

    n = net.n_weight_floats()
    buf = (rng.normal(0, 0.3, n)).astype(np.float32)
    # variance slots must be positive: walk the darknet layout and abs them
    off = 0
    for spec in net.conv_specs:
        f = spec["filters"]
        if spec["bn"]:
            buf[off + 3 * f : off + 4 * f] = np.abs(buf[off + 3 * f : off + 4 * f])
            off += 4 * f
        else:
            off += f
        off += f * spec["in"] * spec["size"] ** 2
    assert off == n
    w_path = tmp_path / "tiny.weights"
    with open(w_path, "wb") as f:
        np.array([0, 2, 0], np.int32).tofile(f)
        np.array([123], np.int64).tofile(f)
        buf.tofile(f)

    # --- independent oracle: re-parse the same buffer by the darknet spec
    def conv2d(x, w, stride, pad):
        # x [H,W,C], w [f,cin,k,k]
        fo, cin, k, _ = w.shape
        xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
        oh = (xp.shape[0] - k) // stride + 1
        ow = (xp.shape[1] - k) // stride + 1
        out = np.zeros((oh, ow, fo), np.float32)
        for i in range(oh):
            for j in range(ow):
                patch = xp[i * stride : i * stride + k, j * stride : j * stride + k]
                # darknet kernels are [f, cin, ky, kx]
                out[i, j] = np.einsum("yxc,fcyx->f", patch, w)
        return out

    def mish(x):
        return x * np.tanh(np.log1p(np.exp(x)))

    off = 0

    def take(k):
        nonlocal off
        v = buf[off : off + k]
        off += k
        return v

    x0 = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    x, outs = x0, []
    for kind, opt in net.layers:
        if kind == "convolutional":
            fo = int(opt["filters"])
            k = int(opt["size"])
            bn = opt.get("batch_normalize", "0") == "1"
            cin = x.shape[-1]
            if bn:
                bias, scale, mean, var = take(fo), take(fo), take(fo), take(fo)
            else:
                bias = take(fo)
            w = take(fo * cin * k * k).reshape(fo, cin, k, k)
            y = conv2d(x, w, int(opt.get("stride", 1)), k // 2 if opt.get("pad") == "1" else 0)
            if bn:
                y = scale * (y - mean) / (np.sqrt(var) + 1e-6) + bias
            else:
                y = y + bias
            act = opt.get("activation", "linear")
            x = mish(y) if act == "mish" else (np.where(y > 0, y, 0.1 * y) if act == "leaky" else y)
        elif kind == "shortcut":
            x = x + outs[len(outs) + int(opt["from"])]
        elif kind == "maxpool":
            k = int(opt["size"])
            p = (k - 1) // 2
            xp = np.pad(x, ((p, k - 1 - p), (p, k - 1 - p), (0, 0)), constant_values=-1e30)
            x = np.stack([
                np.max(xp[i : i + k, j : j + k], axis=(0, 1))
                for i in range(x.shape[0]) for j in range(x.shape[1])
            ]).reshape(x.shape)
        elif kind == "route":
            idxs = [int(v) for v in opt["layers"].split(",")]
            x = np.concatenate([outs[i if i >= 0 else len(outs) + i] for i in idxs], -1)
        elif kind == "yolo":
            want = x
        outs.append(x)

    params = net.load_weights(str(w_path))
    got = net.forward(params, jnp.asarray(x0[None]))[0][0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
