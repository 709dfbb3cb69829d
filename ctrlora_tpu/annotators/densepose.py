"""DensePose annotator (densepose_rcnn_R_101_FPN_DL_s1x), JAX port.

Reference: annotator/densepose/__init__.py — the reference pip-installs
detectron2+densepose and runs DefaultPredictor with the R_101_FPN_DL config
(its two yamls are vendored and pinned here), then draws the fine
segmentation with the viridis colormap over a black canvas.

Native pipeline: ResNet-101 (FrozenBN folded) -> FPN p2..p6 -> RPN ->
top-1000 proposals (greedy NMS 0.7) -> ROIAlign-v1 7x7 box head -> person
detections (score 0.05, NMS 0.5) -> semantic-FPN style decoder ->
ROIAlign-v1 28x28 -> DeepLab chart head (ASPP + stacked convs) -> 112x112
I/U/V charts -> fine-segmentation visualization.

Heavy convs run jitted on device; box selection/NMS/pasting are host numpy
(the annotator is once-per-image, and dynamic box counts don't belong in a
compiled graph). Backbone/FPN are parity-tested against the vendored
detectron2 (tests/test_densepose.py); ROIAlign/NMS/delta-decode against
naive oracles. The DeepLab head follows the published densepose source;
weight-level validation needs the real checkpoint (zero-egress host) — the
bridge is name-exact so the shipped model_final_844d15.pkl state dict loads
directly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.oneformer.pixel_decoder import _resize_bilinear
from ctrlora_tpu.annotators.download import ensure_ckpt

PIXEL_MEAN = np.array([103.530, 116.280, 123.675], np.float32)  # BGR
MIN_SIZE_TEST, MAX_SIZE_TEST = 800, 1333
ANCHOR_SIZES = (32, 64, 128, 256, 512)  # p2..p6
ASPECT_RATIOS = (0.5, 1.0, 2.0)
PRE_NMS_TOPK, POST_NMS_TOPK = 1000, 1000
RPN_NMS_THRESH = 0.7
SCORE_THRESH, BOX_NMS_THRESH, MAX_DET = 0.05, 0.5, 100
N_PART_LABELS = 24  # fine segmentation classes 1..24 (+bg)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(p, x, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "scale" in p:  # folded FrozenBN
        y = y * p["scale"]
    return y + p["bias"] if "bias" in p else y


def _gn32(p, x, eps=1e-5):
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, 32, c // 32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# ResNet-101 (FrozenBN folded into conv scale/bias at bridge time)
# ---------------------------------------------------------------------------

R101_STAGES = (3, 4, 23, 3)


def _bottleneck(p, x, stride=1):
    # caffe-style STRIDE_IN_1X1=True (the detectron2 default the densepose
    # configs inherit): the stage stride lives in the first 1x1 conv
    out = jax.nn.relu(_conv(p["conv1"], x, stride=stride))
    out = jax.nn.relu(_conv(p["conv2"], out, stride=1, padding=1))
    out = _conv(p["conv3"], out)
    if "shortcut" in p:
        x = _conv(p["shortcut"], x, stride=stride)
    return jax.nn.relu(out + x)


def resnet_forward(params: Dict, x: jnp.ndarray,
                   stages: Sequence[int] = R101_STAGES) -> Dict[str, jnp.ndarray]:
    """x [B, H, W, 3] (BGR, mean-subtracted) -> {'res2'..'res5'} NHWC."""
    x = jax.nn.relu(_conv(params["stem"], x, stride=2, padding=3))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )
    outs = {}
    for si, n_blocks in enumerate(stages):
        stage = params[f"res{si + 2}"]
        for bi in range(n_blocks):
            # detectron2: stride-2 lives in the FIRST block of res3..res5
            stride = 2 if (bi == 0 and si > 0) else 1
            x = _bottleneck(stage[f"block{bi}"], x, stride=stride)
        outs[f"res{si + 2}"] = x
    return outs


def fpn_forward(params: Dict, feats: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
    """-> [p2, p3, p4, p5, p6] NHWC, 256ch (detectron2 FPN: 1x1 lateral,
    nearest 2x top-down sum, 3x3 output conv; p6 = maxpool-s2(p5))."""
    laterals = [
        _conv(params[f"lateral{i}"], feats[f"res{i}"]) for i in range(2, 6)
    ]
    for i in range(len(laterals) - 2, -1, -1):
        up = laterals[i + 1]
        up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
        up = up[:, : laterals[i].shape[1], : laterals[i].shape[2]]
        laterals[i] = laterals[i] + up
    ps = [
        _conv(params[f"output{i + 2}"], lat, padding=1)
        for i, lat in enumerate(laterals)
    ]
    p6 = jax.lax.reduce_window(
        ps[-1], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "VALID"
    )
    return ps + [p6]


# ---------------------------------------------------------------------------
# RPN
# ---------------------------------------------------------------------------

def rpn_head_forward(params: Dict, feats: Sequence[jnp.ndarray]):
    """Shared head over levels -> [(objectness [B,H,W,A], deltas [B,H,W,A*4])]."""
    outs = []
    for f in feats:
        t = jax.nn.relu(_conv(params["conv"], f, padding=1))
        outs.append((
            _conv(params["objectness"], t),
            _conv(params["deltas"], t),
        ))
    return outs


def level_anchors(h: int, w: int, stride: int, size: int) -> np.ndarray:
    """detectron2 DefaultAnchorGenerator: centered at pixel*stride (offset
    0.0), XYXY. Returns [H*W*A, 4], A ordered by aspect ratio."""
    base = []
    area = float(size * size)
    for ar in ASPECT_RATIOS:
        bw = np.sqrt(area / ar)
        bh = ar * bw
        base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
    base = np.asarray(base, np.float32)  # [A, 4]
    sx = np.arange(w, dtype=np.float32) * stride
    sy = np.arange(h, dtype=np.float32) * stride
    shift_x, shift_y = np.meshgrid(sx, sy)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_deltas(anchors: np.ndarray, deltas: np.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> np.ndarray:
    """Box2BoxTransform.apply_deltas (detectron2 box_regression.py)."""
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, deltas[:, 2] / ww, deltas[:, 3] / wh
    clip = np.log(1000.0 / 16)
    dw, dh = np.minimum(dw, clip), np.minimum(dh, clip)
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = np.exp(dw) * aw
    h = np.exp(dh) * ah
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy IoU NMS; returns kept indices sorted by score."""
    order = np.argsort(-scores)
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= thresh]
    return np.asarray(keep, np.int64)


def rpn_proposals(rpn_outs, strides, img_hw) -> np.ndarray:
    """find_top_rpn_proposals (inference): per-level topk -> decode -> clip
    -> per-level NMS (batched via level offset) -> global top-1000."""
    all_boxes, all_scores, all_levels = [], [], []
    for lvl, ((obj, deltas), stride, size) in enumerate(
        zip(rpn_outs, strides, ANCHOR_SIZES)
    ):
        h, w = obj.shape[1], obj.shape[2]
        a = len(ASPECT_RATIOS)
        # [B,H,W,A] -> [H*W*A] (batch 1); anchors are HWA-ordered
        scores = np.asarray(obj, np.float32)[0].reshape(-1)
        dl = np.asarray(deltas, np.float32)[0].reshape(h * w, a, 4).reshape(-1, 4)
        anchors = level_anchors(h, w, stride, size)
        k = min(PRE_NMS_TOPK, scores.size)
        top = np.argpartition(-scores, k - 1)[:k]
        boxes = decode_deltas(anchors[top], dl[top])
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, img_hw[1])
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, img_hw[0])
        all_boxes.append(boxes)
        all_scores.append(scores[top])
        all_levels.append(np.full(k, lvl))
    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    levels = np.concatenate(all_levels)
    # batched NMS: offset boxes by level so levels never suppress each other
    offset = levels[:, None] * (max(img_hw) + 1)
    keep = nms(boxes + offset, scores, RPN_NMS_THRESH)[:POST_NMS_TOPK]
    return boxes[keep], scores[keep]


# ---------------------------------------------------------------------------
# ROIAlign v1 (aligned=False — POOLER_TYPE 'ROIAlign' in both yamls)
# ---------------------------------------------------------------------------

def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, scale: float,
              out_size: int, sampling: int = 2) -> jnp.ndarray:
    """feat [1, H, W, C]; boxes [N, 4] XYXY image coords -> [N, out, out, C].
    torchvision roi_align(aligned=False) arithmetic."""
    n = boxes.shape[0]
    x1, y1, x2, y2 = (boxes[:, i] * scale for i in range(4))
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)
    bin_w = rw / out_size
    bin_h = rh / out_size
    # sample grid: [N, out*sampling] coords per axis
    idx = (jnp.arange(out_size * sampling) + 0.5) / sampling
    xs = x1[:, None] + idx[None, :] * bin_w[:, None]
    ys = y1[:, None] + idx[None, :] * bin_h[:, None]

    h, w = feat.shape[1], feat.shape[2]
    f = feat[0]

    def bilinear(yq, xq):
        # torchvision: out-of-range (< -1 or > size) -> 0; clamp to edges
        valid = (yq > -1.0) & (yq < h) & (xq > -1.0) & (xq < w)
        yq = jnp.clip(yq, 0.0, h - 1)
        xq = jnp.clip(xq, 0.0, w - 1)
        y0 = jnp.floor(yq).astype(jnp.int32)
        x0 = jnp.floor(xq).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = yq - y0
        wx = xq - x0
        v = (
            f[y0, x0] * ((1 - wy) * (1 - wx))[..., None]
            + f[y0, x1i] * ((1 - wy) * wx)[..., None]
            + f[y1i, x0] * (wy * (1 - wx))[..., None]
            + f[y1i, x1i] * (wy * wx)[..., None]
        )
        return v * valid[..., None]

    yy = jnp.broadcast_to(ys[:, :, None], (n, ys.shape[1], xs.shape[1]))
    xx = jnp.broadcast_to(xs[:, None, :], (n, ys.shape[1], xs.shape[1]))
    sampled = bilinear(yy, xx)  # [N, out*s, out*s, C]
    c = sampled.shape[-1]
    sampled = sampled.reshape(n, out_size, sampling, out_size, sampling, c)
    return sampled.mean(axis=(2, 4))


def assign_levels(boxes: np.ndarray, k_min=2, k_max=5) -> np.ndarray:
    """FPN ROI level assignment (poolers.py: floor(4 + log2(sqrt(area)/224)))."""
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lv = np.floor(4 + np.log2(np.sqrt(areas) / 224 + 1e-8))
    return np.clip(lv, k_min, k_max).astype(np.int64)


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------

def box_head_forward(params: Dict, pooled: jnp.ndarray):
    """pooled [N, 7, 7, 256] -> (person_scores [N], deltas [N, 4])."""
    n = pooled.shape[0]
    # torch flattens NCHW; match its element order
    x = pooled.transpose(0, 3, 1, 2).reshape(n, -1)
    x = jax.nn.relu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    x = jax.nn.relu(x @ params["fc2"]["kernel"] + params["fc2"]["bias"])
    logits = x @ params["cls_score"]["kernel"] + params["cls_score"]["bias"]
    deltas = x @ params["bbox_pred"]["kernel"] + params["bbox_pred"]["bias"]
    scores = jax.nn.softmax(logits, axis=-1)[:, 0]  # class 0 = person
    return scores, deltas


def decoder_forward(params: Dict, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """DensePose Decoder (semantic-FPN style over p2..p5 -> 1/4-scale map).
    scale_heads.{i}: [conv3x3+GN+relu, (upx2)]* until stride 4; summed;
    predictor 1x1."""
    total = None
    for i, f in enumerate(feats[:4]):
        x = f
        n_ops = max(1, i)  # p2: 1 conv; p3: conv+up; p4: conv,up,conv,up ...
        for j in range(n_ops):
            p = params[f"scale_head_{i}"][f"op_{j}"]
            x = jax.nn.relu(_gn32(p["norm"], _conv(p["conv"], x, padding=1)))
            if i > 0:
                x = _resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        total = x if total is None else total + x
    return _conv(params["predictor"], total)


def _aspp(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """ASPP with dilations (6, 12, 56) + image pooling (densepose deeplab)."""
    b, h, w, _ = x.shape
    branches = [jax.nn.relu(_gn32(params["conv1"]["norm"], _conv(params["conv1"]["conv"], x)))]
    for i, d in enumerate((6, 12, 56)):
        p = params[f"dil{i}"]
        y = jax.lax.conv_general_dilated(
            x, p["conv"]["kernel"], (1, 1), ((d, d), (d, d)),
            rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # ASPPConv convs are bias-free (followed by GN) in detectron2;
        # tolerate a bias if a checkpoint carries one
        if "bias" in p["conv"]:
            y = y + p["conv"]["bias"]
        branches.append(jax.nn.relu(_gn32(p["norm"], y)))
    pool = x.mean(axis=(1, 2), keepdims=True)
    pool = jax.nn.relu(_conv(params["pool"]["conv"], pool) )
    pool = jnp.broadcast_to(pool, (b, h, w, pool.shape[-1]))
    branches.append(pool)
    y = jnp.concatenate(branches, axis=-1)
    return jax.nn.relu(_gn32(params["project"]["norm"], _conv(params["project"]["conv"], y)))


def deeplab_head_forward(params: Dict, pooled: jnp.ndarray, n_stacked: int = 8):
    """pooled [N, 28, 28, 256] -> chart outputs at 112x112:
    coarse_segm [N,.,.,2], fine_segm [N,.,.,25], u/v [N,.,.,25]."""
    x = _aspp(params["aspp"], pooled)
    for i in range(n_stacked):
        x = jax.nn.relu(_conv(params[f"conv{i}"], x, padding=1))

    def head(name):
        p = params[name]
        # ConvTranspose2d(k4, s2, p1) == transposed conv; in XLA:
        y = jax.lax.conv_transpose(
            x, p["kernel"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        ) + p["bias"]
        return _resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2))

    return {
        "coarse_segm": head("ann_index_lowres"),
        "fine_segm": head("index_uv_lowres"),
        "u": head("u_lowres"),
        "v": head("v_lowres"),
    }


# ---------------------------------------------------------------------------
# weight bridge (detectron2 checkpoint names, FrozenBN folded)
# ---------------------------------------------------------------------------

def _t(sd, k):
    return np.asarray(sd[k], np.float32)


def _fold_conv(sd, k, eps=1e-5):
    out = {"kernel": _t(sd, k + ".weight").transpose(2, 3, 1, 0)}
    if k + ".norm.weight" in sd:
        g, b = _t(sd, k + ".norm.weight"), _t(sd, k + ".norm.bias")
        mean, var = _t(sd, k + ".norm.running_mean"), _t(sd, k + ".norm.running_var")
        scale = g / np.sqrt(var + eps)
        out["scale"] = scale
        out["bias"] = b - mean * scale
    elif k + ".bias" in sd:
        out["bias"] = _t(sd, k + ".bias")
    return out


def _gn(sd, k):
    return {"scale": _t(sd, k + ".weight"), "bias": _t(sd, k + ".bias")}


def _fc(sd, k):
    return {"kernel": _t(sd, k + ".weight").T, "bias": _t(sd, k + ".bias")}


def convert_densepose(sd: Dict[str, np.ndarray],
                      stages: Sequence[int] = R101_STAGES) -> Dict:
    p: Dict = {"backbone": {}, "fpn": {}, "rpn": {}, "box": {},
               "decoder": {}, "dp_head": {}}
    bb = p["backbone"]
    bu = "backbone.bottom_up."
    bb["stem"] = _fold_conv(sd, bu + "stem.conv1")
    for si, n_blocks in enumerate(stages):
        stage: Dict = {}
        for bi in range(n_blocks):
            base = f"{bu}res{si + 2}.{bi}"
            blk = {c: _fold_conv(sd, f"{base}.{c}") for c in ("conv1", "conv2", "conv3")}
            if f"{base}.shortcut.weight" in sd:
                blk["shortcut"] = _fold_conv(sd, f"{base}.shortcut")
            stage[f"block{bi}"] = blk
        bb[f"res{si + 2}"] = stage
    for i in range(2, 6):
        p["fpn"][f"lateral{i}"] = _fold_conv(sd, f"backbone.fpn_lateral{i}")
        p["fpn"][f"output{i}"] = _fold_conv(sd, f"backbone.fpn_output{i}")
    p["rpn"] = {
        "conv": _fold_conv(sd, "proposal_generator.rpn_head.conv"),
        "objectness": _fold_conv(sd, "proposal_generator.rpn_head.objectness_logits"),
        "deltas": _fold_conv(sd, "proposal_generator.rpn_head.anchor_deltas"),
    }
    p["box"] = {
        "fc1": _fc(sd, "roi_heads.box_head.fc1"),
        "fc2": _fc(sd, "roi_heads.box_head.fc2"),
        "cls_score": _fc(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _fc(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    dec: Dict = {}
    for i in range(4):
        head: Dict = {}
        for j in range(max(1, i)):
            # Sequential packs Conv2d(norm=GN) at even slots, Upsample (no
            # params) at odd slots: conv j lives at index 2*j
            base = f"roi_heads.decoder.scale_heads.{i}.{2 * j}"
            head[f"op_{j}"] = {
                "conv": {"kernel": _t(sd, base + ".weight").transpose(2, 3, 1, 0)},
                "norm": _gn(sd, base + ".norm"),
            }
        dec[f"scale_head_{i}"] = head
    dec["predictor"] = _fold_conv(sd, "roi_heads.decoder.predictor")
    p["decoder"] = dec

    dp: Dict = {}
    hb = "roi_heads.densepose_head."
    aspp: Dict = {}
    # densepose deeplab ASPP: convs.0 (1x1), convs.1..3 (dilated ASPPConv:
    # .0 conv + .1 GN), convs.4 (ASPPPooling: .1 conv), project (.0 conv + .1 GN)
    aspp["conv1"] = {
        "conv": _fold_conv(sd, hb + "ASPP.convs.0.0"),
        "norm": _gn(sd, hb + "ASPP.convs.0.1"),
    }
    for i in range(3):
        aspp[f"dil{i}"] = {
            "conv": _fold_conv(sd, hb + f"ASPP.convs.{i + 1}.0"),
            "norm": _gn(sd, hb + f"ASPP.convs.{i + 1}.1"),
        }
    aspp["pool"] = {"conv": _fold_conv(sd, hb + "ASPP.convs.4.1")}
    aspp["project"] = {
        "conv": _fold_conv(sd, hb + "ASPP.project.0"),
        "norm": _gn(sd, hb + "ASPP.project.1"),
    }
    dp["aspp"] = aspp
    i = 0
    while hb + f"body_conv_fcn{i + 1}.weight" in sd:
        dp[f"conv{i}"] = _fold_conv(sd, hb + f"body_conv_fcn{i + 1}")
        i += 1
    dp["n_stacked"] = i
    pb = "roi_heads.densepose_predictor."
    for name in ("ann_index_lowres", "index_uv_lowres", "u_lowres", "v_lowres"):
        w = _t(sd, pb + name + ".weight")  # ConvTranspose [cin, cout, k, k]
        dp[name] = {
            "kernel": w.transpose(2, 3, 1, 0),  # -> HWIO with I=cin
            "bias": _t(sd, pb + name + ".bias"),
        }
    p["dp_head"] = dp
    return jax.tree_util.tree_map(
        lambda v: jnp.asarray(v) if isinstance(v, np.ndarray) else v, p
    )


# ---------------------------------------------------------------------------
# detector
# ---------------------------------------------------------------------------

class DenseposeDetector:
    """RGB uint8 -> fine-segmentation IUV visualization (viridis over black),
    the reference's output contract (annotator/densepose/__init__.py:33-43)."""

    def __init__(self, ckpt_path=None, params=None):
        if params is None:
            from ctrlora_tpu.annotators.hed import ckpts_dir
            import os

            ckpt_path = ckpt_path or ensure_ckpt("model_final_844d15.pkl")
            if not os.path.exists(ckpt_path):
                raise FileNotFoundError(
                    f"DensePose weights not found: {ckpt_path} — download "
                    "https://dl.fbaipublicfiles.com/densepose/densepose_rcnn_"
                    "R_101_FPN_DL_s1x/165712116/model_final_844d15.pkl"
                )
            params = convert_densepose(_load_pkl(ckpt_path))
        self.params = params
        self._trunk = jax.jit(self._trunk_fn)

    def _trunk_fn(self, params, x):
        feats = resnet_forward(params["backbone"], x)
        ps = fpn_forward(params["fpn"], feats)
        rpn = rpn_head_forward(params["rpn"], ps)
        return ps, rpn

    def detect(self, img_rgb: np.ndarray):
        """-> (boxes [N,4] in input coords, chart dicts per box, resized hw)."""
        from PIL import Image

        h0, w0 = img_rgb.shape[:2]
        scale = MIN_SIZE_TEST / min(h0, w0)
        nh, nw = int(h0 * scale + 0.5), int(w0 * scale + 0.5)
        if max(nh, nw) > MAX_SIZE_TEST:
            s2 = MAX_SIZE_TEST / max(nh, nw)
            nh, nw = int(nh * s2 + 0.5), int(nw * s2 + 0.5)
        resized = np.asarray(
            Image.fromarray(img_rgb).resize((nw, nh), Image.BILINEAR), np.float32
        )
        bgr = resized[:, :, ::-1] - PIXEL_MEAN
        pad_h = (-nh) % 32
        pad_w = (-nw) % 32
        x = np.pad(bgr, ((0, pad_h), (0, pad_w), (0, 0)))[None]

        ps, rpn = self._trunk(self.params, jnp.asarray(x))
        strides = [4, 8, 16, 32, 64]
        proposals, _ = rpn_proposals(rpn, strides, (nh, nw))
        if not len(proposals):
            return np.zeros((0, 4)), [], (nh, nw)

        # box head over FPN levels
        levels = assign_levels(proposals)
        c_fpn = ps[0].shape[-1]
        pooled = np.zeros((len(proposals), 7, 7, c_fpn), np.float32)
        for lv in np.unique(levels):
            sel = np.where(levels == lv)[0]
            pooled[sel] = np.asarray(roi_align(
                ps[lv - 2], jnp.asarray(proposals[sel]), 1.0 / strides[lv - 2], 7, 2
            ))
        scores, deltas = box_head_forward(self.params["box"], jnp.asarray(pooled))
        scores = np.asarray(scores)
        boxes = decode_deltas(proposals, np.asarray(deltas), weights=(10, 10, 5, 5))
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, nw)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, nh)
        keep = scores > SCORE_THRESH
        boxes, scores = boxes[keep], scores[keep]
        if not len(boxes):
            return np.zeros((0, 4)), [], (nh, nw)
        keep = nms(boxes, scores, BOX_NMS_THRESH)[:MAX_DET]
        boxes = boxes[keep]

        # densepose head over the decoder feature map
        dec = decoder_forward(self.params["decoder"], ps)
        charts = []
        pooled28 = roi_align(dec, jnp.asarray(boxes), 0.25, 28, 2)
        out = deeplab_head_forward(
            self.params["dp_head"], pooled28,
            n_stacked=int(self.params["dp_head"]["n_stacked"]),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        for i in range(len(boxes)):
            charts.append({k: v[i] for k, v in out.items()})
        return boxes, charts, (nh, nw)

    def __call__(self, img_rgb: np.ndarray) -> np.ndarray:
        import cv2

        h0, w0 = img_rgb.shape[:2]
        boxes, charts, (nh, nw) = self.detect(img_rgb)
        canvas = cv2.applyColorMap(
            np.zeros((nh, nw), np.uint8), cv2.COLORMAP_VIRIDIS
        )
        for box, chart in zip(boxes, charts):
            x1, y1, x2, y2 = [int(round(v)) for v in box]
            x2, y2 = min(x2, nw), min(y2, nh)
            if x2 <= x1 or y2 <= y1:
                continue
            coarse = chart["coarse_segm"]
            fine = chart["fine_segm"]
            labels = np.argmax(fine, -1) * (np.argmax(coarse, -1) > 0)
            labels = cv2.resize(
                labels.astype(np.uint8), (x2 - x1, y2 - y1),
                interpolation=cv2.INTER_NEAREST,
            )
            vis = cv2.applyColorMap(
                (labels.astype(np.float32) * (255.0 / N_PART_LABELS))
                .clip(0, 255).astype(np.uint8),
                cv2.COLORMAP_VIRIDIS,
            )
            region = canvas[y1:y2, x1:x2]
            mask = labels > 0
            region[mask] = vis[mask]
        out = cv2.resize(canvas, (w0, h0), interpolation=cv2.INTER_LINEAR)
        return out[:, :, ::-1]  # BGR colormap canvas -> RGB


def _load_pkl(path: str) -> Dict[str, np.ndarray]:
    """detectron2 .pkl checkpoints are pickled {'model': {name: ndarray}}."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    model = data.get("model", data)
    return {k: np.asarray(v) for k, v in model.items() if hasattr(v, "shape")}
