"""Bounding-box annotator: YOLOv4 object detection + COCO color-mask drawing
(reference: annotator/bbox/__init__.py, which runs yolov4.weights through
cvlib/OpenCV-DNN).

TPU-native rework: the darknet graph is built directly from the shipped
yolov4.cfg (a mechanical translation of the 163-section file: convolutional/
route/shortcut/maxpool/upsample/yolo), weights are parsed from the original
darknet .weights binary (the same file the reference downloads), BNs are
folded at load, and the whole backbone runs as one jitted forward. Decoding
(sigmoid/scale_x_y box math, objectness x class scores, greedy NMS matching
cv2.dnn.NMSBoxes) and the reference's area-sorted color-mask drawing run on
host.

darknet BN semantics: x_hat = (x - mean) / (sqrt(var) + 1e-6) * scale + bias
(eps added to the std, not the variance — darknet blas.c normalize_cpu).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt

NET_SIZE = 416
N_CLASSES = 80

# COCO-80 names in darknet order (reference yolov3_classes.txt)
COCO_CLASSES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
]

# reference annotator/bbox/__init__.py:12-94 class -> RGB color
COLOR_DICT: Dict[str, Tuple[int, int, int]] = {
    "background": (0, 0, 100), "person": (255, 0, 0), "bicycle": (0, 255, 0),
    "car": (0, 0, 255), "motorcycle": (255, 255, 0), "airplane": (255, 0, 255),
    "bus": (0, 255, 255), "train": (128, 128, 0), "truck": (128, 0, 128),
    "boat": (0, 128, 128), "traffic light": (128, 128, 128),
    "fire hydrant": (64, 0, 0), "stop sign": (0, 64, 0),
    "parking meter": (0, 0, 64), "bench": (64, 64, 0), "bird": (64, 0, 64),
    "cat": (0, 64, 64), "dog": (192, 192, 192), "horse": (32, 32, 32),
    "sheep": (96, 96, 96), "cow": (160, 160, 160), "elephant": (224, 224, 224),
    "bear": (32, 0, 0), "zebra": (0, 32, 0), "giraffe": (0, 0, 32),
    "backpack": (32, 32, 0), "umbrella": (32, 0, 32), "handbag": (0, 32, 32),
    "tie": (96, 0, 0), "suitcase": (0, 96, 0), "frisbee": (0, 0, 96),
    "skis": (96, 96, 0), "snowboard": (96, 0, 96), "sports ball": (0, 96, 96),
    "kite": (160, 0, 0), "baseball bat": (0, 160, 0),
    "baseball glove": (0, 0, 160), "skateboard": (160, 160, 0),
    "surfboard": (160, 0, 160), "tennis racket": (0, 160, 160),
    "bottle": (224, 0, 0), "wine glass": (0, 224, 0), "cup": (0, 0, 224),
    "fork": (224, 224, 0), "knife": (224, 0, 224), "spoon": (0, 224, 224),
    "bowl": (64, 64, 64), "banana": (128, 64, 64), "apple": (64, 128, 64),
    "sandwich": (64, 64, 128), "orange": (128, 128, 64),
    "broccoli": (128, 64, 128), "carrot": (64, 128, 128),
    "hot dog": (192, 64, 64), "pizza": (64, 192, 64), "donut": (64, 64, 192),
    "cake": (192, 192, 64), "chair": (192, 64, 192), "couch": (64, 192, 192),
    "potted plant": (96, 32, 32), "bed": (32, 96, 32),
    "dining table": (32, 32, 96), "toilet": (96, 96, 32), "tv": (96, 32, 96),
    "laptop": (32, 96, 96), "mouse": (160, 32, 32), "remote": (32, 160, 32),
    "keyboard": (32, 32, 160), "cell phone": (160, 160, 32),
    "microwave": (160, 32, 160), "oven": (32, 160, 160),
    "toaster": (224, 32, 32), "sink": (32, 224, 32),
    "refrigerator": (32, 32, 224), "book": (224, 224, 32),
    "clock": (224, 32, 224), "vase": (32, 224, 224),
    "scissors": (64, 96, 96), "teddy bear": (96, 64, 96),
    "hair drier": (96, 96, 64), "toothbrush": (160, 96, 96),
}


# ---------------------------------------------------------------------------
# cfg parsing + graph
# ---------------------------------------------------------------------------

def parse_cfg(path: str) -> List[Tuple[str, Dict[str, str]]]:
    sections: List[Tuple[str, Dict[str, str]]] = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            if line.startswith("["):
                sections.append((line.strip("[]"), {}))
            else:
                k, v = line.split("=", 1)
                sections[-1][1][k.strip()] = v.strip()
    return sections


def default_cfg_path() -> str:
    """yolov4.cfg is distributed with the weights (AlexeyAB/darknet); place
    it next to yolov4.weights. (Not vendored here — the graph builder is
    cfg-driven, any darknet detection cfg works.)"""
    return os.path.join(ckpts_dir(), "yolov4.cfg")


def _act(name: str, x):
    if name == "mish":
        return x * jnp.tanh(jax.nn.softplus(x))
    if name == "leaky":
        return jnp.where(x > 0, x, 0.1 * x)
    if name == "linear":
        return x
    raise ValueError(name)


class YoloV4:
    """Darknet graph built from a .cfg; functional forward over a params
    list (one dict per convolutional section)."""

    def __init__(self, cfg_path: str | None = None):
        self.sections = parse_cfg(cfg_path or default_cfg_path())
        self.net = self.sections[0][1]
        self.layers = self.sections[1:]
        # static channel bookkeeping for the weight loader
        self.conv_specs: List[Dict] = []  # per conv: in_ch, filters, size, bn
        chans: List[int] = []
        c = int(self.net.get("channels", 3))
        for kind, opt in self.layers:
            if kind == "convolutional":
                f = int(opt["filters"])
                self.conv_specs.append({
                    "in": c, "filters": f, "size": int(opt["size"]),
                    "bn": opt.get("batch_normalize", "0") == "1",
                })
                c = f
            elif kind == "route":
                idxs = [int(v) for v in opt["layers"].split(",")]
                idxs = [i if i >= 0 else len(chans) + i for i in idxs]
                c = sum(chans[i] for i in idxs)
            elif kind in ("shortcut", "maxpool", "upsample", "yolo"):
                pass
            chans.append(c)
        self.yolo_meta = [
            {
                "mask": [int(v) for v in opt["mask"].split(",")],
                "anchors": np.array(
                    [int(v) for v in opt["anchors"].split(",")], np.float32
                ).reshape(-1, 2),
                "scale_x_y": float(opt.get("scale_x_y", 1.0)),
                "classes": int(opt.get("classes", N_CLASSES)),
            }
            for kind, opt in self.layers if kind == "yolo"
        ]

    # -- weights ----------------------------------------------------------
    def load_weights(self, path: str) -> List[Dict]:
        """Parse a darknet .weights file; returns the params list. BNs are
        folded into per-channel scale/bias."""
        with open(path, "rb") as f:
            major, minor, _rev = np.fromfile(f, np.int32, 3)
            if major * 10 + minor >= 2:
                np.fromfile(f, np.int64, 1)  # images seen
            else:
                np.fromfile(f, np.int32, 1)
            buf = np.fromfile(f, np.float32)
        return self._params_from_buffer(buf)

    def _params_from_buffer(self, buf: np.ndarray) -> List[Dict]:
        params, off = [], 0

        def take(n):
            nonlocal off
            v = buf[off:off + n]
            off += n
            return v

        for spec in self.conv_specs:
            f, cin, k = spec["filters"], spec["in"], spec["size"]
            if spec["bn"]:
                bias = take(f)
                scale = take(f)
                mean = take(f)
                var = take(f)
                g = scale / (np.sqrt(var) + 1e-6)  # darknet eps-on-std
                post_scale, post_bias = g, bias - mean * g
            else:
                post_scale = np.ones(f, np.float32)
                post_bias = take(f)
            w = take(f * cin * k * k).reshape(f, cin, k, k)
            params.append({
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "scale": jnp.asarray(post_scale.copy()),
                "bias": jnp.asarray(post_bias.copy()),
            })
        assert off == len(buf), f"weights file mismatch: used {off} of {len(buf)}"
        return params

    def n_weight_floats(self) -> int:
        n = 0
        for s in self.conv_specs:
            n += s["filters"] * (4 if s["bn"] else 1)
            n += s["filters"] * s["in"] * s["size"] ** 2
        return n

    # -- forward ----------------------------------------------------------
    def forward(self, params: List[Dict], x: jnp.ndarray) -> List[jnp.ndarray]:
        """x [1,H,W,3] (H,W mult of 32) -> raw yolo maps [1,gh,gw,255]."""
        outs: List[jnp.ndarray] = []
        yolo_raw: List[jnp.ndarray] = []
        ci = 0
        for kind, opt in self.layers:
            if kind == "convolutional":
                p = params[ci]
                ci += 1
                s = int(opt.get("stride", 1))
                k = int(opt["size"])
                pad = k // 2 if opt.get("pad", "0") == "1" else 0
                y = jax.lax.conv_general_dilated(
                    x, p["kernel"], (s, s), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = y * p["scale"] + p["bias"]
                x = _act(opt.get("activation", "linear"), y)
            elif kind == "route":
                idxs = [int(v) for v in opt["layers"].split(",")]
                idxs = [i if i >= 0 else len(outs) + i for i in idxs]
                x = jnp.concatenate([outs[i] for i in idxs], axis=-1)
            elif kind == "shortcut":
                i = int(opt["from"])
                i = i if i >= 0 else len(outs) + i
                x = _act(opt.get("activation", "linear"), x + outs[i])
            elif kind == "maxpool":
                k = int(opt["size"])
                pad = (k - 1) // 2
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
                    ((0, 0), (pad, k - 1 - pad), (pad, k - 1 - pad), (0, 0)),
                )
            elif kind == "upsample":
                s = int(opt.get("stride", 2))
                x = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
            elif kind == "yolo":
                yolo_raw.append(x)
            outs.append(x)
        return yolo_raw


# ---------------------------------------------------------------------------
# decode + NMS (host)
# ---------------------------------------------------------------------------

def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def decode_yolo(raw: np.ndarray, meta: Dict, net_w: int, net_h: int):
    """raw [gh,gw,3*(5+C)] -> (boxes_norm [N,4] cx,cy,w,h in 0..1,
    scores [N,C])."""
    gh, gw = raw.shape[:2]
    na = len(meta["mask"])
    C = meta["classes"]
    r = raw.reshape(gh, gw, na, 5 + C)
    sxy = meta["scale_x_y"]
    cx = (np.arange(gw, dtype=np.float32))[None, :, None]
    cy = (np.arange(gh, dtype=np.float32))[:, None, None]
    bx = (_sig(r[..., 0]) * sxy - 0.5 * (sxy - 1.0) + cx) / gw
    by = (_sig(r[..., 1]) * sxy - 0.5 * (sxy - 1.0) + cy) / gh
    anchors = meta["anchors"][meta["mask"]]
    bw = np.exp(r[..., 2]) * anchors[:, 0] / net_w
    bh = np.exp(r[..., 3]) * anchors[:, 1] / net_h
    obj = _sig(r[..., 4:5])
    cls = _sig(r[..., 5:]) * obj
    boxes = np.stack([bx, by, bw, bh], axis=-1).reshape(-1, 4)
    return boxes, cls.reshape(-1, C)


def nms_boxes(boxes: np.ndarray, scores: np.ndarray, score_thr: float,
              nms_thr: float) -> List[int]:
    """Greedy IoU NMS over [x,y,w,h] boxes — cv2.dnn.NMSBoxes semantics
    (score-descending, suppress IoU > nms_thr)."""
    order = np.argsort(-scores)
    keep: List[int] = []
    while len(order):
        i = order[0]
        if scores[i] < score_thr:
            break
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 0] + boxes[i, 2], boxes[rest, 0] + boxes[rest, 2])
        y2 = np.minimum(boxes[i, 1] + boxes[i, 3], boxes[rest, 1] + boxes[rest, 3])
        inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
        union = boxes[i, 2] * boxes[i, 3] + boxes[rest, 2] * boxes[rest, 3] - inter
        iou = inter / np.maximum(union, 1e-9)
        order = rest[iou <= nms_thr]
    return keep


def draw_bbox_mask(shape: Tuple[int, int, int], bboxes: List[List[int]],
                   labels: List[str]) -> np.ndarray:
    """The reference's mask drawing (annotator/bbox/__init__.py:115-145):
    clamp boxes, sort by area DESCENDING so small boxes paint over large."""
    h, w = shape[:2]
    mask = np.zeros(shape, np.uint8)
    if not bboxes:
        return mask
    areas = []
    clamped = []
    for (x1, y1, x2, y2) in bboxes:
        x1 = 0 if x1 < 0 else x1
        y1 = 0 if y1 < 0 else y1
        x2 = w if x2 < 0 else x2
        y2 = h if y2 < 0 else y2
        clamped.append((x1, y1, x2, y2))
        areas.append((x2 - x1) * (y2 - y1))
    for i in np.argsort(-np.asarray(areas)):
        x1, y1, x2, y2 = clamped[i]
        mask[y1:y2, x1:x2, :] = COLOR_DICT[labels[i]]
    return mask


class BBoxDetector:
    """reference annotator/bbox/__init__.py:97-145 (yolov4.weights)."""

    def __init__(self, weights_path: str | None = None,
                 cfg_path: str | None = None):
        self.net = YoloV4(cfg_path)
        path = weights_path or ensure_ckpt("yolov4.weights")
        self.params = self.net.load_weights(path)
        self._fwd = jax.jit(self.net.forward)

    def detect(self, image: np.ndarray, confidence: float = 0.4,
               nms_thresh: float = 0.5):
        """cvlib.detect_common_objects equivalent: returns (bboxes [x1,y1,
        x2,y2 in source pixels], labels, confidences)."""
        import cv2

        H, W = image.shape[:2]
        blob = cv2.resize(image, (NET_SIZE, NET_SIZE)).astype(np.float32) / 255.0
        raws = self._fwd(self.params, jnp.asarray(blob)[None])
        boxes_all, scores_all = [], []
        for raw, meta in zip(raws, self.net.yolo_meta):
            b, s = decode_yolo(np.asarray(raw)[0], meta, NET_SIZE, NET_SIZE)
            boxes_all.append(b)
            scores_all.append(s)
        boxes = np.concatenate(boxes_all)
        scores = np.concatenate(scores_all)
        cls_id = scores.argmax(-1)
        conf = scores[np.arange(len(scores)), cls_id]
        sel = conf > confidence
        boxes, cls_id, conf = boxes[sel], cls_id[sel], conf[sel]
        # to top-left pixel coords of the ORIGINAL image (cvlib scaling)
        px = np.stack([
            (boxes[:, 0] - boxes[:, 2] / 2) * W,
            (boxes[:, 1] - boxes[:, 3] / 2) * H,
            boxes[:, 2] * W, boxes[:, 3] * H,
        ], axis=1)
        keep = nms_boxes(px, conf, confidence, nms_thresh)
        out_boxes, labels, confs = [], [], []
        for i in keep:
            x, y, bw, bh = px[i]
            out_boxes.append([int(x), int(y), int(x + bw), int(y + bh)])
            labels.append(COCO_CLASSES[cls_id[i]])
            confs.append(float(conf[i]))
        return out_boxes, labels, confs

    def __call__(self, input_image: np.ndarray, confidence: float = 0.4,
                 nms_thresh: float = 0.5) -> np.ndarray:
        assert input_image.ndim == 3
        bboxes, labels, _ = self.detect(input_image, confidence, nms_thresh)
        return draw_bbox_mask(input_image.shape, bboxes, labels)
