"""OpenPose detector (reference: annotator/openpose/__init__.py): body pose,
optionally hands + face, rendered to a black canvas."""

from __future__ import annotations

import math
import os
from typing import Optional

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ctrlora_tpu.annotators.hed import ckpts_dir
from ctrlora_tpu.annotators.download import ensure_ckpt
from ctrlora_tpu.annotators.openpose import decode, models

EPS = 0.01

BODY_COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]

HAND_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8], [0, 9],
    [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15], [15, 16],
    [0, 17], [17, 18], [18, 19], [19, 20],
]


def smart_resize(x, s):
    Ht, Wt = s
    Ho, Wo = x.shape[:2]
    k = float(Ht + Wt) / float(Ho + Wo)
    interp = cv2.INTER_AREA if k < 1 else cv2.INTER_LANCZOS4
    if x.ndim == 2 or x.shape[2] in (1, 3):
        return cv2.resize(x, (int(Wt), int(Ht)), interpolation=interp)
    return np.stack(
        [cv2.resize(x[:, :, i], (int(Wt), int(Ht)), interpolation=interp)
         for i in range(x.shape[2])], axis=2,
    )


def pad_right_down(img, stride, pad_value):
    h, w = img.shape[:2]
    pad_d = 0 if h % stride == 0 else stride - h % stride
    pad_r = 0 if w % stride == 0 else stride - w % stride
    out = np.pad(img, ((0, pad_d), (0, pad_r), (0, 0)), constant_values=pad_value)
    return out, (0, 0, pad_d, pad_r)


def draw_bodypose(canvas, candidate, subset):
    H, W = canvas.shape[:2]
    candidate = np.asarray(candidate)
    subset = np.asarray(subset)
    for i in range(17):
        for n in range(len(subset)):
            index = subset[n][np.array(decode.LIMB_SEQ[i]) - 1]
            if -1 in index:
                continue
            Y = candidate[index.astype(int), 0] * float(W)
            X = candidate[index.astype(int), 1] * float(H)
            mX, mY = X.mean(), Y.mean()
            length = math.hypot(X[0] - X[1], Y[0] - Y[1])
            angle = math.degrees(math.atan2(X[0] - X[1], Y[0] - Y[1]))
            poly = cv2.ellipse2Poly(
                (int(mY), int(mX)), (int(length / 2), 4), int(angle), 0, 360, 1
            )
            cv2.fillConvexPoly(canvas, poly, BODY_COLORS[i])
    canvas = (canvas * 0.6).astype(np.uint8)
    for i in range(18):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            cv2.circle(canvas, (int(x * W), int(y * H)), 4, BODY_COLORS[i], -1)
    return canvas


def draw_handpose(canvas, all_hand_peaks):
    import colorsys

    H, W = canvas.shape[:2]
    for peaks in all_hand_peaks:
        peaks = np.asarray(peaks)
        for ie, e in enumerate(HAND_EDGES):
            x1, y1 = peaks[e[0]]
            x2, y2 = peaks[e[1]]
            x1, y1, x2, y2 = int(x1 * W), int(y1 * H), int(x2 * W), int(y2 * H)
            if min(x1, y1, x2, y2) > EPS:
                rgb = colorsys.hsv_to_rgb(ie / len(HAND_EDGES), 1.0, 1.0)
                cv2.line(canvas, (x1, y1), (x2, y2),
                         tuple(int(c * 255) for c in rgb), 2)
        for x, y in peaks:
            x, y = int(x * W), int(y * H)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), 4, (0, 0, 255), -1)
    return canvas


def draw_facepose(canvas, all_lmks):
    H, W = canvas.shape[:2]
    for lmks in all_lmks:
        for x, y in np.asarray(lmks):
            x, y = int(x * W), int(y * H)
            if x > EPS and y > EPS:
                cv2.circle(canvas, (x, y), 3, (255, 255, 255), -1)
    return canvas


def draw_pose(pose, H, W, draw_body=True, draw_hand=True, draw_face=True):
    canvas = np.zeros((H, W, 3), np.uint8)
    if draw_body:
        canvas = draw_bodypose(canvas, pose["bodies"]["candidate"], pose["bodies"]["subset"])
    if draw_hand:
        canvas = draw_handpose(canvas, pose["hands"])
    if draw_face:
        canvas = draw_facepose(canvas, pose["faces"])
    return canvas


def _load_flat(path):
    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return models.convert_flat({k: v.numpy() for k, v in sd.items()})


class Body:
    def __init__(self, params=None):
        self.params = params or _load_flat(ensure_ckpt("body_pose_model.pth"))
        if self.params is None:
            self.params = models.init_random(
                [models.BODY_BLOCK0, models.body_stage1(1), models.body_stage1(2)]
                + [models.body_stageN(i, L) for i in range(2, 7) for L in (1, 2)],
                np.random.default_rng(0),
            )
        self._fwd = jax.jit(models.body_forward)

    def __call__(self, ori_img, thre1=0.1, thre2=0.05):
        """(body.py:24-64) single-scale 0.5x368 inference + decode."""
        H, W = ori_img.shape[:2]
        scale = 0.5 * 368 / H
        stride, pad_value = 8, 128
        img = smart_resize(ori_img, (int(H * scale), int(W * scale)))
        padded, pad = pad_right_down(img, stride, pad_value)
        x = jnp.asarray(padded[None].astype(np.float32) / 256.0 - 0.5)
        paf, hm = self._fwd(self.params, x)
        paf, hm = np.asarray(paf)[0], np.asarray(hm)[0]

        def upsample(m):
            m = smart_resize(m.astype(np.float32), (m.shape[0] * stride, m.shape[1] * stride))
            m = m[: padded.shape[0] - pad[2], : padded.shape[1] - pad[3]]
            return smart_resize(m, (H, W))

        return decode.body_decode(upsample(hm), upsample(paf), thre1, thre2)


class Hand:
    def __init__(self, params=None):
        self.params = params or _load_flat(ensure_ckpt("hand_pose_model.pth"))
        if self.params is None:
            self.params = models.init_random(
                [models.HAND_BLOCK1_0, models.HAND_BLOCK1_1]
                + [models.hand_stageN(i) for i in range(2, 7)],
                np.random.default_rng(1),
            )
        self._fwd = jax.jit(models.hand_forward)

    def __call__(self, ori_img, scales=(0.5, 1.0, 1.5, 2.0)):
        """(hand.py:24-91) multi-scale heatmap averaging + blob peaks."""
        Hr, Wr = ori_img.shape[:2]
        wsize, stride, pad_value = 128, 8, 128
        blur = cv2.GaussianBlur(ori_img, (0, 0), 0.8)
        heat = np.zeros((wsize, wsize, 22), np.float32)
        for s in scales:
            size = int(s * 368)
            img = smart_resize(blur, (size, size))
            padded, pad = pad_right_down(img, stride, pad_value)
            x = jnp.asarray(padded[None].astype(np.float32) / 256.0 - 0.5)
            hm = np.asarray(self._fwd(self.params, x))[0]
            hm = smart_resize(hm, (hm.shape[0] * stride, hm.shape[1] * stride))
            hm = hm[: padded.shape[0] - pad[2], : padded.shape[1] - pad[3]]
            heat += smart_resize(hm, (wsize, wsize)) / len(scales)
        return decode.hand_peaks(heat, (Hr, Wr))


class Face:
    def __init__(self, params=None):
        self.params = params or _load_flat(ensure_ckpt("facenet.pth"))
        if self.params is None:
            self.params = models.init_random(
                [models.FACE_BASE, models.FACE_STAGE1]
                + [models.face_stageN(i) for i in range(2, 7)],
                np.random.default_rng(2),
            )
        self._fwd = jax.jit(models.face_forward)

    def __call__(self, face_img):
        """(face.py:331-346) 384px inference upsampled to the crop size."""
        H, W = face_img.shape[:2]
        x = smart_resize(face_img, (384, 384)).astype(np.float32) / 256.0 - 0.5
        hm = np.asarray(self._fwd(self.params, jnp.asarray(x[None])))[0]
        hm = smart_resize(hm, (H, W))
        return np.transpose(hm, (2, 0, 1))  # [71, H, W]


class OpenposeDetector:
    def __init__(self):
        self.body = Body()
        self.hand = Hand()
        self.face = Face()

    def __call__(self, ori_img, hand_and_face=False, return_is_index=False):
        ori_img = ori_img[:, :, ::-1].copy()  # reference feeds BGR
        H, W = ori_img.shape[:2]
        candidate, subset = self.body(ori_img)
        hands, faces = [], []
        if hand_and_face:
            for x, y, w, is_left in decode.hand_detect(candidate, subset, (H, W)):
                peaks = self.hand(ori_img[y : y + w, x : x + w]).astype(np.float32)
                if peaks.ndim == 2 and peaks.shape[1] == 2:
                    peaks[:, 0] = np.where(peaks[:, 0] < 1e-6, -1, peaks[:, 0] + x) / W
                    peaks[:, 1] = np.where(peaks[:, 1] < 1e-6, -1, peaks[:, 1] + y) / H
                    hands.append(peaks.tolist())
            for x, y, w in decode.face_detect(candidate, subset, (H, W)):
                hm = self.face(ori_img[y : y + w, x : x + w])
                peaks = decode.face_peaks(hm).astype(np.float32)
                if peaks.ndim == 2 and peaks.shape[1] == 2:
                    peaks[:, 0] = np.where(peaks[:, 0] < 1e-6, -1, peaks[:, 0] + x) / W
                    peaks[:, 1] = np.where(peaks[:, 1] < 1e-6, -1, peaks[:, 1] + y) / H
                    faces.append(peaks.tolist())
        if candidate.ndim == 2 and candidate.shape[1] == 4:
            candidate = candidate[:, :2].copy()
            candidate[:, 0] /= W
            candidate[:, 1] /= H
        pose = dict(
            bodies=dict(candidate=candidate.tolist(), subset=subset.tolist()),
            hands=hands, faces=faces,
        )
        if return_is_index:
            return pose
        return draw_pose(pose, H, W)
