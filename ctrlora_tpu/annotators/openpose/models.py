"""OpenPose CNNs (body / hand / face), Flax-free functional JAX port.

The reference nets (annotator/openpose/model.py, face.py:12-229) are plain
VGG-style conv stacks built from OrderedDict specs; checkpoints use the flat
conv names (util.transfer strips the sequential prefix). We mirror that: a
spec is a list of (name, cfg) where cfg = [in, out, k, stride, pad] for convs
or [k, stride, pad] for pools, and params is a flat {name: {kernel, bias}}.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _conv_spec(pairs):
    return [(n, list(v)) for n, v in pairs]


BODY_BLOCK0 = _conv_spec([
    ("conv1_1", [3, 64, 3, 1, 1]), ("conv1_2", [64, 64, 3, 1, 1]),
    ("pool1_stage1", [2, 2, 0]),
    ("conv2_1", [64, 128, 3, 1, 1]), ("conv2_2", [128, 128, 3, 1, 1]),
    ("pool2_stage1", [2, 2, 0]),
    ("conv3_1", [128, 256, 3, 1, 1]), ("conv3_2", [256, 256, 3, 1, 1]),
    ("conv3_3", [256, 256, 3, 1, 1]), ("conv3_4", [256, 256, 3, 1, 1]),
    ("pool3_stage1", [2, 2, 0]),
    ("conv4_1", [256, 512, 3, 1, 1]), ("conv4_2", [512, 512, 3, 1, 1]),
    ("conv4_3_CPM", [512, 256, 3, 1, 1]), ("conv4_4_CPM", [256, 128, 3, 1, 1]),
])


def body_stage1(L):
    ch = 38 if L == 1 else 19
    return _conv_spec([
        (f"conv5_1_CPM_L{L}", [128, 128, 3, 1, 1]),
        (f"conv5_2_CPM_L{L}", [128, 128, 3, 1, 1]),
        (f"conv5_3_CPM_L{L}", [128, 128, 3, 1, 1]),
        (f"conv5_4_CPM_L{L}", [128, 512, 1, 1, 0]),
        (f"conv5_5_CPM_L{L}", [512, ch, 1, 1, 0]),
    ])


def body_stageN(i, L):
    ch = 38 if L == 1 else 19
    return _conv_spec([
        (f"Mconv1_stage{i}_L{L}", [185, 128, 7, 1, 3]),
        (f"Mconv2_stage{i}_L{L}", [128, 128, 7, 1, 3]),
        (f"Mconv3_stage{i}_L{L}", [128, 128, 7, 1, 3]),
        (f"Mconv4_stage{i}_L{L}", [128, 128, 7, 1, 3]),
        (f"Mconv5_stage{i}_L{L}", [128, 128, 7, 1, 3]),
        (f"Mconv6_stage{i}_L{L}", [128, 128, 1, 1, 0]),
        (f"Mconv7_stage{i}_L{L}", [128, ch, 1, 1, 0]),
    ])


# NB: the reference's no_relu_layers list (model.py:29-32) repeats
# 'Mconv7_stage6_L1' instead of listing 'Mconv7_stage6_L2', so the final
# heatmap head DOES get a ReLU there — reproduced bit-for-bit here
BODY_NO_RELU = {
    "conv5_5_CPM_L1", "conv5_5_CPM_L2",
    *{f"Mconv7_stage{i}_L{L}" for i in range(2, 7) for L in (1, 2)},
} - {"Mconv7_stage6_L2"}

HAND_BLOCK1_0 = _conv_spec([
    ("conv1_1", [3, 64, 3, 1, 1]), ("conv1_2", [64, 64, 3, 1, 1]),
    ("pool1_stage1", [2, 2, 0]),
    ("conv2_1", [64, 128, 3, 1, 1]), ("conv2_2", [128, 128, 3, 1, 1]),
    ("pool2_stage1", [2, 2, 0]),
    ("conv3_1", [128, 256, 3, 1, 1]), ("conv3_2", [256, 256, 3, 1, 1]),
    ("conv3_3", [256, 256, 3, 1, 1]), ("conv3_4", [256, 256, 3, 1, 1]),
    ("pool3_stage1", [2, 2, 0]),
    ("conv4_1", [256, 512, 3, 1, 1]), ("conv4_2", [512, 512, 3, 1, 1]),
    ("conv4_3", [512, 512, 3, 1, 1]), ("conv4_4", [512, 512, 3, 1, 1]),
    ("conv5_1", [512, 512, 3, 1, 1]), ("conv5_2", [512, 512, 3, 1, 1]),
    ("conv5_3_CPM", [512, 128, 3, 1, 1]),
])

HAND_BLOCK1_1 = _conv_spec([
    ("conv6_1_CPM", [128, 512, 1, 1, 0]), ("conv6_2_CPM", [512, 22, 1, 1, 0]),
])


def hand_stageN(i):
    return _conv_spec([
        (f"Mconv1_stage{i}", [150, 128, 7, 1, 3]),
        (f"Mconv2_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv3_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv4_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv5_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv6_stage{i}", [128, 128, 1, 1, 0]),
        (f"Mconv7_stage{i}", [128, 22, 1, 1, 0]),
    ])


HAND_NO_RELU = {"conv6_2_CPM", *{f"Mconv7_stage{i}" for i in range(2, 7)}}

FACE_BASE = _conv_spec([
    ("conv1_1", [3, 64, 3, 1, 1]), ("conv1_2", [64, 64, 3, 1, 1]),
    ("pool1", [2, 2, 0]),
    ("conv2_1", [64, 128, 3, 1, 1]), ("conv2_2", [128, 128, 3, 1, 1]),
    ("pool2", [2, 2, 0]),
    ("conv3_1", [128, 256, 3, 1, 1]), ("conv3_2", [256, 256, 3, 1, 1]),
    ("conv3_3", [256, 256, 3, 1, 1]), ("conv3_4", [256, 256, 3, 1, 1]),
    ("pool3", [2, 2, 0]),
    ("conv4_1", [256, 512, 3, 1, 1]), ("conv4_2", [512, 512, 3, 1, 1]),
    ("conv4_3", [512, 512, 3, 1, 1]), ("conv4_4", [512, 512, 3, 1, 1]),
    ("conv5_1", [512, 512, 3, 1, 1]), ("conv5_2", [512, 512, 3, 1, 1]),
    ("conv5_3_CPM", [512, 128, 3, 1, 1]),
])

FACE_STAGE1 = _conv_spec([
    ("conv6_1_CPM", [128, 512, 1, 1, 0]), ("conv6_2_CPM", [512, 71, 1, 1, 0]),
])


def face_stageN(i):
    return _conv_spec([
        (f"Mconv1_stage{i}", [199, 128, 7, 1, 3]),
        (f"Mconv2_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv3_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv4_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv5_stage{i}", [128, 128, 7, 1, 3]),
        (f"Mconv6_stage{i}", [128, 128, 1, 1, 0]),
        (f"Mconv7_stage{i}", [128, 71, 1, 1, 0]),
    ])


FACE_NO_RELU = {"conv6_2_CPM", *{f"Mconv7_stage{i}" for i in range(2, 7)}}


def apply_spec(params: Dict, x: jnp.ndarray, spec, no_relu) -> jnp.ndarray:
    """Run a conv/pool spec over NHWC input."""
    for name, v in spec:
        if "pool" in name:
            k, s, p = v
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
                [(0, 0), (p, p), (p, p), (0, 0)],
            )
        else:
            _, _, k, s, p = v
            w = params[name]["kernel"]
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + params[name]["bias"]
            if name not in no_relu:
                x = jax.nn.relu(x)
    return x


def body_forward(params, x):
    """x [1,H,W,3] -> (paf [1,h,w,38], heatmap [1,h,w,19])."""
    out1 = apply_spec(params, x, BODY_BLOCK0, BODY_NO_RELU)
    o1 = apply_spec(params, out1, body_stage1(1), BODY_NO_RELU)
    o2 = apply_spec(params, out1, body_stage1(2), BODY_NO_RELU)
    h = jnp.concatenate([o1, o2, out1], axis=-1)
    for i in range(2, 7):
        o1 = apply_spec(params, h, body_stageN(i, 1), BODY_NO_RELU)
        o2 = apply_spec(params, h, body_stageN(i, 2), BODY_NO_RELU)
        if i < 6:
            h = jnp.concatenate([o1, o2, out1], axis=-1)
    return o1, o2


def hand_forward(params, x):
    out1_0 = apply_spec(params, x, HAND_BLOCK1_0, HAND_NO_RELU)
    h = apply_spec(params, out1_0, HAND_BLOCK1_1, HAND_NO_RELU)
    for i in range(2, 7):
        h = apply_spec(
            params, jnp.concatenate([h, out1_0], axis=-1), hand_stageN(i), HAND_NO_RELU
        )
    return h


def face_forward(params, x):
    feat = apply_spec(params, x, FACE_BASE, FACE_NO_RELU)
    h = apply_spec(params, feat, FACE_STAGE1, FACE_NO_RELU)
    for i in range(2, 7):
        h = apply_spec(
            params, jnp.concatenate([h, feat], axis=-1), face_stageN(i), FACE_NO_RELU
        )
    return h


def convert_flat(sd: Dict[str, "np.ndarray"]) -> Dict:
    """Flat torch conv dict {name.weight,name.bias} -> {name: {kernel,bias}}."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params: Dict = {}
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim == 4:
            name = k[: -len(".weight")]
            name = name.split(".")[-1] if "." in name else name
            params.setdefault(name, {})["kernel"] = np.asarray(v, np.float32).transpose(2, 3, 1, 0)
        elif k.endswith(".bias"):
            name = k[: -len(".bias")]
            name = name.split(".")[-1] if "." in name else name
            params.setdefault(name, {})["bias"] = np.asarray(v, np.float32)
    return params


def init_random(spec_groups: Sequence, rng: "np.random.Generator") -> Dict:
    """Random params for tests (shape-correct)."""
    params: Dict = {}
    for spec in spec_groups:
        for name, v in spec:
            if "pool" in name:
                continue
            cin, cout, k, _, _ = v
            params[name] = {
                "kernel": rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05,
                "bias": np.zeros(cout, np.float32),
            }
    return params
