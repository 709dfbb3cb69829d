"""Pinned-URL annotator checkpoint fetching (reference: annotator/util.py:8
`annotator_ckpts_path` + the per-detector `load_file_from_url` calls, e.g.
annotator/hed/__init__.py:58-62, annotator/mlsd/__init__.py:18-26).

The reference downloads detector weights on first use, unconditionally. On
zero-egress hosts that hangs, so here downloading is opt-in:

  * ``CTRLORA_ALLOW_DOWNLOAD=1`` enables fetching; otherwise a missing file
    is simply reported missing (each loader keeps its descriptive error /
    skip behavior) with the pinned URL in the message.
  * ``CTRLORA_ANNOTATOR_BASE_URL`` rewrites the URL prefix for mirrors and
    tests (``file:///...`` works).

Integrity: a ``SHA256SUMS`` file in the ckpts dir records the digest of
every file this module downloads (trust-on-first-use); a file whose
recorded digest no longer matches raises instead of silently loading
corrupted weights. Entries in KNOWN_SHA256 are verified on download.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Optional

from ctrlora_tpu.annotators.hed import ckpts_dir

ALLOW_ENV = "CTRLORA_ALLOW_DOWNLOAD"
BASE_URL_ENV = "CTRLORA_ANNOTATOR_BASE_URL"

# filename -> pinned source URL (verbatim from the reference detector files)
WEIGHT_URLS = {
    "ControlNetHED.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/ControlNetHED.pth",
    "mlsd_large_512_fp32.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/mlsd_large_512_fp32.pth",
    # lineart (informative-drawings): fine + coarse generators
    # (reference annotator/lineart/__init__.py:96-104)
    "sk_model.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/sk_model.pth",
    "sk_model2.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/sk_model2.pth",
    # lineart_anime UNet generator
    "netG.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/netG.pth",
    "table5_pidinet.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/table5_pidinet.pth",
    "body_pose_model.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/body_pose_model.pth",
    "hand_pose_model.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/hand_pose_model.pth",
    "facenet.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/facenet.pth",
    "upernet_global_small.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/upernet_global_small.pth",
    "scannet.pt": "https://huggingface.co/lllyasviel/Annotators/resolve/main/scannet.pt",
    "ZoeD_M12_N.pt": "https://huggingface.co/lllyasviel/Annotators/resolve/main/ZoeD_M12_N.pt",
    "150_16_swin_l_oneformer_coco_100ep.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/150_16_swin_l_oneformer_coco_100ep.pth",
    "250_16_swin_l_oneformer_ade20k_160k.pth": "https://huggingface.co/lllyasviel/Annotators/resolve/main/250_16_swin_l_oneformer_ade20k_160k.pth",
    "dpt_large_384.pt": "https://storage.googleapis.com/sfr-unicontrol-data-research/annotator/ckpts/dpt_large_384.pt",
    "dpt_hybrid-midas-501f0c75.pt": "https://huggingface.co/lllyasviel/ControlNet/resolve/main/annotator/ckpts/dpt_hybrid-midas-501f0c75.pt",
    "model_final_844d15.pkl": "https://dl.fbaipublicfiles.com/densepose/densepose_rcnn_R_101_FPN_DL_s1x/165712116/model_final_844d15.pkl",
    "yolov4.weights": "https://github.com/AlexeyAB/darknet/releases/download/darknet_yolo_v3_optimal/yolov4.weights",
}

# filename -> sha256 hex digest, verified at download time when present.
# (This build host has no egress, so digests are recorded on first
# successful download into <ckpts>/SHA256SUMS instead — see module
# docstring. Fill entries in as they become known.)
KNOWN_SHA256: dict = {}


def _sums_path(directory: str) -> str:
    return os.path.join(directory, "SHA256SUMS")


def _read_sums(directory: str) -> dict:
    sums = {}
    path = _sums_path(directory)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    sums[parts[1]] = parts[0]
    return sums


def _record_sum(directory: str, name: str, digest: str) -> None:
    sums = _read_sums(directory)
    sums[name] = digest
    with open(_sums_path(directory), "w") as f:
        for k in sorted(sums):
            f.write(f"{sums[k]} {k}\n")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def resolve_url(name: str) -> Optional[str]:
    url = WEIGHT_URLS.get(name)
    if url is None:
        return None
    base = os.environ.get(BASE_URL_ENV)
    if base:
        return base.rstrip("/") + "/" + name
    return url


def download_allowed() -> bool:
    return os.environ.get(ALLOW_ENV, "") == "1"


def ensure_ckpt(name: str, path: Optional[str] = None) -> str:
    """Resolve (and, when allowed and needed, fetch) an annotator weight.

    Returns the local path. If the file exists its recorded digest (if any)
    is verified. If it is missing and CTRLORA_ALLOW_DOWNLOAD=1, it is
    fetched from the pinned URL, digest-verified/recorded, and written
    atomically. Otherwise the (missing) path is returned unchanged so each
    loader keeps its own skip/error behavior — but with the URL available
    via resolve_url(name) for the error message.
    """
    directory = os.path.dirname(path) if path else ckpts_dir()
    path = path or os.path.join(directory, name)
    if os.path.exists(path):
        recorded = _read_sums(directory).get(name)
        expected = KNOWN_SHA256.get(name, recorded)
        if expected:
            actual = _sha256(path)
            if actual != expected:
                raise RuntimeError(
                    f"annotator checkpoint {path} is corrupted: sha256 "
                    f"{actual} != recorded {expected}; delete it and re-fetch"
                )
        return path

    url = resolve_url(name)
    if url is None or not download_allowed():
        return path  # caller's existence check produces its usual message

    os.makedirs(directory, exist_ok=True)
    import urllib.request

    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".part")
    os.close(fd)
    try:
        print(f"[ctrlora] downloading {name} from {url}", flush=True)
        urllib.request.urlretrieve(url, tmp)  # noqa: S310 — pinned URL table
        digest = _sha256(tmp)
        expected = KNOWN_SHA256.get(name)
        if expected and digest != expected:
            raise RuntimeError(
                f"downloaded {name} has sha256 {digest}, expected {expected} "
                f"(source: {url})"
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    _record_sum(directory, name, digest)
    return path
