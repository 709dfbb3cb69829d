"""Annotator registry: name -> lazily constructed detector.

Mirrors the preprocessor set exposed by the reference apps
(app/gradio_ctrlora.py:36-40 lists 23 choices). Every condition is a native
JAX port; the heavyweight model-based ones (midas/zoe/normalbae/openpose/
uniformer/oneformer/densepose/mlsd/lineart*/pidinet/bbox) gate on their
pretrained weights being present in the ckpts dir (CTRLORA_ANNOTATOR_CKPTS)
and raise FileNotFoundError with a download pointer otherwise.
"""

from __future__ import annotations

from typing import Callable, Dict

_FACTORIES: Dict[str, Callable] = {}
_CACHE: Dict[str, object] = {}


def register(name: str):
    def deco(fn):
        _FACTORIES[name] = fn
        return fn

    return deco


def available() -> list:
    return sorted(_FACTORIES)


def get(name: str):
    if name not in _CACHE:
        if name not in _FACTORIES:
            raise KeyError(f"unknown annotator {name!r}; available: {available()}")
        _CACHE[name] = _FACTORIES[name]()
    return _CACHE[name]


def _simple(cls_name: str):
    def factory():
        from ctrlora_tpu.annotators import simple

        return getattr(simple, cls_name)()

    return factory


for _name, _cls in {
    "none": "GrayscaleConverter",  # placeholder; 'none' handled by apps
    "canny": "CannyDetector",
    "blur": "Blurrer",
    "grayscale": "GrayscaleConverter",
    "jpeg": "JpegCompressor",
    "pad": "Padder",
    "palette": "PaletteDetector",
    "pixel": "Pixelater",
    "illusion": "IllusionConverter",
    "inpainting": "Inpainter",
    "inpainting_brush": "BrushInpainter",
    "outpainting": "Outpainter",
    "shuffle": "ContentShuffleDetector",
    "color_shuffle": "ColorShuffleDetector",
    "gray_random": "GrayDetector",
    "downsample": "DownSampleDetector",
}.items():
    _FACTORIES[_name] = _simple(_cls)


@register("hed")
def _hed():
    from ctrlora_tpu.annotators.hed import HEDdetector

    return HEDdetector()


@register("hedsketch")
def _hedsketch():
    from ctrlora_tpu.annotators.hed import HEDSketchDetector

    return HEDSketchDetector()


@register("lineart")
def _lineart():
    from ctrlora_tpu.annotators.lineart import LineartDetector

    return LineartDetector()


@register("lineart_anime")
def _lineart_anime():
    from ctrlora_tpu.annotators.lineart import LineartAnimeDetector

    return LineartAnimeDetector()


@register("lineart_anime_with_color_prompt")
def _lineart_anime_color():
    from ctrlora_tpu.annotators.lineart import LineartAnimeWithColorPromptDetector

    return LineartAnimeWithColorPromptDetector()


@register("mlsd")
def _mlsd():
    from ctrlora_tpu.annotators.mlsd import MLSDdetector

    return MLSDdetector()


@register("openpose")
def _openpose():
    from ctrlora_tpu.annotators.openpose import OpenposeDetector

    return OpenposeDetector()


@register("pidinet")
def _pidinet():
    from ctrlora_tpu.annotators.pidinet import PidiNetDetector

    return PidiNetDetector()


class _MidasChannel:
    """MidasDetector returns (depth, normal); expose one as a Detector."""

    def __init__(self, index: int):
        from ctrlora_tpu.annotators.midas import MidasDetector

        self.det = get("midas") if "midas" in _CACHE else MidasDetector()
        _CACHE.setdefault("midas", self.det)
        self.index = index

    def __call__(self, img, **kw):
        return self.det(img, **kw)[self.index]


@register("midas")
def _midas():
    from ctrlora_tpu.annotators.midas import MidasDetector

    return MidasDetector()


@register("depth")
def _depth():
    return _MidasChannel(0)


@register("normal")
def _normal():
    return _MidasChannel(1)


@register("seg")
def _seg():
    from ctrlora_tpu.annotators.uniformer import UniformerDetector

    return UniformerDetector()


@register("seg_ofcoco")
def _seg_ofcoco():
    from ctrlora_tpu.annotators.oneformer import OneformerCOCODetector

    return OneformerCOCODetector()


@register("seg_ofade20k")
def _seg_ofade20k():
    from ctrlora_tpu.annotators.oneformer import OneformerADE20kDetector

    return OneformerADE20kDetector()


@register("densepose")
def _densepose():
    from ctrlora_tpu.annotators.densepose import DenseposeDetector

    return DenseposeDetector()


@register("normalbae")
def _normalbae():
    from ctrlora_tpu.annotators.normalbae import NormalBaeDetector

    return NormalBaeDetector()


@register("zoe")
def _zoe():
    from ctrlora_tpu.annotators.zoe import ZoeDetector

    return ZoeDetector()


@register("bbox")
def _bbox():
    from ctrlora_tpu.annotators.bbox import BBoxDetector

    return BBoxDetector()


