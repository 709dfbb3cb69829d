"""Import the read-only reference implementation for numerical parity tests.

The reference needs pytorch_lightning / omegaconf / torchvision, which are
not installed here; install minimal fakes so its *model class definitions*
import (we only use forward passes of randomly-initialized modules — no
training loop, no config system).
"""

import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    # transformers probes module.__spec__ via importlib; fakes need one
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def install_shims():
    import torch.nn as nn

    if "pytorch_lightning" not in sys.modules:
        pl = _module("pytorch_lightning")
        pl.LightningModule = nn.Module
        util = _module("pytorch_lightning.utilities")
        dist = _module("pytorch_lightning.utilities.distributed")
        dist.rank_zero_only = lambda fn: fn
        util.distributed = dist
        util.rank_zero_only = dist.rank_zero_only
        pl.utilities = util
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = util
        sys.modules["pytorch_lightning.utilities.distributed"] = dist
    if "omegaconf" not in sys.modules:
        oc = _module("omegaconf")
        class ListConfig(list):
            pass
        oc.ListConfig = ListConfig
        lc = _module("omegaconf.listconfig")
        lc.ListConfig = ListConfig
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tvu = _module("torchvision.utils")
        tvu.make_grid = lambda *a, **k: a[0]
        tv.utils = tvu
        tvt = _module("torchvision.transforms")
        tvt.ToTensor = object
        tvt.ToPILImage = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
        sys.modules["torchvision.transforms"] = tvt
    if "skimage" not in sys.modules:
        try:
            import skimage  # noqa: F401
        except ImportError:
            sk = _module("skimage")
            skm = _module("skimage.measure")

            def _label(binary, return_num=False, connectivity=None):
                import cv2
                import numpy as np

                n, labels = cv2.connectedComponents(
                    binary.astype("uint8"), connectivity=8
                )
                return (labels, n - 1) if return_num else labels

            skm.label = _label
            sk.measure = skm
            sys.modules["skimage"] = sk
            sys.modules["skimage.measure"] = skm
    if "basicsr" not in sys.modules:
        try:
            import basicsr  # noqa: F401
        except ImportError:
            bs = _module("basicsr")
            bsu = _module("basicsr.utils")
            bsu.img2tensor = lambda x, **k: x
            bs.utils = bsu
            sys.modules["basicsr"] = bs
            sys.modules["basicsr.utils"] = bsu
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def reference_available() -> bool:
    import os

    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir(REFERENCE_ROOT)
