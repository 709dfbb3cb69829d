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
        tvt.Compose = lambda fns: (lambda x: x)
        tvt.Normalize = lambda *a, **k: (lambda x: x)
        tvt.Resize = lambda *a, **k: (lambda x: x)
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
    if "timm" not in sys.modules:
        try:
            import timm  # noqa: F401
        except ImportError:
            sys.modules["timm"] = _make_fake_timm()
            _install_timm_layers()
    if "addict" not in sys.modules:
        try:
            import addict  # noqa: F401
        except ImportError:
            addict = _module("addict")

            class ADict(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError:
                        raise AttributeError(k)

                def __setattr__(self, k, v):
                    self[k] = v

                def __delattr__(self, k):
                    del self[k]

            addict.Dict = ADict
            sys.modules["addict"] = addict
    if "yapf" not in sys.modules:
        try:
            import yapf  # noqa: F401
        except ImportError:
            yapf = _module("yapf")
            ylib = _module("yapf.yapflib")
            yapi = _module("yapf.yapflib.yapf_api")
            yapi.FormatCode = lambda s, **k: (s, True)
            ylib.yapf_api = yapi
            yapf.yapflib = ylib
            sys.modules["yapf"] = yapf
            sys.modules["yapf.yapflib"] = ylib
            sys.modules["yapf.yapflib.yapf_api"] = yapi
    if "prettytable" not in sys.modules:
        try:
            import prettytable  # noqa: F401
        except ImportError:
            pt = _module("prettytable")
            pt.PrettyTable = object
            sys.modules["prettytable"] = pt
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _install_timm_layers():
    """timm.models.layers with the pieces the vendored backbones use."""
    import collections.abc

    import torch
    import torch.nn as nn

    models = _module("timm.models")
    layers = _module("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1 - self.drop_prob
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1)), device=x.device) < keep
            return x / keep * mask

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable):
            return tuple(x)
        return (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    def get_act_layer(name):
        return {"hard_swish": nn.Hardswish, "relu": nn.ReLU, "gelu": nn.GELU}[name]

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.get_act_layer = get_act_layer
    models.layers = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm"].models = models


def _make_fake_timm():
    """Minimal timm with a structurally-faithful ViT (enough for the DPT
    backbone: patch_embed.proj, cls_token, pos_embed, pos_drop, blocks with
    norm1/attn(qkv,proj)/norm2/mlp(fc1,fc2), final norm)."""
    import math

    import torch
    import torch.nn as nn

    class Attention(nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = Attention(dim, heads)
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp(dim, dim * 4)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self, dim, patch=16):
            super().__init__()
            self.proj = nn.Conv2d(3, dim, patch, patch)

    class VisionTransformer(nn.Module):
        def __init__(self, dim, depth, heads, img=384, patch=16):
            super().__init__()
            self.patch_embed = PatchEmbed(dim, patch)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
            n = (img // patch) ** 2 + 1
            self.pos_embed = nn.Parameter(torch.randn(1, n, dim) * 0.02)
            self.pos_drop = nn.Identity()
            self.blocks = nn.ModuleList([Block(dim, heads) for _ in range(depth)])
            self.norm = nn.LayerNorm(dim, eps=1e-6)

    def gen_relative_position_index(window_size):
        """Faithful port of timm.models.beit.gen_relative_position_index."""
        num_relative_distance = (2 * window_size[0] - 1) * (2 * window_size[1] - 1) + 3
        coords = torch.stack(
            torch.meshgrid(
                [torch.arange(window_size[0]), torch.arange(window_size[1])],
                indexing="ij",
            )
        )
        coords_flatten = torch.flatten(coords, 1)
        relative_coords = coords_flatten[:, :, None] - coords_flatten[:, None, :]
        relative_coords = relative_coords.permute(1, 2, 0).contiguous()
        relative_coords[:, :, 0] += window_size[0] - 1
        relative_coords[:, :, 1] += window_size[1] - 1
        relative_coords[:, :, 0] *= 2 * window_size[1] - 1
        n = window_size[0] * window_size[1]
        relative_position_index = torch.zeros(
            (n + 1, n + 1), dtype=relative_coords.dtype
        )
        relative_position_index[1:, 1:] = relative_coords.sum(-1)
        relative_position_index[0, 0:] = num_relative_distance - 3
        relative_position_index[0:, 0] = num_relative_distance - 2
        relative_position_index[0, 0] = num_relative_distance - 1
        return relative_position_index

    class BeitAttention(nn.Module):
        """Structure of timm.models.beit.Attention (forwards are replaced by
        the vendored midas_repo at runtime)."""

        def __init__(self, dim, num_heads, window_size):
            super().__init__()
            self.num_heads = num_heads
            head_dim = dim // num_heads
            self.scale = head_dim**-0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=False)
            self.q_bias = nn.Parameter(torch.zeros(dim))
            self.v_bias = nn.Parameter(torch.zeros(dim))
            self.register_buffer("k_bias", torch.zeros(dim), persistent=False)
            self.window_size = window_size
            self.num_relative_distance = (2 * window_size[0] - 1) * (
                2 * window_size[1] - 1
            ) + 3
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros(self.num_relative_distance, num_heads)
            )
            self.register_buffer(
                "relative_position_index",
                gen_relative_position_index(window_size),
                persistent=False,
            )
            self.attn_drop = nn.Dropout(0.0)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(0.0)

    class BeitBlock(nn.Module):
        def __init__(self, dim, heads, window_size):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = BeitAttention(dim, heads, window_size)
            self.drop_path = nn.Identity()
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp(dim, dim * 4)
            self.gamma_1 = nn.Parameter(1e-5 * torch.ones(dim))
            self.gamma_2 = nn.Parameter(1e-5 * torch.ones(dim))

    class Beit(nn.Module):
        def __init__(self, dim=1024, depth=24, heads=16, img=384):
            super().__init__()
            g = img // 16
            self.patch_size = (16, 16)
            self.patch_embed = BeitPatchEmbed(dim)
            self.patch_embed.flatten = True
            self.patch_embed.norm = nn.Identity()
            self.patch_embed.patch_size = (16, 16)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
            self.pos_embed = None
            self.pos_drop = nn.Dropout(0.0)
            self.rel_pos_bias = None
            self.grad_checkpointing = False
            self.blocks = nn.ModuleList(
                [BeitBlock(dim, heads, (g, g)) for _ in range(depth)]
            )
            self.norm = nn.LayerNorm(dim, eps=1e-6)

    class BeitPatchEmbed(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.proj = nn.Conv2d(3, dim, 16, 16)

        def forward(self, x):  # replaced by midas_repo, kept for safety
            x = self.proj(x)
            return x.flatten(2).transpose(1, 2)

    def create_model(name, pretrained=False, **kw):
        if "vit_large_patch16_384" in name:
            return VisionTransformer(1024, 24, 16)
        if "vit_base_patch16_384" in name or "deit" in name:
            return VisionTransformer(768, 12, 12)
        if "beit_large_patch16_384" in name:
            return Beit(1024, 24, 16, 384)
        raise ValueError(name)

    timm = _module("timm")
    timm.create_model = create_model
    timm_models = _module("timm.models")
    beit_mod = _module("timm.models.beit")
    beit_mod.gen_relative_position_index = gen_relative_position_index
    timm_models.beit = beit_mod
    timm.models = timm_models
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.beit"] = beit_mod
    return timm


def reference_available() -> bool:
    import os

    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir(REFERENCE_ROOT)


# ---------------------------------------------------------------------------
# OneFormer oracle: import the vendored torch modules with a faked
# detectron2 surface (the real vendored detectron2 needs yacs/fvcore/iopath;
# the model classes only touch configurable/Conv2d/ShapeSpec/get_norm and
# two registries, which are replicated faithfully below)
# ---------------------------------------------------------------------------

def install_oneformer_shims():
    import torch
    import torch.nn as nn

    install_shims()  # timm fake etc.

    class _Registry:
        def __init__(self, name):
            self._name, self._map = name, {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._map[cls.__name__] = cls
                    return cls
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    if "fvcore" not in sys.modules:
        fv, fvn, wi = _module("fvcore"), _module("fvcore.nn"), _module("fvcore.nn.weight_init")

        def c2_xavier_fill(m):
            nn.init.kaiming_uniform_(m.weight, a=1)
            if m.bias is not None:
                nn.init.constant_(m.bias, 0)

        def c2_msra_fill(m):
            nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
            if m.bias is not None:
                nn.init.constant_(m.bias, 0)

        wi.c2_xavier_fill, wi.c2_msra_fill = c2_xavier_fill, c2_msra_fill
        fvn.weight_init, fv.nn = wi, fvn
        sys.modules.update({"fvcore": fv, "fvcore.nn": fvn, "fvcore.nn.weight_init": wi})

    d2 = "annotator.oneformer.detectron2"
    if d2 not in sys.modules:
        def configurable(init_func=None, *, from_config=None):
            if init_func is not None:
                return init_func
            return lambda f: f

        class ShapeSpec:
            def __init__(self, channels=None, height=None, width=None, stride=None):
                self.channels, self.height = channels, height
                self.width, self.stride = width, stride

        def get_norm(norm, out_channels):
            if norm in (None, ""):
                return None
            if norm == "GN":
                return nn.GroupNorm(32, out_channels)
            raise NotImplementedError(norm)

        class Conv2d(nn.Conv2d):  # detectron2.layers.wrappers.Conv2d semantics
            def __init__(self, *args, **kwargs):
                norm = kwargs.pop("norm", None)
                activation = kwargs.pop("activation", None)
                super().__init__(*args, **kwargs)
                self.norm, self.activation = norm, activation

            def forward(self, x):
                x = nn.Conv2d.forward(self, x)
                if self.norm is not None:
                    x = self.norm(x)
                if self.activation is not None:
                    x = self.activation(x)
                return x

        root = _module(d2)
        cfgm = _module(d2 + ".config")
        cfgm.configurable = configurable
        layers = _module(d2 + ".layers")
        layers.Conv2d, layers.ShapeSpec, layers.get_norm = Conv2d, ShapeSpec, get_norm
        modeling = _module(d2 + ".modeling")
        modeling.SEM_SEG_HEADS_REGISTRY = _Registry("SEM_SEG_HEADS")
        modeling.BACKBONE_REGISTRY = _Registry("BACKBONE")
        modeling.Backbone = nn.Module
        modeling.ShapeSpec = ShapeSpec
        utils = _module(d2 + ".utils")
        reg = _module(d2 + ".utils.registry")
        reg.Registry = _Registry
        utils.registry = reg
        root.config, root.layers, root.modeling, root.utils = cfgm, layers, modeling, utils
        sys.modules.update({
            d2: root, d2 + ".config": cfgm, d2 + ".layers": layers,
            d2 + ".modeling": modeling, d2 + ".utils": utils,
            d2 + ".utils.registry": reg,
        })

    # parent packages faked with real __path__ so leaf modules load from
    # disk without executing the heavyweight package __init__ files
    base = REFERENCE_ROOT + "/annotator/oneformer/oneformer"
    for pkg, path in [
        ("annotator", REFERENCE_ROOT + "/annotator"),
        ("annotator.oneformer", REFERENCE_ROOT + "/annotator/oneformer"),
        ("annotator.oneformer.oneformer", base),
        ("annotator.oneformer.oneformer.modeling", base + "/modeling"),
        ("annotator.oneformer.oneformer.modeling.backbone", base + "/modeling/backbone"),
        ("annotator.oneformer.oneformer.modeling.pixel_decoder", base + "/modeling/pixel_decoder"),
        ("annotator.oneformer.oneformer.modeling.pixel_decoder.ops", base + "/modeling/pixel_decoder/ops"),
        ("annotator.oneformer.oneformer.modeling.transformer_decoder", base + "/modeling/transformer_decoder"),
    ]:
        if pkg not in sys.modules:
            m = _module(pkg)
            m.__path__ = [path]
            sys.modules[pkg] = m

    import importlib

    swin = importlib.import_module(
        "annotator.oneformer.oneformer.modeling.backbone.swin"
    )
    msda = importlib.import_module(
        "annotator.oneformer.oneformer.modeling.pixel_decoder.msdeformattn"
    )
    dec = importlib.import_module(
        "annotator.oneformer.oneformer.modeling.transformer_decoder.oneformer_transformer_decoder"
    )
    shape_spec = sys.modules[d2 + ".layers"].ShapeSpec
    return swin, msda, dec, shape_spec


def install_densepose_shims():
    """Extend the oneformer fakes so the vendored detectron2 resnet.py /
    fpn.py import for use as a DensePose backbone oracle: the fake
    `detectron2.modeling` package gains a real __path__, and the layers
    fake gains CNNBlockBase / FrozenBatchNorm2d / deform-conv stubs."""
    import torch
    import torch.nn as nn

    install_oneformer_shims()
    d2 = "annotator.oneformer.detectron2"
    layers = sys.modules[d2 + ".layers"]

    if not hasattr(layers, "CNNBlockBase"):
        class CNNBlockBase(nn.Module):
            def __init__(self, in_channels, out_channels, stride):
                super().__init__()
                self.in_channels = in_channels
                self.out_channels = out_channels
                self.stride = stride

            def freeze(self):
                for p in self.parameters():
                    p.requires_grad = False
                return self

        class FrozenBatchNorm2d(nn.Module):  # detectron2 semantics, eps 1e-5
            def __init__(self, num_features, eps=1e-5):
                super().__init__()
                self.eps = eps
                self.register_buffer("weight", torch.ones(num_features))
                self.register_buffer("bias", torch.zeros(num_features))
                self.register_buffer("running_mean", torch.zeros(num_features))
                self.register_buffer("running_var", torch.ones(num_features))

            def forward(self, x):
                scale = self.weight * (self.running_var + self.eps).rsqrt()
                bias = self.bias - self.running_mean * scale
                return x * scale.view(1, -1, 1, 1) + bias.view(1, -1, 1, 1)

        class _DeformStub(nn.Module):
            def __init__(self, *a, **k):
                raise NotImplementedError("deform conv not used in this oracle")

        layers.CNNBlockBase = CNNBlockBase
        layers.FrozenBatchNorm2d = FrozenBatchNorm2d
        layers.DeformConv = _DeformStub
        layers.ModulatedDeformConv = _DeformStub
        _old_get_norm = layers.get_norm

        def get_norm(norm, out_channels):
            if norm == "FrozenBN":
                return FrozenBatchNorm2d(out_channels)
            if norm == "BN":
                return nn.BatchNorm2d(out_channels)
            return _old_get_norm(norm, out_channels)

        layers.get_norm = get_norm

    modeling = sys.modules[d2 + ".modeling"]
    real = REFERENCE_ROOT + "/annotator/oneformer/detectron2/modeling"
    if not hasattr(modeling, "__path__"):
        modeling.__path__ = [real]
    if d2 + ".modeling.backbone" not in sys.modules:
        pkg = _module(d2 + ".modeling.backbone")
        pkg.__path__ = [real + "/backbone"]
        sys.modules[d2 + ".modeling.backbone"] = pkg

    import importlib

    resnet = importlib.import_module(d2 + ".modeling.backbone.resnet")
    fpn = importlib.import_module(d2 + ".modeling.backbone.fpn")
    return resnet, fpn, sys.modules[d2 + ".layers"].ShapeSpec
