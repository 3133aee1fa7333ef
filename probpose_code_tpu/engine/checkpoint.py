"""Checkpoint save/load (orbax) + PyTorch state-dict conversion.

Replaces mmengine CheckpointHook + load_checkpoint: orbax stores the
params / batch-stats / optimizer pytrees; a sidecar ``meta.json`` carries
epoch/step/dataset_meta (the reference packs ``meta.dataset_meta`` into the
.pth, consumed at ``apis/inference.py:108-113``).

``convert_torch_state_dict`` maps a reference ProbPose/MMPose torch
checkpoint onto our flax parameter tree (ViT backbone + ProbMapHead /
HeatmapHead), handling the layout differences: fused qkv stays fused, torch
OIHW conv kernels -> flax HWIO, ConvTranspose OIHW -> flax HWOI(flipped),
linear weights transpose.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import re
from typing import Any, Dict, Optional

import numpy as np


def save_checkpoint(path: str, params, batch_stats=None, opt_state=None, meta: Optional[dict] = None) -> None:
    import orbax.checkpoint as ocp

    path = osp.abspath(path)
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path + ".orbax", payload, force=True)
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def load_checkpoint(path: str, target=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = osp.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path + ".orbax", target)
    meta = {}
    if osp.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    out = dict(restored)
    out["meta"] = meta
    return out


def latest_checkpoint(work_dir: str) -> Optional[str]:
    """Find the newest ``epoch_N`` checkpoint in a work dir (auto-resume)."""
    best = None
    best_epoch = -1
    if not osp.isdir(work_dir):
        return None
    for name in os.listdir(work_dir):
        m = re.match(r"epoch_(\d+)\.orbax$", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = osp.join(work_dir, f"epoch_{m.group(1)}")
    return best


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def _set(tree: Dict[str, Any], path, leaf_name, value):
    node = tree
    for part in path:
        node = node.setdefault(part, {})
    node[leaf_name] = value


def convert_torch_hrnet_backbone(sd: Dict[str, Any]):
    """mmpose/mmcv HRNet torch keys -> our flax HRNet tree.

    Covers the stem, bottleneck layer1, transitions (plain + nested
    new-branch Sequentials), stage modules (branches + fuse layers with the
    j>i upsample 1x1 and j<i strided-3x3 chains), matching the module names
    in ``models/backbones/hrnet.py``. Returns (params, batch_stats).
    """
    import re

    def conv_kernel(w):  # OIHW -> HWIO
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(flax_name, torch_prefix):
        _set(params, [flax_name] if isinstance(flax_name, str) else flax_name, "kernel",
             conv_kernel(sd[f"{torch_prefix}.weight"]))

    def put_bn(flax_name, torch_prefix):
        path = [flax_name] if isinstance(flax_name, str) else flax_name
        node_p, node_s = params, stats
        for part in path[:-1]:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        node_p[path[-1]] = {"scale": sd[f"{torch_prefix}.weight"], "bias": sd[f"{torch_prefix}.bias"]}
        node_s[path[-1]] = {"mean": sd[f"{torch_prefix}.running_mean"], "var": sd[f"{torch_prefix}.running_var"]}

    put_conv("conv1", "backbone.conv1")
    put_bn("bn1", "backbone.bn1")
    put_conv("conv2", "backbone.conv2")
    put_bn("bn2", "backbone.bn2")

    def put_block(block_path, torch_prefix):
        for c in ("conv1", "conv2", "conv3"):
            if f"{torch_prefix}.{c}.weight" in sd:
                put_conv(block_path + [c], f"{torch_prefix}.{c}")
                put_bn(block_path + [c.replace("conv", "bn")], f"{torch_prefix}.{c.replace('conv', 'bn')}")
        if f"{torch_prefix}.downsample.0.weight" in sd:
            put_conv(block_path + ["downsample_conv"], f"{torch_prefix}.downsample.0")
            put_bn(block_path + ["downsample_bn"], f"{torch_prefix}.downsample.1")

    n = 0
    while f"backbone.layer1.{n}.conv1.weight" in sd:
        put_block([f"layer1_block{n}"], f"backbone.layer1.{n}")
        n += 1

    # transitions: plain Sequential(conv, bn) or nested Sequential for the
    # new lowest-resolution branch; unchanged branches have no torch keys
    for t in (1, 2, 3):
        for b in range(8):
            plain = f"backbone.transition{t}.{b}.0.weight"
            nested = f"backbone.transition{t}.{b}.0.0.weight"
            if plain in sd:
                put_conv(f"transition{t}_{b}_conv", f"backbone.transition{t}.{b}.0")
                put_bn(f"transition{t}_{b}_bn", f"backbone.transition{t}.{b}.1")
            elif nested in sd:
                put_conv(f"transition{t}_{b}_conv", f"backbone.transition{t}.{b}.0.0")
                put_bn(f"transition{t}_{b}_bn", f"backbone.transition{t}.{b}.0.1")

    # stage modules
    stage_re = re.compile(r"backbone\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.conv1\.weight")
    for key in list(sd):
        m = stage_re.match(key)
        if not m:
            continue
        s, mod, br, blk = (int(g) for g in m.groups())
        put_block([f"stage{s}_module{mod}", f"branch{br}_block{blk}"],
                  f"backbone.stage{s}.{mod}.branches.{br}.{blk}")

    fuse_plain = re.compile(r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.0\.weight")
    fuse_down = re.compile(r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.0\.weight")
    for key in list(sd):
        m = fuse_down.match(key)
        if m:
            s, mod, i, j, k = (int(g) for g in m.groups())
            base = f"backbone.stage{s}.{mod}.fuse_layers.{i}.{j}.{k}"
            put_conv([f"stage{s}_module{mod}", f"fuse{i}_{j}_down{k}_conv"], f"{base}.0")
            put_bn([f"stage{s}_module{mod}", f"fuse{i}_{j}_down{k}_bn"], f"{base}.1")
            continue
        m = fuse_plain.match(key)
        if m:
            s, mod, i, j = (int(g) for g in m.groups())
            if j <= i:
                continue  # j<i keys matched by fuse_down; j==i is identity
            base = f"backbone.stage{s}.{mod}.fuse_layers.{i}.{j}"
            put_conv([f"stage{s}_module{mod}", f"fuse{i}_{j}_conv"], f"{base}.0")
            put_bn([f"stage{s}_module{mod}", f"fuse{i}_{j}_bn"], f"{base}.1")

    return params, stats


def convert_torch_cspnext_backbone(sd: Dict[str, Any]):
    """mmpose/mmdet CSPNeXt torch keys -> our flax CSPNeXt tree.

    Stem of three ConvModules, per-stage [strided conv, (SPP), CSPLayer]
    with main/short/final convs, depthwise-separable CSPNeXt blocks, and
    the channel-attention 1x1 conv. Returns (params, batch_stats).
    """

    def conv_kernel(w):  # OIHW -> HWIO (also depthwise (C,1,k,k) -> (k,k,1,C))
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_module(flax_path, tprefix):
        _set(params, flax_path, "conv", {"kernel": conv_kernel(sd[f"{tprefix}.conv.weight"])})
        node_p, node_s = params, stats
        for part in flax_path:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        node_p["bn"] = {"scale": sd[f"{tprefix}.bn.weight"], "bias": sd[f"{tprefix}.bn.bias"]}
        node_s["bn"] = {"mean": sd[f"{tprefix}.bn.running_mean"], "var": sd[f"{tprefix}.bn.running_var"]}

    for i in range(3):
        conv_module([f"stem{i}"], f"backbone.stem.{i}")

    for s in range(1, 6):
        if f"backbone.stage{s}.0.conv.weight" not in sd:
            continue
        conv_module([f"stage{s}_conv"], f"backbone.stage{s}.0")
        csp_idx = 1
        if f"backbone.stage{s}.1.conv1.conv.weight" in sd:  # SPPBottleneck
            conv_module([f"stage{s}_spp", "conv1"], f"backbone.stage{s}.1.conv1")
            conv_module([f"stage{s}_spp", "conv2"], f"backbone.stage{s}.1.conv2")
            csp_idx = 2
        base = f"backbone.stage{s}.{csp_idx}"
        for nm in ("main_conv", "short_conv", "final_conv"):
            conv_module([f"stage{s}_csp", nm], f"{base}.{nm}")
        n = 0
        while f"{base}.blocks.{n}.conv1.conv.weight" in sd:
            conv_module([f"stage{s}_csp", f"block{n}", "conv1"], f"{base}.blocks.{n}.conv1")
            conv_module([f"stage{s}_csp", f"block{n}", "conv2", "depthwise"],
                        f"{base}.blocks.{n}.conv2.depthwise_conv")
            conv_module([f"stage{s}_csp", f"block{n}", "conv2", "pointwise"],
                        f"{base}.blocks.{n}.conv2.pointwise_conv")
            n += 1
        if f"{base}.attention.fc.weight" in sd:
            _set(params, [f"stage{s}_csp", "attention", "fc"], "kernel",
                 conv_kernel(sd[f"{base}.attention.fc.weight"]))
            _set(params, [f"stage{s}_csp", "attention", "fc"], "bias", sd[f"{base}.attention.fc.bias"])
    return params, stats


def convert_torch_cspdarknet_backbone(sd: Dict[str, Any]):
    """mmdet-style CSPDarknet torch keys -> our flax CSPDarknet tree.

    Focus stem (``stem.conv`` ConvModule over the space-to-depth input),
    per-stage [strided conv, (SPP), CSPLayer] with plain DarknetBottleneck
    blocks (conv1 1x1 + conv2 3x3, no channel attention).
    """
    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_module(flax_path, tprefix):
        node_p, node_s = params, stats
        for part in flax_path:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        node_p["conv"] = {"kernel": conv_kernel(sd[f"{tprefix}.conv.weight"])}
        node_p["bn"] = {"scale": sd[f"{tprefix}.bn.weight"], "bias": sd[f"{tprefix}.bn.bias"]}
        node_s["bn"] = {"mean": sd[f"{tprefix}.bn.running_mean"], "var": sd[f"{tprefix}.bn.running_var"]}

    conv_module(["stem", "conv"], "backbone.stem.conv")

    for s in range(1, 6):
        if f"backbone.stage{s}.0.conv.weight" not in sd:
            continue
        conv_module([f"stage{s}_conv"], f"backbone.stage{s}.0")
        csp_idx = 1
        if f"backbone.stage{s}.1.conv1.conv.weight" in sd and (
            f"backbone.stage{s}.2.main_conv.conv.weight" in sd
        ):  # SPPBottleneck then CSPLayer
            conv_module([f"stage{s}_spp", "conv1"], f"backbone.stage{s}.1.conv1")
            conv_module([f"stage{s}_spp", "conv2"], f"backbone.stage{s}.1.conv2")
            csp_idx = 2
        base = f"backbone.stage{s}.{csp_idx}"
        for nm in ("main_conv", "short_conv", "final_conv"):
            conv_module([f"stage{s}_csp", nm], f"{base}.{nm}")
        n = 0
        while f"{base}.blocks.{n}.conv1.conv.weight" in sd:
            conv_module([f"stage{s}_csp", f"block{n}", "conv1"], f"{base}.blocks.{n}.conv1")
            conv_module([f"stage{s}_csp", f"block{n}", "conv2"], f"{base}.blocks.{n}.conv2")
            n += 1
    return params, stats


def convert_torch_hybrid_encoder(sd: Dict[str, Any], num_heads: int = 8):
    """HybridEncoder (RTMO neck) torch keys -> our flax tree.

    Reference ``mmpose/models/necks/hybrid_encoder.py:72-251``: ``input_proj``
    ConvModules, per-level DETR encoders (``encoder.{i}.layers.{m}`` with mmcv
    MultiheadAttention ``self_attn.attn.{in_proj_weight,out_proj}``, FFN
    ``ffn.layers.0.0``/``.1``, ``norms.0/1``), FPN ``lateral_convs``/
    ``fpn_blocks`` and PAN ``downsample_convs``/``pan_blocks`` CSPRepLayers
    over RepVGG ``bottlenecks.{n}.branch_3x3/branch_1x1``, plus the optional
    ChannelMapper ``projector.convs.{i}``. Returns (params, batch_stats).
    """

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_module(flax_path, tprefix):
        _set(params, flax_path, "conv", {"kernel": conv_kernel(sd[f"{tprefix}.conv.weight"])})
        _set(params, flax_path, "bn", {"scale": sd[f"{tprefix}.bn.weight"], "bias": sd[f"{tprefix}.bn.bias"]})
        _set(stats, flax_path, "bn", {"mean": sd[f"{tprefix}.bn.running_mean"], "var": sd[f"{tprefix}.bn.running_var"]})

    def csp_rep_layer(flax_name, tprefix):
        conv_module([flax_name, "conv1"], f"{tprefix}.conv1")
        conv_module([flax_name, "conv2"], f"{tprefix}.conv2")
        if f"{tprefix}.conv3.conv.weight" in sd:  # Identity when widen_factor == 1
            conv_module([flax_name, "conv3"], f"{tprefix}.conv3")
        n = 0
        while f"{tprefix}.bottlenecks.{n}.branch_3x3.conv.weight" in sd:
            b = f"{tprefix}.bottlenecks.{n}"
            _set(params, [flax_name, f"rep{n}"], "conv3", {"kernel": conv_kernel(sd[f"{b}.branch_3x3.conv.weight"])})
            _set(params, [flax_name, f"rep{n}"], "bn3",
                 {"scale": sd[f"{b}.branch_3x3.bn.weight"], "bias": sd[f"{b}.branch_3x3.bn.bias"]})
            _set(stats, [flax_name, f"rep{n}"], "bn3",
                 {"mean": sd[f"{b}.branch_3x3.bn.running_mean"], "var": sd[f"{b}.branch_3x3.bn.running_var"]})
            _set(params, [flax_name, f"rep{n}"], "conv1", {"kernel": conv_kernel(sd[f"{b}.branch_1x1.conv.weight"])})
            _set(params, [flax_name, f"rep{n}"], "bn1",
                 {"scale": sd[f"{b}.branch_1x1.bn.weight"], "bias": sd[f"{b}.branch_1x1.bn.bias"]})
            _set(stats, [flax_name, f"rep{n}"], "bn1",
                 {"mean": sd[f"{b}.branch_1x1.bn.running_mean"], "var": sd[f"{b}.branch_1x1.bn.running_var"]})
            n += 1

    i = 0
    while f"neck.input_proj.{i}.conv.weight" in sd:
        conv_module([f"input_proj{i}"], f"neck.input_proj.{i}")
        i += 1

    j = 0
    while f"neck.encoder.{j}.layers.0.norms.0.weight" in sd:
        m = 0
        while f"neck.encoder.{j}.layers.{m}.norms.0.weight" in sd:
            p = f"neck.encoder.{j}.layers.{m}"
            layer: Dict[str, Any] = {}
            W = sd[f"{p}.self_attn.attn.in_proj_weight"]  # (3C, C), rows [q; k; v]
            b = sd[f"{p}.self_attn.attn.in_proj_bias"]
            C = W.shape[1]
            hd = C // num_heads
            attn = {}
            for name, Wp, bp in (
                ("query", W[:C], b[:C]), ("key", W[C : 2 * C], b[C : 2 * C]), ("value", W[2 * C :], b[2 * C :])
            ):
                attn[name] = {"kernel": Wp.T.reshape(C, num_heads, hd), "bias": bp.reshape(num_heads, hd)}
            attn["out"] = {
                "kernel": sd[f"{p}.self_attn.attn.out_proj.weight"].T.reshape(num_heads, hd, C),
                "bias": sd[f"{p}.self_attn.attn.out_proj.bias"],
            }
            layer["self_attn"] = attn
            layer["ffn1"] = {"kernel": sd[f"{p}.ffn.layers.0.0.weight"].T, "bias": sd[f"{p}.ffn.layers.0.0.bias"]}
            layer["ffn2"] = {"kernel": sd[f"{p}.ffn.layers.1.weight"].T, "bias": sd[f"{p}.ffn.layers.1.bias"]}
            layer["norm1"] = {"scale": sd[f"{p}.norms.0.weight"], "bias": sd[f"{p}.norms.0.bias"]}
            layer["norm2"] = {"scale": sd[f"{p}.norms.1.weight"], "bias": sd[f"{p}.norms.1.bias"]}
            _set(params, [f"encoder{j}"], f"layer{m}", layer)
            m += 1
        j += 1

    k = 0
    while f"neck.lateral_convs.{k}.conv.weight" in sd:
        conv_module([f"lateral{k}"], f"neck.lateral_convs.{k}")
        csp_rep_layer(f"fpn{k}", f"neck.fpn_blocks.{k}")
        k += 1
    k = 0
    while f"neck.downsample_convs.{k}.conv.weight" in sd:
        conv_module([f"down{k}"], f"neck.downsample_convs.{k}")
        csp_rep_layer(f"pan{k}", f"neck.pan_blocks.{k}")
        k += 1

    i = 0
    while f"neck.projector.convs.{i}.conv.weight" in sd:
        conv_module([f"proj{i}"], f"neck.projector.convs.{i}")
        i += 1
    return params, stats


def convert_torch_rtmo_head(sd: Dict[str, Any]):
    """RTMOHead torch keys -> our flax head tree (head_module + dcc).

    Reference ``rtmo_head.py``: RTMOHeadModule towers ``conv_cls.{i}.{j}`` /
    ``conv_pose.{i}.{j}`` with 1x1 outputs ``out_{cls,bbox,kpt_reg,kpt_vis,
    pose}.{i}`` (:98-170), and the DCC's ``pose_to_kpts`` (Linear+BN1d),
    ``x_fc``/``y_fc`` bin adapters, ``sigma_fc`` (Linear+Sigmoid+Scale),
    ``gau`` GAUEncoder and learnable ``pos_enc`` (:276-300).
    """

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {"head_module": {}, "dcc": {}}
    stats: Dict[str, Any] = {"head_module": {}}
    hm_p, hm_s = params["head_module"], stats["head_module"]

    def conv_module(flax_path, tprefix):
        _set(hm_p, flax_path, "conv", {"kernel": conv_kernel(sd[f"{tprefix}.conv.weight"])})
        _set(hm_p, flax_path, "bn", {"scale": sd[f"{tprefix}.bn.weight"], "bias": sd[f"{tprefix}.bn.bias"]})
        _set(hm_s, flax_path, "bn", {"mean": sd[f"{tprefix}.bn.running_mean"], "var": sd[f"{tprefix}.bn.running_var"]})

    i = 0
    while f"head.head_module.out_cls.{i}.weight" in sd:
        j = 0
        while f"head.head_module.conv_cls.{i}.{j}.conv.weight" in sd:
            conv_module([f"conv_cls{i}", f"conv{j}"], f"head.head_module.conv_cls.{i}.{j}")
            j += 1
        j = 0
        while f"head.head_module.conv_pose.{i}.{j}.conv.weight" in sd:
            conv_module([f"conv_pose{i}_{j}"], f"head.head_module.conv_pose.{i}.{j}")
            j += 1
        for name in ("out_cls", "out_bbox", "out_kpt_reg", "out_kpt_vis", "out_pose"):
            tkey = f"head.head_module.{name}.{i}.weight"
            if tkey in sd:
                hm_p[f"{name}{i}"] = {
                    "kernel": conv_kernel(sd[tkey]),
                    "bias": sd[f"head.head_module.{name}.{i}.bias"],
                }
        i += 1

    dcc = params["dcc"]
    dcc["pose_to_kpts"] = {"kernel": sd["head.dcc.pose_to_kpts.0.weight"].T, "bias": sd["head.dcc.pose_to_kpts.0.bias"]}
    dcc["pose_bn"] = {"scale": sd["head.dcc.pose_to_kpts.1.weight"], "bias": sd["head.dcc.pose_to_kpts.1.bias"]}
    stats["dcc"] = {
        "pose_bn": {"mean": sd["head.dcc.pose_to_kpts.1.running_mean"], "var": sd["head.dcc.pose_to_kpts.1.running_var"]}
    }
    for fc in ("x_fc", "y_fc"):
        dcc[fc] = {"kernel": sd[f"head.dcc.{fc}.weight"].T, "bias": sd[f"head.dcc.{fc}.bias"]}
    dcc["sigma_fc"] = {"kernel": sd["head.dcc.sigma_fc.0.weight"].T, "bias": sd["head.dcc.sigma_fc.0.bias"]}
    dcc["sigma_scale"] = np.asarray(sd["head.dcc.sigma_fc.2.scale"]).reshape(())
    if "head.dcc.pos_enc" in sd:
        dcc["pos_enc"] = sd["head.dcc.pos_enc"]
    gau = {
        "ln": {"g": sd["head.dcc.gau.ln.g"]},
        "uv": {"kernel": sd["head.dcc.gau.uv.weight"].T},
        "gamma": sd["head.dcc.gau.gamma"],
        "beta": sd["head.dcc.gau.beta"],
        "o": {"kernel": sd["head.dcc.gau.o.weight"].T},
    }
    if "head.dcc.gau.res_scale.scale" in sd:
        gau["res_scale"] = {"scale": sd["head.dcc.gau.res_scale.scale"]}
    dcc["gau"] = gau
    return params, stats


def convert_torch_yolox_pafpn(sd: Dict[str, Any]):
    """YOLOXPAFPN torch keys -> flax tree (reference
    ``mmpose/models/necks/yolox_pafpn.py:61-147``): ``reduce_layers.{j}`` /
    ``top_down_blocks.{j}`` (j=0 is the highest level — matching our
    ``reduce{j}``/``td_csp{j}`` enumeration order), ``downsamples.{k}`` /
    ``bottom_up_blocks.{k}``, per-level 1x1 ``out_convs.{i}``; CSP layers
    use plain Darknet bottlenecks (conv1 1x1 + conv2 3x3)."""

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_module(flax_path, tprefix):
        _set(params, flax_path, "conv", {"kernel": conv_kernel(sd[f"{tprefix}.conv.weight"])})
        _set(params, flax_path, "bn", {"scale": sd[f"{tprefix}.bn.weight"], "bias": sd[f"{tprefix}.bn.bias"]})
        _set(stats, flax_path, "bn", {"mean": sd[f"{tprefix}.bn.running_mean"], "var": sd[f"{tprefix}.bn.running_var"]})

    def csp_layer(flax_name, tprefix):
        for nm in ("main_conv", "short_conv", "final_conv"):
            conv_module([flax_name, nm], f"{tprefix}.{nm}")
        m = 0
        while f"{tprefix}.blocks.{m}.conv1.conv.weight" in sd:
            conv_module([flax_name, f"block{m}", "conv1"], f"{tprefix}.blocks.{m}.conv1")
            conv_module([flax_name, f"block{m}", "conv2"], f"{tprefix}.blocks.{m}.conv2")
            m += 1

    j = 0
    while f"neck.reduce_layers.{j}.conv.weight" in sd:
        conv_module([f"reduce{j}"], f"neck.reduce_layers.{j}")
        csp_layer(f"td_csp{j}", f"neck.top_down_blocks.{j}")
        j += 1
    k = 0
    while f"neck.downsamples.{k}.conv.weight" in sd:
        conv_module([f"down{k}"], f"neck.downsamples.{k}")
        csp_layer(f"bu_csp{k}", f"neck.bottom_up_blocks.{k}")
        k += 1
    i = 0
    while f"neck.out_convs.{i}.conv.weight" in sd:
        conv_module([f"out{i}"], f"neck.out_convs.{i}")
        i += 1
    return params, stats


def convert_torch_yoloxpose_head(sd: Dict[str, Any]):
    """YOLOXPoseHead torch keys -> flax head tree (reference
    ``yoloxpose_head.py:21-226``): per-level cls/reg/pose ConvModule towers
    and 1x1 outputs (out_cls / out_obj / out_bbox / out_kpt / out_kpt_vis)."""

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {"head_module": {}}
    stats: Dict[str, Any] = {"head_module": {}}
    hm_p, hm_s = params["head_module"], stats["head_module"]

    def conv_module(flax_path, tprefix):
        _set(hm_p, flax_path, "conv", {"kernel": conv_kernel(sd[f"{tprefix}.conv.weight"])})
        _set(hm_p, flax_path, "bn", {"scale": sd[f"{tprefix}.bn.weight"], "bias": sd[f"{tprefix}.bn.bias"]})
        _set(hm_s, flax_path, "bn", {"mean": sd[f"{tprefix}.bn.running_mean"], "var": sd[f"{tprefix}.bn.running_var"]})

    i = 0
    while f"head.head_module.out_cls.{i}.weight" in sd:
        for tower in ("conv_cls", "conv_reg", "conv_pose"):
            j = 0
            while f"head.head_module.{tower}.{i}.{j}.conv.weight" in sd:
                conv_module([f"{tower}{i}", f"conv{j}"], f"head.head_module.{tower}.{i}.{j}")
                j += 1
        for name in ("out_cls", "out_obj", "out_bbox", "out_kpt", "out_kpt_vis"):
            hm_p[f"{name}{i}"] = {
                "kernel": conv_kernel(sd[f"head.head_module.{name}.{i}.weight"]),
                "bias": sd[f"head.head_module.{name}.{i}.bias"],
            }
        i += 1
    return params, stats


def _convert_rtmo_model(sd: Dict[str, Any]) -> Dict[str, Any]:
    """RTMO / YOLOX-Pose (CSPDarknet + neck + head) checkpoint -> variables."""
    bb_p, bb_s = convert_torch_cspdarknet_backbone(sd)
    params: Dict[str, Any] = {"backbone": bb_p}
    stats: Dict[str, Any] = {"backbone": bb_s}
    if any(k.startswith("neck.input_proj.") for k in sd):  # HybridEncoder (RTMO)
        params["neck"], stats["neck"] = convert_torch_hybrid_encoder(sd)
    elif "neck.reduce_layers.0.conv.weight" in sd:  # YOLOXPAFPN (YOLOX-Pose)
        params["neck"], stats["neck"] = convert_torch_yolox_pafpn(sd)
    if "head.dcc.pose_to_kpts.0.weight" in sd:
        params["head"], stats["head"] = convert_torch_rtmo_head(sd)
    elif "head.head_module.out_kpt.0.weight" in sd:
        params["head"], stats["head"] = convert_torch_yoloxpose_head(sd)
    elif any(k.startswith("head.") for k in sd):  # plain heatmap-style head
        head_p, head_s = _convert_head(sd)
        params["head"] = head_p
        if head_s:
            stats["head"] = head_s
    return {"params": params, "batch_stats": stats}


def _convert_rtmcc_head(sd: Dict[str, Any]):
    """RTMCCHead torch keys -> flax tree: final conv, ScaleNorm+Linear token
    MLP, GAU (ln/uv/gamma/beta/o/res_scale[/w rel-bias]), SimCC classifiers."""

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    head_p: Dict[str, Any] = {
        "final_layer": {
            "kernel": conv_kernel(sd["head.final_layer.weight"]),
            "bias": sd["head.final_layer.bias"],
        },
        "mlp_norm": {"g": sd["head.mlp.0.g"]},
        "mlp_fc": {"kernel": sd["head.mlp.1.weight"].T},
        "cls_x": {"kernel": sd["head.cls_x.weight"].T},
        "cls_y": {"kernel": sd["head.cls_y.weight"].T},
    }
    gau = {
        "ln": {"g": sd["head.gau.ln.g"]},
        "uv": {"kernel": sd["head.gau.uv.weight"].T},
        "gamma": sd["head.gau.gamma"],
        "beta": sd["head.gau.beta"],
        "o": {"kernel": sd["head.gau.o.weight"].T},
    }
    if "head.gau.res_scale.scale" in sd:
        gau["res_scale"] = sd["head.gau.res_scale.scale"]
    if "head.gau.w" in sd:
        gau["w"] = sd["head.gau.w"]
    head_p["gau"] = gau
    return head_p, {}


def convert_torch_cspnext_pafpn(sd: Dict[str, Any]):
    """CSPNeXtPAFPN torch keys -> flax tree (reference
    ``mmpose/models/necks/cspnext_pafpn.py:75-146``): ``reduce_layers.{j}`` /
    ``top_down_blocks.{j}`` indexed high-to-low (j=0 is the highest level,
    our ``reduce{n-1}``/``top_down{n-1}``), ``downsamples.{k}`` /
    ``bottom_up_blocks.{k}`` low-to-high, CSP layers with CSPNeXt blocks.
    Out convs (only present when out_channels is not None) map per level."""

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_module(flax_path, tprefix):
        _set(params, flax_path, "conv", {"kernel": conv_kernel(sd[f"{tprefix}.conv.weight"])})
        _set(params, flax_path, "bn", {"scale": sd[f"{tprefix}.bn.weight"], "bias": sd[f"{tprefix}.bn.bias"]})
        _set(stats, flax_path, "bn", {"mean": sd[f"{tprefix}.bn.running_mean"], "var": sd[f"{tprefix}.bn.running_var"]})

    def csp_layer(flax_name, tprefix):
        for nm in ("main_conv", "short_conv", "final_conv"):
            conv_module([flax_name, nm], f"{tprefix}.{nm}")
        m = 0
        while f"{tprefix}.blocks.{m}.conv1.conv.weight" in sd:
            conv_module([flax_name, f"block{m}", "conv1"], f"{tprefix}.blocks.{m}.conv1")
            conv_module([flax_name, f"block{m}", "conv2", "depthwise"],
                        f"{tprefix}.blocks.{m}.conv2.depthwise_conv")
            conv_module([flax_name, f"block{m}", "conv2", "pointwise"],
                        f"{tprefix}.blocks.{m}.conv2.pointwise_conv")
            m += 1

    n_red = 0
    while f"neck.reduce_layers.{n_red}.conv.weight" in sd:
        n_red += 1
    n = n_red + 1  # number of input levels
    for j in range(n_red):
        conv_module([f"reduce{n - 1 - j}"], f"neck.reduce_layers.{j}")
        csp_layer(f"top_down{n - 1 - j}", f"neck.top_down_blocks.{j}")
    for k in range(n - 1):
        conv_module([f"down{k}"], f"neck.downsamples.{k}")
        csp_layer(f"bottom_up{k}", f"neck.bottom_up_blocks.{k}")
    i = 0
    while f"neck.out_convs.{i}.conv.weight" in sd:
        conv_module([f"out_conv{i}"], f"neck.out_convs.{i}")
        i += 1
    return params, stats


def _convert_rtmw_head(sd: Dict[str, Any]):
    """RTMWHead torch keys -> flax tree (reference
    ``heads/coord_cls_heads/rtmw_head.py:96-158``): three ConvModule branches
    (final_layer / conv_dec / final_layer2, BN+ReLU), two ScaleNorm+Linear
    token MLPs, one RTMCC GAU, and the SimCC x/y classifiers."""

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    head_p: Dict[str, Any] = {}
    head_s: Dict[str, Any] = {}
    for name in ("final_layer", "conv_dec", "final_layer2"):
        head_p[f"{name}_conv"] = {"kernel": conv_kernel(sd[f"head.{name}.conv.weight"])}
        head_p[f"{name}_bn"] = {"scale": sd[f"head.{name}.bn.weight"], "bias": sd[f"head.{name}.bn.bias"]}
        head_s[f"{name}_bn"] = {
            "mean": sd[f"head.{name}.bn.running_mean"], "var": sd[f"head.{name}.bn.running_var"]
        }
    head_p["mlp_norm"] = {"g": sd["head.mlp.0.g"]}
    head_p["mlp"] = {"kernel": sd["head.mlp.1.weight"].T}
    head_p["mlp2_norm"] = {"g": sd["head.mlp2.0.g"]}
    head_p["mlp2"] = {"kernel": sd["head.mlp2.1.weight"].T}
    gau = {
        "ln": {"g": sd["head.gau.ln.g"]},
        "uv": {"kernel": sd["head.gau.uv.weight"].T},
        "gamma": sd["head.gau.gamma"],
        "beta": sd["head.gau.beta"],
        "o": {"kernel": sd["head.gau.o.weight"].T},
    }
    if "head.gau.res_scale.scale" in sd:
        gau["res_scale"] = sd["head.gau.res_scale.scale"]
    if "head.gau.w" in sd:
        gau["w"] = sd["head.gau.w"]
    head_p["gau"] = gau
    head_p["cls_x"] = {"kernel": sd["head.cls_x.weight"].T}
    head_p["cls_y"] = {"kernel": sd["head.cls_y.weight"].T}
    return head_p, head_s


def _convert_cspnext_model(sd: Dict[str, Any]) -> Dict[str, Any]:
    bb_p, bb_s = convert_torch_cspnext_backbone(sd)
    neck_p = neck_s = None
    if "neck.reduce_layers.0.conv.weight" in sd or "neck.downsample_layers.0.conv.weight" in sd:
        neck_p, neck_s = convert_torch_cspnext_pafpn(sd)
    if "head.final_layer2.conv.weight" in sd:
        head_p, head_s = _convert_rtmw_head(sd)
    elif "head.gau.uv.weight" in sd:
        head_p, head_s = _convert_rtmcc_head(sd)
    else:
        head_p, head_s = _convert_head(sd)
    out = {
        "params": {"backbone": bb_p, "head": head_p},
        "batch_stats": {"backbone": bb_s, **({"head": head_s} if head_s else {})},
    }
    if neck_p is not None:
        out["params"]["neck"] = neck_p
        out["batch_stats"]["neck"] = neck_s
    return out


def convert_torch_state_dict(state_dict: Dict[str, Any], num_layers: int = 12) -> Dict[str, Any]:
    """Reference torch state dict -> flax variables dict.

    Detects the model family and routes to the matching converters:
    mmpretrain ViT (ProbPose), HRNet, ResNet (SimpleBaseline), CSPNeXt
    (RTMPose deconv/scalar-tower or RTMCC-GAU heads; RTMW with
    CSPNeXtPAFPN neck + two-level head), and CSPDarknet one-stage models
    (RTMO: HybridEncoder + DCC; YOLOX-Pose: YOLOXPAFPN + tower head).
    Returns {"params": ..., "batch_stats": ...}.
    """
    sd = {k: _t(v) for k, v in state_dict.items()}

    if "backbone.stem.conv.conv.weight" in sd:  # CSPDarknet Focus stem (RTMO / YOLOX-Pose)
        return _convert_rtmo_model(sd)
    if any(k.startswith("backbone.stem.") for k in sd):  # CSPNeXt (before HRNet: both have stage2)
        return _convert_cspnext_model(sd)
    if any(k.startswith("backbone.stage2.") for k in sd):
        return _convert_hrnet_model(sd)
    if "head.decoder.hw.weight" in sd:  # EDPose DETR-family (before ResNet)
        return _convert_edpose_model(sd)
    if "backbone.layer1.0.conv1.weight" in sd and "backbone.layers.0.ln1.weight" not in sd:
        return _convert_resnet_model(sd)
    params: Dict[str, Any] = {"backbone": {}, "head": {}}
    stats: Dict[str, Any] = {"head": {}}

    bb = params["backbone"]

    def conv_kernel(w):  # OIHW -> HWIO
        return np.transpose(w, (2, 3, 1, 0))

    def deconv_kernel(w):  # torch ConvTranspose2d OIHW (in, out, kh, kw) -> flax HWIO
        # flax ConvTranspose kernel shape (kh, kw, in, out); torch stores
        # (in, out, kh, kw) and computes transposed conv with flipped taps
        return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]

    # patch embed + pos embed
    if "backbone.patch_embed.projection.weight" in sd:
        bb["patch_embed"] = {
            "kernel": conv_kernel(sd["backbone.patch_embed.projection.weight"]),
            "bias": sd["backbone.patch_embed.projection.bias"],
        }
    if "backbone.pos_embed" in sd:
        bb["pos_embed"] = sd["backbone.pos_embed"]

    # transformer blocks (mmpretrain naming: backbone.layers.N.*)
    for i in range(num_layers):
        p = f"backbone.layers.{i}"
        if f"{p}.ln1.weight" not in sd:
            continue
        blk: Dict[str, Any] = {}
        blk["ln1"] = {"scale": sd[f"{p}.ln1.weight"], "bias": sd[f"{p}.ln1.bias"]}
        blk["ln2"] = {"scale": sd[f"{p}.ln2.weight"], "bias": sd[f"{p}.ln2.bias"]}
        blk["attn"] = {
            "qkv": {
                "kernel": sd[f"{p}.attn.qkv.weight"].T,
                "bias": sd[f"{p}.attn.qkv.bias"],
            },
            "proj": {
                "kernel": sd[f"{p}.attn.proj.weight"].T,
                "bias": sd[f"{p}.attn.proj.bias"],
            },
        }
        blk["mlp_fc1"] = {
            "kernel": sd[f"{p}.ffn.layers.0.0.weight"].T,
            "bias": sd[f"{p}.ffn.layers.0.0.bias"],
        }
        blk["mlp_fc2"] = {
            "kernel": sd[f"{p}.ffn.layers.1.weight"].T,
            "bias": sd[f"{p}.ffn.layers.1.bias"],
        }
        bb[f"block{i}"] = blk

    if "backbone.ln1.weight" in sd:
        bb["ln_final"] = {"scale": sd["backbone.ln1.weight"], "bias": sd["backbone.ln1.bias"]}

    head_p, head_s = _convert_head(sd)
    params["head"] = head_p
    stats["head"] = head_s
    return {"params": params, "batch_stats": stats}


def _convert_head(sd: Dict[str, Any]):
    """Head conversion shared across backbones: deconv stack, final conv,
    and the ProbPose scalar towers (absent keys are simply skipped)."""

    def conv_kernel(w):  # OIHW -> HWIO
        return np.transpose(w, (2, 3, 1, 0))

    def deconv_kernel(w):  # torch ConvTranspose2d (in, out, kh, kw) -> flax HWIO, flipped taps
        return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]

    head_p: Dict[str, Any] = {}
    head_s: Dict[str, Any] = {}

    # deconv stack: head.deconv_layers.{0,3}.weight convs, {1,4} BN
    deconv_idx = 0
    while f"head.deconv_layers.{deconv_idx * 3}.weight" in sd:
        w = sd[f"head.deconv_layers.{deconv_idx * 3}.weight"]
        bn = f"head.deconv_layers.{deconv_idx * 3 + 1}"
        head_p.setdefault("deconv_layers", {})[f"deconv{deconv_idx}"] = {"kernel": deconv_kernel(w)}
        head_p["deconv_layers"][f"bn{deconv_idx}"] = {"scale": sd[f"{bn}.weight"], "bias": sd[f"{bn}.bias"]}
        head_s.setdefault("deconv_layers", {})[f"bn{deconv_idx}"] = {
            "mean": sd[f"{bn}.running_mean"], "var": sd[f"{bn}.running_var"]
        }
        deconv_idx += 1

    if "head.final_layer.weight" in sd:
        head_p["final_layer"] = {
            "kernel": conv_kernel(sd["head.final_layer.weight"]),
            "bias": sd["head.final_layer.bias"],
        }

    # scalar towers: head.<name>_layers.{0 conv,1 bn,(2 pool),(3 relu)}...
    for name in ("probability_layers", "visibility_layers", "oks_layers", "error_layers"):
        conv_i = 0
        t_idx = 0
        tower_p: Dict[str, Any] = {}
        tower_s: Dict[str, Any] = {}
        while True:
            w_key = f"head.{name}.{t_idx}.weight"
            if w_key not in sd:
                break
            w = sd[w_key]
            if w.ndim == 4 and w.shape[-1] == 1 and f"head.{name}.{t_idx + 1}.weight" not in sd:
                # trailing 1x1 conv (sequence: conv, sigmoid/relu)
                tower_p["final"] = {"kernel": conv_kernel(w), "bias": sd[f"head.{name}.{t_idx}.bias"]}
                break
            tower_p[f"conv{conv_i}"] = {"kernel": conv_kernel(w), "bias": sd[f"head.{name}.{t_idx}.bias"]}
            tower_p[f"bn{conv_i}"] = {
                "scale": sd[f"head.{name}.{t_idx + 1}.weight"],
                "bias": sd[f"head.{name}.{t_idx + 1}.bias"],
            }
            tower_s[f"bn{conv_i}"] = {
                "mean": sd[f"head.{name}.{t_idx + 1}.running_mean"],
                "var": sd[f"head.{name}.{t_idx + 1}.running_var"],
            }
            conv_i += 1
            t_idx += 4  # conv, bn, pool, relu
        if tower_p:
            head_p[name] = tower_p
            head_s[name] = tower_s

    # DEKR RescoreNet (reference dekr_head.py:90-152): 3 torch Linears whose
    # weights may ship inside a model checkpoint (head.rescore_net.*) or as
    # the standalone kpt_rescore_*.pth release (bare l1/l2/l3 keys)
    for prefix in ("head.rescore_net.", "rescore_net.", ""):
        if (all(f"{prefix}l{i}.weight" in sd for i in (1, 2, 3))
                and sd[f"{prefix}l1.weight"].ndim == 2):
            head_p["rescore"] = {
                f"l{i}": {
                    "kernel": np.transpose(sd[f"{prefix}l{i}.weight"]),
                    "bias": sd[f"{prefix}l{i}.bias"],
                }
                for i in (1, 2, 3)
            }
            break
    return head_p, head_s


def convert_torch_resnet_backbone(sd: Dict[str, Any]):
    """mmpose/torchvision-style ResNet torch keys -> our flax tree (7x7 stem
    conv1/bn1, layer{1..4} basic/bottleneck blocks incl. downsample)."""

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(path, tprefix):
        node = params
        for part in path:
            node = node.setdefault(part, {})
        node["kernel"] = conv_kernel(sd[f"{tprefix}.weight"])

    def put_bn(path, tprefix):
        node_p, node_s = params, stats
        for part in path[:-1]:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        node_p[path[-1]] = {"scale": sd[f"{tprefix}.weight"], "bias": sd[f"{tprefix}.bias"]}
        node_s[path[-1]] = {"mean": sd[f"{tprefix}.running_mean"], "var": sd[f"{tprefix}.running_var"]}

    put_conv(["conv1"], "backbone.conv1")
    put_bn(["bn1"], "backbone.bn1")
    for layer in range(1, 5):
        n = 0
        while f"backbone.layer{layer}.{n}.conv1.weight" in sd:
            base = f"backbone.layer{layer}.{n}"
            blk = f"layer{layer}_block{n}"
            for c in ("conv1", "conv2", "conv3"):
                if f"{base}.{c}.weight" in sd:
                    put_conv([blk, c], f"{base}.{c}")
                    put_bn([blk, c.replace("conv", "bn")], f"{base}.{c.replace('conv', 'bn')}")
            if f"{base}.downsample.0.weight" in sd:
                put_conv([blk, "downsample_conv"], f"{base}.downsample.0")
                put_bn([blk, "downsample_bn"], f"{base}.downsample.1")
            n += 1
    return params, stats


def _convert_edpose_head(sd: Dict[str, Any], prefix: str = "head.") -> Dict[str, Any]:
    """Reference EDPose head torch keys -> flax ``EDPoseHead`` param tree
    (``models/heads/edpose_legacy.py``).

    Reference layout (``mmpose/models/heads/transformer_heads/edpose_head.py``):
    ``encoder.layers.{i}`` deformable layers (mmcv MSDA submodules +
    ``ffn.layers.0.0``/``.1`` + ``norms.{0,1}``), ``decoder.layers.{i}``
    (torch-MHA ``self_attn.attn.in_proj_weight`` + MSDA cross_attn + 3 norms),
    ``decoder.{norm,ref_point_head,hw,keypoint_embed}``, two-stage
    ``memory_trans_fc/norm`` + ``enc_out_{class,bbox}_embed``, and the
    ``out_head.{bbox,class,pose,pose_hw}_embed`` prediction stacks (the
    ``decoder.bbox_embed.*`` aliases of the same tensors and the train-only
    ``label_enc`` are skipped)."""

    def g(k):
        return sd[prefix + k]

    def lin(k):
        out = {"kernel": g(k + ".weight").T}
        if prefix + k + ".bias" in sd:
            out["bias"] = g(k + ".bias")
        return out

    def ln(k):
        return {"scale": g(k + ".weight"), "bias": g(k + ".bias")}

    def ffn3(k):
        return {f"fc{j}": lin(f"{k}.layers.{j}") for j in range(3)}

    def msda(k):
        return {
            name: lin(f"{k}.{name}")
            for name in ("sampling_offsets", "attention_weights", "value_proj", "output_proj")
        }

    p: Dict[str, Any] = {
        "level_embed": g("level_embed"),
        "hw": g("decoder.hw.weight"),
        "keypoint_embed": g("decoder.keypoint_embed.weight"),
        "decoder_norm": ln("decoder.norm"),
        "ref_point_head_fc0": lin("decoder.ref_point_head.layers.0"),
        "ref_point_head_fc1": lin("decoder.ref_point_head.layers.1"),
        "memory_trans_fc": lin("memory_trans_fc"),
        "memory_trans_norm": ln("memory_trans_norm"),
        "enc_out_class_embed": lin("enc_out_class_embed"),
        "enc_out_bbox_embed": ffn3("enc_out_bbox_embed"),
        "pose_hw_embed": ffn3("out_head.pose_hw_embed.0"),
    }
    i = 0
    while f"{prefix}encoder.layers.{i}.self_attn.value_proj.weight" in sd:
        base = f"encoder.layers.{i}"
        p[f"encoder_layer{i}_self_attn"] = msda(f"{base}.self_attn")
        p[f"encoder_layer{i}_norm0"] = ln(f"{base}.norms.0")
        p[f"encoder_layer{i}_norm1"] = ln(f"{base}.norms.1")
        p[f"encoder_layer{i}_ffn_fc1"] = lin(f"{base}.ffn.layers.0.0")
        p[f"encoder_layer{i}_ffn_fc2"] = lin(f"{base}.ffn.layers.1")
        i += 1
    i = 0
    while f"{prefix}decoder.layers.{i}.cross_attn.value_proj.weight" in sd:
        base = f"decoder.layers.{i}"
        p[f"decoder_layer{i}_self_attn"] = {
            "in_proj": {
                "kernel": g(f"{base}.self_attn.attn.in_proj_weight").T,
                "bias": g(f"{base}.self_attn.attn.in_proj_bias"),
            },
            "out_proj": lin(f"{base}.self_attn.attn.out_proj"),
        }
        p[f"decoder_layer{i}_cross_attn"] = msda(f"{base}.cross_attn")
        for j in range(3):
            p[f"decoder_layer{i}_norm{j}"] = ln(f"{base}.norms.{j}")
        p[f"decoder_layer{i}_ffn_fc1"] = lin(f"{base}.ffn.layers.0.0")
        p[f"decoder_layer{i}_ffn_fc2"] = lin(f"{base}.ffn.layers.1")
        i += 1
    i = 0
    while f"{prefix}out_head.bbox_embed.{i}.layers.0.weight" in sd:
        p[f"bbox_embed{i}"] = ffn3(f"out_head.bbox_embed.{i}")
        p[f"class_embed{i}"] = lin(f"out_head.class_embed.{i}")
        i += 1
    i = 0
    while f"{prefix}out_head.pose_embed.{i}.layers.0.weight" in sd:
        p[f"pose_embed{i}"] = ffn3(f"out_head.pose_embed.{i}")
        i += 1
    return p


def _convert_channel_mapper_neck(sd: Dict[str, Any], prefix: str = "neck.") -> Dict[str, Any]:
    """mmdet ChannelMapper (``convs.{i}`` + ``extra_convs.{j}`` ConvModules
    with GN) -> flax ``ChannelMapper`` params."""

    def conv_kernel(w):
        return np.transpose(w, (2, 3, 1, 0))

    p: Dict[str, Any] = {}
    for group, cname, gname in (("convs", "conv", "gn"), ("extra_convs", "extra_conv", "extra_gn")):
        i = 0
        while f"{prefix}{group}.{i}.conv.weight" in sd:
            conv = {"kernel": conv_kernel(sd[f"{prefix}{group}.{i}.conv.weight"])}
            if f"{prefix}{group}.{i}.conv.bias" in sd:
                conv["bias"] = sd[f"{prefix}{group}.{i}.conv.bias"]
            p[f"{cname}{i}"] = conv
            if f"{prefix}{group}.{i}.gn.weight" in sd:
                p[f"{gname}{i}"] = {
                    "scale": sd[f"{prefix}{group}.{i}.gn.weight"],
                    "bias": sd[f"{prefix}{group}.{i}.gn.bias"],
                }
            i += 1
    return p


def _convert_edpose_model(sd: Dict[str, Any]) -> Dict[str, Any]:
    """EDPose (ResNet + ChannelMapper + reference-layout EDPoseHead)."""
    bb_p, bb_s = convert_torch_resnet_backbone(sd)
    return {
        "params": {
            "backbone": bb_p,
            "neck": _convert_channel_mapper_neck(sd),
            "head": _convert_edpose_head(sd),
        },
        "batch_stats": {"backbone": bb_s},
    }


def _convert_resnet_model(sd: Dict[str, Any]) -> Dict[str, Any]:
    bb_p, bb_s = convert_torch_resnet_backbone(sd)
    head_p, head_s = _convert_head(sd)
    return {
        "params": {"backbone": bb_p, "head": head_p},
        "batch_stats": {"backbone": bb_s, "head": head_s},
    }


def _convert_hrnet_model(sd: Dict[str, Any]) -> Dict[str, Any]:
    """HRNet backbone + shared head conversion."""
    bb_p, bb_s = convert_torch_hrnet_backbone(sd)
    head_p, head_s = _convert_head(sd)
    return {
        "params": {"backbone": bb_p, "head": head_p},
        "batch_stats": {"backbone": bb_s, "head": head_s},
    }


def load_torch_checkpoint(path: str, num_layers: int = 12) -> Dict[str, Any]:
    """Load a reference .pth and convert (CPU torch only for deserialization)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    variables = convert_torch_state_dict(state_dict, num_layers=num_layers)
    meta = ckpt.get("meta", {})
    return dict(variables=variables, meta=meta)
