"""Torch -> flax checkpoint conversion parity.

Builds torch modules with the reference's exact layer layout and state-dict
naming (mmpretrain ViT blocks, SimpleBaselines deconv stack, ProbPose scalar
towers), converts their weights with ``convert_torch_state_dict``, and checks
our flax modules produce identical outputs.
"""

import numpy as np
import pytest

# torch-oracle compiles dominate the engine bucket's wall-clock on a
# 1-core box; conversion parity runs in the slow tier (docs: CONTRIBUTING.md)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from probpose_code_tpu.engine.checkpoint import convert_torch_state_dict  # noqa: E402


class TorchViTBlock(tnn.Module):
    """mmpretrain TransformerEncoderLayer layout (pre-norm, fused qkv)."""

    def __init__(self, dim=64, heads=4, ffn=128):
        super().__init__()
        self.ln1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.ln2 = tnn.LayerNorm(dim, eps=1e-6)
        self.ffn = tnn.Module()
        self.ffn.layers = tnn.ModuleList([tnn.Sequential(tnn.Linear(dim, ffn)), tnn.Linear(ffn, dim)])
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        B, N, C = x.shape
        h = self.ln1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("bqhd,bkhd->bhqk", q * (C // self.heads) ** -0.5, k)
        attn = attn.softmax(dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, C)
        x = x + self.attn.proj(o)
        h = self.ln2(x)
        h = self.ffn.layers[1](tnn.functional.gelu(self.ffn.layers[0][0](h)))
        return x + h


class TorchBackboneHead(tnn.Module):
    """backbone(patch+1 block) + head(deconv x2 + final + one tower)."""

    def __init__(self):
        super().__init__()
        self.backbone = tnn.Module()
        self.backbone.patch_embed = tnn.Module()
        self.backbone.patch_embed.projection = tnn.Conv2d(3, 64, 16, stride=16, padding=2)
        self.backbone.pos_embed = tnn.Parameter(torch.randn(1, 16 * 12, 64) * 0.02)
        self.backbone.layers = tnn.ModuleList([TorchViTBlock()])
        self.backbone.ln1 = tnn.LayerNorm(64, eps=1e-6)

        self.head = tnn.Module()
        self.head.deconv_layers = tnn.Sequential(
            tnn.ConvTranspose2d(64, 32, 4, stride=2, padding=1, bias=False),
            tnn.BatchNorm2d(32),
            tnn.ReLU(inplace=True),
            tnn.ConvTranspose2d(32, 32, 4, stride=2, padding=1, bias=False),
            tnn.BatchNorm2d(32),
            tnn.ReLU(inplace=True),
        )
        self.head.final_layer = tnn.Conv2d(32, 17, 1)

        relu = tnn.ReLU(inplace=True)
        layers = []
        for pool in [(4, 3), (2, 2), (2, 2)]:
            layers += [
                tnn.Conv2d(64, 64, 3, stride=1, padding=1),
                tnn.BatchNorm2d(64),
                tnn.MaxPool2d(pool, stride=pool),
                relu,
            ]
        layers += [tnn.Conv2d(64, 17, 1), tnn.Sigmoid()]
        self.head.probability_layers = tnn.Sequential(*layers)


def test_deconv_and_tower_conversion():
    torch.manual_seed(0)
    model = TorchBackboneHead().eval()
    variables = convert_torch_state_dict(model.state_dict(), num_layers=1)

    # ---- deconv stack + final layer --------------------------------------
    x = torch.randn(2, 64, 16, 12)
    with torch.no_grad():
        t_deconv = model.head.deconv_layers(x)
        t_final = model.head.final_layer(t_deconv)
        t_tower = model.head.probability_layers(x)

    from probpose_code_tpu.models.heads.heatmap_head import DeconvStack
    import flax.linen as nn

    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    stack = DeconvStack(out_channels=(32, 32), kernel_sizes=(4, 4))
    out = stack.apply(
        {"params": variables["params"]["head"]["deconv_layers"],
         "batch_stats": variables["batch_stats"]["head"]["deconv_layers"]},
        x_nhwc,
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), t_deconv.numpy(), atol=2e-4
    )

    final = nn.Conv(17, kernel_size=(1, 1), padding="SAME")
    out_final = final.apply({"params": variables["params"]["head"]["final_layer"]}, out)
    np.testing.assert_allclose(
        np.asarray(out_final).transpose(0, 3, 1, 2), t_final.numpy(), atol=2e-4
    )

    # ---- scalar tower ----------------------------------------------------
    from probpose_code_tpu.models.heads.probmap_head import ScalarBranchTower

    tower = ScalarBranchTower(64, 17)
    out_tower = tower.apply(
        {"params": variables["params"]["head"]["probability_layers"],
         "batch_stats": variables["batch_stats"]["head"]["probability_layers"]},
        x_nhwc,
        train=False,
    )
    out_tower = jax.nn.sigmoid(out_tower)
    np.testing.assert_allclose(np.asarray(out_tower), t_tower.numpy().reshape(2, 17), atol=2e-4)


def test_vit_block_conversion():
    torch.manual_seed(1)
    model = TorchBackboneHead().eval()
    variables = convert_torch_state_dict(model.state_dict(), num_layers=1)

    x = torch.randn(2, 192, 64)
    with torch.no_grad():
        t_out = model.backbone.layers[0](x)
        t_normed = model.backbone.ln1(t_out)

    from probpose_code_tpu.models.backbones.vit import TransformerBlock

    block = TransformerBlock(64, 4, 128)
    out = block.apply(
        {"params": variables["params"]["backbone"]["block0"]}, jnp.asarray(x.numpy()), train=False
    )
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-4)

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-6)
    out_n = ln.apply({"params": variables["params"]["backbone"]["ln_final"]}, out)
    np.testing.assert_allclose(np.asarray(out_n), t_normed.numpy(), atol=2e-4)


def test_patch_embed_conversion():
    torch.manual_seed(2)
    model = TorchBackboneHead().eval()
    variables = convert_torch_state_dict(model.state_dict(), num_layers=1)

    img = torch.randn(1, 3, 256, 192)
    with torch.no_grad():
        t_patch = model.backbone.patch_embed.projection(img)

    import flax.linen as nn

    conv = nn.Conv(64, kernel_size=(16, 16), strides=(16, 16), padding=((2, 2), (2, 2)))
    out = conv.apply(
        {"params": variables["params"]["backbone"]["patch_embed"]},
        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), t_patch.numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# HRNet checkpoint conversion: reference-layout torch HRNet -> flax parity
# ---------------------------------------------------------------------------

TINY_HRNET_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK", num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC", num_blocks=(1, 1), num_channels=(8, 16)),
    stage3=dict(num_modules=1, num_branches=3, block="BASIC", num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC", num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)),
)


def _build_torch_hrnet(extra):
    """mmpose-key-compatible torch HRNet (naming mirrors mmcv's HRNet so the
    state dict exercises the converter; written from the architecture spec)."""
    import torch
    import torch.nn as nn

    def conv_bn(cin, cout, k, s=1):
        return nn.Conv2d(cin, cout, k, s, padding=k // 2, bias=False), nn.BatchNorm2d(cout)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, cin, c):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, c, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c)
            self.conv2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(c)
            self.conv3 = nn.Conv2d(c, c * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(c * 4)
            self.relu = nn.ReLU()
            if cin != c * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, c * 4, 1, bias=False), nn.BatchNorm2d(c * 4))
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, cin, c):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, c, 3, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(c)
            self.conv2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(c)
            self.relu = nn.ReLU()
            self.downsample = None

        def forward(self, x):
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + x)

    class HRModule(nn.Module):
        def __init__(self, n_br, blocks, channels, multiscale_output=True):
            super().__init__()
            self.branches = nn.ModuleList([
                nn.Sequential(*[BasicBlock(channels[b], channels[b]) for _ in range(blocks[b])])
                for b in range(n_br)
            ])
            fuse = []
            for i in range(n_br if multiscale_output else 1):
                row = []
                for j in range(n_br):
                    if j > i:
                        row.append(nn.Sequential(
                            nn.Conv2d(channels[j], channels[i], 1, bias=False),
                            nn.BatchNorm2d(channels[i]),
                            nn.Upsample(scale_factor=2 ** (j - i), mode="nearest"),
                        ))
                    elif j < i:
                        steps = []
                        for k in range(i - j):
                            last = k == i - j - 1
                            cout = channels[i] if last else channels[j]
                            mods = [nn.Conv2d(channels[j] if k == 0 else channels[j], cout, 3, 2, 1, bias=False),
                                    nn.BatchNorm2d(cout)]
                            if not last:
                                mods.append(nn.ReLU())
                            steps.append(nn.Sequential(*mods))
                        row.append(nn.Sequential(*steps))
                    else:
                        row.append(None)
                fuse.append(nn.ModuleList(row))
            self.fuse_layers = nn.ModuleList(fuse)
            self.relu = nn.ReLU()

        def forward(self, xs):
            xs = [br(x) for br, x in zip(self.branches, xs)]
            outs = []
            for i, row in enumerate(self.fuse_layers):
                acc = None
                for j, f in enumerate(row):
                    y = xs[j] if f is None else f(xs[j])
                    acc = y if acc is None else acc + y
                outs.append(self.relu(acc))
            return outs

    class HRNetTorch(nn.Module):
        def __init__(self, extra):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            s1 = extra["stage1"]
            blocks = []
            cin = 64
            for _ in range(s1["num_blocks"][0]):
                blocks.append(Bottleneck(cin, s1["num_channels"][0]))
                cin = s1["num_channels"][0] * 4
            self.layer1 = nn.Sequential(*blocks)

            prev = [cin]
            for si in (2, 3, 4):
                cfg = extra[f"stage{si}"]
                cur = list(cfg["num_channels"])
                trans = []
                for b in range(cfg["num_branches"]):
                    if b < len(prev):
                        if prev[b] != cur[b]:
                            trans.append(nn.Sequential(
                                nn.Conv2d(prev[b], cur[b], 3, 1, 1, bias=False),
                                nn.BatchNorm2d(cur[b]), nn.ReLU()))
                        else:
                            trans.append(None)
                    else:
                        trans.append(nn.Sequential(nn.Sequential(
                            nn.Conv2d(prev[-1], cur[b], 3, 2, 1, bias=False),
                            nn.BatchNorm2d(cur[b]), nn.ReLU())))
                setattr(self, f"transition{si - 1}", nn.ModuleList(trans))
                mods = [HRModule(cfg["num_branches"], cfg["num_blocks"], cur,
                                 multiscale_output=not (si == 4 and m == cfg["num_modules"] - 1))
                        for m in range(cfg["num_modules"])]
                setattr(self, f"stage{si}", nn.Sequential(*mods))
                prev = cur

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.relu(self.bn2(self.conv2(x)))
            x = self.layer1(x)
            xs = [x]
            for si in (2, 3, 4):
                trans = getattr(self, f"transition{si - 1}")
                new_xs = []
                for b, t in enumerate(trans):
                    src = xs[b] if b < len(xs) else xs[-1]
                    new_xs.append(src if t is None else t(src))
                xs = new_xs
                for mod in getattr(self, f"stage{si}"):
                    xs = mod(xs)
            return xs

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = HRNetTorch(extra)
            self.head = nn.Module()
            self.head.final_layer = nn.Conv2d(extra["stage4"]["num_channels"][0], 17, 1)

        def forward(self, x):
            return self.head.final_layer(self.backbone(x)[0])

    return Model()


def test_hrnet_conversion_forward_parity():
    """Random-weight reference-layout torch HRNet -> converted flax model:
    forward outputs match (proves the checkpoint converter end to end)."""
    import torch

    import jax.numpy as jnp

    from probpose_code_tpu.engine.checkpoint import convert_torch_state_dict
    from probpose_code_tpu.models import PoseModel

    torch.manual_seed(0)
    tm = _build_torch_hrnet(TINY_HRNET_EXTRA)
    # non-trivial BN stats
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
        tm.eval()

    variables = convert_torch_state_dict(tm.state_dict())

    cfg = dict(
        type="TopdownPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="HRNet", in_channels=3, extra=TINY_HRNET_EXTRA),
        head=dict(
            type="HeatmapHead", in_channels=8, out_channels=17,
            deconv_out_channels=None, final_layer=dict(kernel_size=1),
            loss=dict(type="KeypointMSELoss", use_target_weight=True),
            decoder=dict(type="MSRAHeatmap", input_size=(64, 64), heatmap_size=(16, 16), sigma=2),
        ),
        test_cfg=dict(flip_test=False),
    )
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo

    model = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    init_vars = model.init(input_shape=(1, 64, 64, 3))

    # converted tree must cover the full init tree
    import jax

    init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    assert init_paths == conv_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:5]} extra: {sorted(conv_paths - init_paths)[:5]}"
    )

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = model.forward(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


# ---------------------------------------------------------------------------
# CSPNeXt + RTMCC (RTMPose) conversion parity
# ---------------------------------------------------------------------------


def _build_torch_rtmpose(widen=0.125, deepen=0.167, num_kpts=17, in_hw=(64, 64), hidden=32, s=16):
    """Reference-layout torch RTMPose-tiny-ish (mmdet/mmpose key naming)."""
    import math

    import torch
    import torch.nn as nn

    class ConvModule(nn.Module):
        def __init__(self, cin, cout, k, stride=1, groups=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride, k // 2, groups=groups, bias=False)
            self.bn = nn.BatchNorm2d(cout, momentum=0.03, eps=1e-3)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class DWSep(nn.Module):
        def __init__(self, cin, cout, k=5):
            super().__init__()
            self.depthwise_conv = ConvModule(cin, cin, k, groups=cin)
            self.pointwise_conv = ConvModule(cin, cout, 1)

        def forward(self, x):
            return self.pointwise_conv(self.depthwise_conv(x))

    class Block(nn.Module):
        def __init__(self, c, add_identity=True):
            super().__init__()
            self.conv1 = ConvModule(c, c, 3)
            self.conv2 = DWSep(c, c, 5)
            self.add_identity = add_identity

        def forward(self, x):
            out = self.conv2(self.conv1(x))
            return out + x if self.add_identity else out

    class Attention(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.fc = nn.Conv2d(c, c, 1)
            self.act = nn.Hardsigmoid()

        def forward(self, x):
            w = self.act(self.fc(x.mean((2, 3), keepdim=True)))
            return x * w

    class CSPLayer(nn.Module):
        def __init__(self, cin, cout, n, add_identity=True):
            super().__init__()
            mid = cout // 2
            self.main_conv = ConvModule(cin, mid, 1)
            self.short_conv = ConvModule(cin, mid, 1)
            self.final_conv = ConvModule(2 * mid, cout, 1)
            self.blocks = nn.Sequential(*[Block(mid, add_identity) for _ in range(n)])
            self.attention = Attention(2 * mid)

        def forward(self, x):
            xs = self.short_conv(x)
            xm = self.blocks(self.main_conv(x))
            return self.final_conv(self.attention(torch.cat((xm, xs), 1)))

    class SPP(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = ConvModule(c, c // 2, 1)
            self.conv2 = ConvModule(c * 2, c, 1)
            self.pools = nn.ModuleList([nn.MaxPool2d(k, 1, k // 2) for k in (5, 9, 13)])

        def forward(self, x):
            x = self.conv1(x)
            return self.conv2(torch.cat([x] + [p(x) for p in self.pools], 1))

    arch = [[64, 128, 3, True, False], [128, 256, 6, True, False],
            [256, 512, 6, True, False], [512, 1024, 3, False, True]]

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            stem_ch = int(64 * widen // 2)
            self.stem = nn.Sequential(
                ConvModule(3, stem_ch, 3, 2), ConvModule(stem_ch, stem_ch, 3), ConvModule(stem_ch, stem_ch * 2, 3)
            )
            cin = stem_ch * 2
            for i, (ic, oc, n, addid, use_spp) in enumerate(arch):
                oc = int(oc * widen)
                n = max(round(n * deepen), 1)
                mods = [ConvModule(cin, oc, 3, 2)]
                if use_spp:
                    mods.append(SPP(oc))
                mods.append(CSPLayer(oc, oc, n, addid))
                setattr(self, f"stage{i + 1}", nn.Sequential(*mods))
                cin = oc

        def forward(self, x):
            x = self.stem(x)
            for i in range(4):
                x = getattr(self, f"stage{i + 1}")(x)
            return x

    class ScaleNorm(nn.Module):
        def __init__(self, dim, eps=1e-5):
            super().__init__()
            self.scale = dim ** -0.5
            self.eps = eps
            self.g = nn.Parameter(torch.ones(1))

        def forward(self, x):
            norm = torch.norm(x, dim=-1, keepdim=True) * self.scale
            return x / norm.clamp(min=self.eps) * self.g

    class GAU(nn.Module):
        def __init__(self, dim, expansion=2, s_=s):
            super().__init__()
            e = dim * expansion
            self.e, self.s = e, s_
            self.ln = ScaleNorm(dim)
            self.uv = nn.Linear(dim, 2 * e + s_, bias=False)
            self.gamma = nn.Parameter(torch.rand(2, s_))
            self.beta = nn.Parameter(torch.rand(2, s_))
            self.o = nn.Linear(e, dim, bias=False)

            class Scale(nn.Module):
                def __init__(self, d):
                    super().__init__()
                    self.scale = nn.Parameter(torch.ones(d))

                def forward(self, x):
                    return x * self.scale

            self.res_scale = Scale(dim)
            self.act = nn.SiLU()
            self.sqrt_s = math.sqrt(s_)

        def forward(self, x):
            shortcut = x
            h = self.ln(x)
            uv = self.act(self.uv(h))
            u, v, base = torch.split(uv, [self.e, self.e, self.s], dim=-1)
            base = base.unsqueeze(2) * self.gamma[None, None] + self.beta[None, None]
            q, k = torch.unbind(base, dim=2)
            qk = torch.bmm(q, k.permute(0, 2, 1))
            kernel = torch.square(torch.relu(qk / self.sqrt_s))
            out = u * torch.bmm(kernel, v)
            return self.res_scale(shortcut) + self.o(out)

    class Head(nn.Module):
        def __init__(self, cin, feat_hw):
            super().__init__()
            self.final_layer = nn.Conv2d(cin, num_kpts, 7, padding=3)
            flat = feat_hw[0] * feat_hw[1]
            self.mlp = nn.Sequential(ScaleNorm(flat), nn.Linear(flat, hidden, bias=False))
            self.gau = GAU(hidden)
            self.cls_x = nn.Linear(hidden, int(in_hw[1] * 2), bias=False)
            self.cls_y = nn.Linear(hidden, int(in_hw[0] * 2), bias=False)

        def forward(self, feats):
            f = self.final_layer(feats)
            B, K = f.shape[:2]
            f = f.flatten(2)
            f = self.mlp(f)
            f = self.gau(f)
            return self.cls_x(f), self.cls_y(f)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.head = Head(int(1024 * widen), (in_hw[0] // 32, in_hw[1] // 32))

        def forward(self, x):
            return self.head(self.backbone(x))

    return Model()


def test_rtmpose_conversion_forward_parity():
    """Reference-layout torch CSPNeXt+RTMCC -> converted flax model parity."""
    import torch

    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.engine.checkpoint import convert_torch_state_dict
    from probpose_code_tpu.models import PoseModel

    torch.manual_seed(1)
    tm = _build_torch_rtmpose()
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
        tm.eval()

    variables = convert_torch_state_dict(tm.state_dict())

    cfg = dict(
        type="TopdownPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="CSPNeXt", arch="P5", deepen_factor=0.167, widen_factor=0.125,
                      out_indices=(4,), channel_attention=True),
        head=dict(
            type="RTMCCHead", in_channels=128, out_channels=17, input_size=(64, 64),
            in_featuremap_size=(2, 2), simcc_split_ratio=2.0, final_layer_kernel_size=7,
            gau_cfg=dict(hidden_dims=32, s=16, expansion_factor=2, dropout_rate=0.0,
                         drop_path=0.0, act_fn="SiLU", use_rel_bias=False, pos_enc=False),
            loss=dict(type="KLDiscretLoss", use_target_weight=True),
            decoder=dict(type="SimCCLabel", input_size=(64, 64), sigma=(4.9, 5.66),
                         simcc_split_ratio=2.0, normalize=False),
        ),
        test_cfg=dict(flip_test=False),
    )
    model = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    init_vars = model.init(input_shape=(1, 64, 64, 3))

    init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    assert init_paths == conv_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:6]} extra: {sorted(conv_paths - init_paths)[:6]}"
    )

    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_x, ref_y = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    px, py = model.forward(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(px), ref_x.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(py), ref_y.numpy(), atol=5e-4)


# ---------------------------------------------------------------------------
# ResNet (SimpleBaseline) conversion parity
# ---------------------------------------------------------------------------


def _build_torch_simplebaseline(depth_blocks=(3, 4, 6, 3), width=4, num_kpts=17):
    import torch
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, c, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, c, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c)
            self.conv2 = nn.Conv2d(c, c, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c)
            self.conv3 = nn.Conv2d(c, c * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(c * 4)
            self.relu = nn.ReLU()
            if stride != 1 or cin != c * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, c * 4, 1, stride, bias=False), nn.BatchNorm2d(c * 4))
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = 64
            for li, n in enumerate(depth_blocks):
                c = width * (2 ** li)
                blocks = []
                for b in range(n):
                    stride = 2 if (li > 0 and b == 0) else 1
                    blocks.append(Bottleneck(cin, c, stride))
                    cin = c * 4
                setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(4):
                x = getattr(self, f"layer{li + 1}")(x)
            return x

    class Head(nn.Module):
        def __init__(self, cin):
            super().__init__()
            layers = []
            for c in (16, 16):
                layers += [nn.ConvTranspose2d(cin, c, 4, 2, 1, bias=False),
                           nn.BatchNorm2d(c), nn.ReLU()]
                cin = c
            self.deconv_layers = nn.Sequential(*layers)
            self.final_layer = nn.Conv2d(cin, num_kpts, 1)

        def forward(self, x):
            return self.final_layer(self.deconv_layers(x))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.head = Head(width * 8 * 4)

        def forward(self, x):
            return self.head(self.backbone(x))

    return Model()


def test_resnet_conversion_forward_parity():
    """Reference-layout torch SimpleBaseline (ResNet bottleneck + deconv
    heatmap head) -> converted flax model parity."""
    import torch

    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.engine.checkpoint import convert_torch_state_dict
    from probpose_code_tpu.models import PoseModel

    torch.manual_seed(2)
    tm = _build_torch_simplebaseline()
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
        tm.eval()

    variables = convert_torch_state_dict(tm.state_dict())

    cfg = dict(
        type="TopdownPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="ResNet", depth=50, stem_channels=64, base_channels=4, out_indices=(3,)),
        head=dict(
            type="HeatmapHead", in_channels=128, out_channels=17,
            deconv_out_channels=(16, 16), deconv_kernel_sizes=(4, 4),
            loss=dict(type="KeypointMSELoss", use_target_weight=True),
            decoder=dict(type="MSRAHeatmap", input_size=(64, 64), heatmap_size=(16, 16), sigma=2),
        ),
        test_cfg=dict(flip_test=False),
    )
    model = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    init_vars = model.init(input_shape=(1, 64, 64, 3))

    init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    assert init_paths == conv_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:6]} extra: {sorted(conv_paths - init_paths)[:6]}"
    )

    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = model.forward(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


# ---------------------------------------------------------------------------
# CSPDarknet (RTMO backbone) conversion parity
# ---------------------------------------------------------------------------


def _build_torch_cspdarknet(widen=0.125, deepen=0.33):
    import torch
    import torch.nn as nn

    class ConvModule(nn.Module):
        def __init__(self, cin, cout, k, stride=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
            self.bn = nn.BatchNorm2d(cout, momentum=0.03, eps=1e-3)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class Focus(nn.Module):
        def __init__(self, cin, cout, k=3):
            super().__init__()
            self.conv = ConvModule(cin * 4, cout, k)

        def forward(self, x):
            tl, tr = x[..., ::2, ::2], x[..., ::2, 1::2]
            bl, br = x[..., 1::2, ::2], x[..., 1::2, 1::2]
            return self.conv(torch.cat((tl, bl, tr, br), 1))

    class Bottleneck(nn.Module):
        def __init__(self, cin, cout, add_identity=True):
            super().__init__()
            mid = int(cout * 1.0)  # CSPLayer builds DarknetBottleneck(expansion=1.0)
            self.conv1 = ConvModule(cin, mid, 1)
            self.conv2 = ConvModule(mid, cout, 3)
            self.add_identity = add_identity and cin == cout

        def forward(self, x):
            out = self.conv2(self.conv1(x))
            return out + x if self.add_identity else out

    class CSPLayer(nn.Module):
        def __init__(self, cin, cout, n, add_identity=True):
            super().__init__()
            mid = cout // 2
            self.main_conv = ConvModule(cin, mid, 1)
            self.short_conv = ConvModule(cin, mid, 1)
            self.final_conv = ConvModule(2 * mid, cout, 1)
            self.blocks = nn.Sequential(*[Bottleneck(mid, mid, add_identity) for _ in range(n)])

        def forward(self, x):
            xs = self.short_conv(x)
            xm = self.blocks(self.main_conv(x))
            return self.final_conv(torch.cat((xm, xs), 1))

    class SPP(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = ConvModule(c, c // 2, 1)
            self.conv2 = ConvModule(c * 2, c, 1)
            self.pools = nn.ModuleList([nn.MaxPool2d(k, 1, k // 2) for k in (5, 9, 13)])

        def forward(self, x):
            x = self.conv1(x)
            return self.conv2(torch.cat([x] + [p(x) for p in self.pools], 1))

    arch = [[64, 128, 3, True, False], [128, 256, 9, True, False],
            [256, 512, 9, True, False], [512, 1024, 3, False, True]]

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = Focus(3, int(64 * widen), k=3)
            cin = int(64 * widen)
            for i, (ic, oc, n, addid, use_spp) in enumerate(arch):
                oc = int(oc * widen)
                n = max(round(n * deepen), 1)
                mods = [ConvModule(cin, oc, 3, 2)]
                if use_spp:
                    mods.append(SPP(oc))
                mods.append(CSPLayer(oc, oc, n, addid))
                setattr(self, f"stage{i + 1}", nn.Sequential(*mods))
                cin = oc

        def forward(self, x):
            x = self.stem(x)
            outs = []
            for i in range(4):
                x = getattr(self, f"stage{i + 1}")(x)
                if i >= 1:
                    outs.append(x)
            return outs

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()

        def forward(self, x):
            return self.backbone(x)

    return Model()


def test_cspdarknet_conversion_forward_parity():
    """Reference-layout torch CSPDarknet (RTMO backbone) -> flax parity."""
    import torch

    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.engine.checkpoint import convert_torch_cspdarknet_backbone, _t
    from probpose_code_tpu.models.backbones.csp_darknet import CSPDarknet

    torch.manual_seed(3)
    tm = _build_torch_cspdarknet()
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
        tm.eval()

    sd = {k: _t(v) for k, v in tm.state_dict().items()}
    bb_p, bb_s = convert_torch_cspdarknet_backbone(sd)

    flax_bb = CSPDarknet(deepen_factor=0.33, widen_factor=0.125, out_indices=(2, 3, 4))
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    init_vars = flax_bb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(bb_p)[0]}
    assert init_paths == conv_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:6]} extra: {sorted(conv_paths - init_paths)[:6]}"
    )

    with torch.no_grad():
        refs = [t.numpy().transpose(0, 2, 3, 1) for t in tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    outs = flax_bb.apply({"params": bb_p, "batch_stats": bb_s}, jnp.asarray(x), train=False)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r, atol=5e-4)


def _build_torch_hybrid_encoder(in_channels=(32, 64, 128), hidden=64, heads=4,
                                ffn=128, widen=0.5, num_blocks=1, proj=48):
    """Reference-layout HybridEncoder (``mmpose/models/necks/hybrid_encoder.py``):
    input_proj ConvModules (no act, BN eps 1e-5), one DETR encoder level with
    mmcv-style ``self_attn.attn``/``ffn.layers``/``norms`` keys, CSPRepLayer
    FPN/PAN over RepVGG bottlenecks, ChannelMapper projector."""
    import math

    import torch.nn.functional as F

    class ConvModule(tnn.Module):
        def __init__(self, cin, cout, k, stride=1, act=True):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
            self.bn = tnn.BatchNorm2d(cout)
            self.act = tnn.SiLU() if act else tnn.Identity()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class RepVGG(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.branch_3x3 = ConvModule(c, c, 3, act=False)
            self.branch_1x1 = ConvModule(c, c, 1, act=False)

        def forward(self, x):
            return F.silu(self.branch_3x3(x) + self.branch_1x1(x))

    class CSPRep(tnn.Module):
        def __init__(self, cin, cout, n, widen_):
            super().__init__()
            mid = int(cout * widen_)
            self.conv1 = ConvModule(cin, mid, 1)
            self.conv2 = ConvModule(cin, mid, 1)
            self.bottlenecks = tnn.Sequential(*[RepVGG(mid) for _ in range(n)])
            self.conv3 = ConvModule(mid, cout, 1) if mid != cout else tnn.Identity()

        def forward(self, x):
            return self.conv3(self.bottlenecks(self.conv1(x)) + self.conv2(x))

    class Attn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.MultiheadAttention(hidden, heads, batch_first=True)

    class EncLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = Attn()

            class FFN(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.layers = tnn.Sequential(
                        tnn.Sequential(tnn.Linear(hidden, ffn), tnn.GELU()), tnn.Linear(ffn, hidden)
                    )

            self.ffn = FFN()
            self.norms = tnn.ModuleList([tnn.LayerNorm(hidden), tnn.LayerNorm(hidden)])

        def forward(self, x, pos):
            q = x + pos
            out = self.self_attn.attn(q, q, x)[0]
            x = self.norms[0](x + out)
            return self.norms[1](x + self.ffn.layers(x))

    class Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layers = tnn.ModuleList([EncLayer()])

        def forward(self, x, pos):
            for layer in self.layers:
                x = layer(x, pos)
            return x

    def pos_enc_2d(h, w, c, temp=10000.0):
        # SinePositionalEncoding(spatial_dim=2) stacked + the HybridEncoder's
        # transpose(-1, -2).reshape flatten == concat [enc_h | enc_w]
        pos_dim = c // 2
        dim_t = temp ** (torch.arange(pos_dim, dtype=torch.float32) / pos_dim)
        gh, gw = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32), indexing="ij")
        fh = gh.flatten()[:, None] / dim_t
        fw = gw.flatten()[:, None] / dim_t
        eh = torch.cat([fh.cos(), fh.sin()], -1)
        ew = torch.cat([fw.cos(), fw.sin()], -1)
        return torch.cat([eh, ew], -1)

    class Projector(tnn.Module):
        def __init__(self):
            super().__init__()
            self.convs = tnn.ModuleList([ConvModule(hidden, proj, 1, act=False) for _ in range(2)])

    class Neck(tnn.Module):
        def __init__(self):
            super().__init__()
            self.input_proj = tnn.ModuleList([ConvModule(c, hidden, 1, act=False) for c in in_channels])
            self.encoder = tnn.ModuleList([Enc()])
            self.lateral_convs = tnn.ModuleList([ConvModule(hidden, hidden, 1) for _ in range(2)])
            self.fpn_blocks = tnn.ModuleList([CSPRep(hidden * 2, hidden, num_blocks, widen) for _ in range(2)])
            self.downsample_convs = tnn.ModuleList([ConvModule(hidden, hidden, 3, 2) for _ in range(2)])
            self.pan_blocks = tnn.ModuleList([CSPRep(hidden * 2, hidden, num_blocks, widen) for _ in range(2)])
            self.projector = Projector()

        def forward(self, feats):
            feats = [self.input_proj[i](x) for i, x in enumerate(feats)]
            b, c, h, w = feats[2].shape
            tokens = feats[2].flatten(2).permute(0, 2, 1)
            tokens = self.encoder[0](tokens, pos_enc_2d(h, w, hidden // 2)[None])
            feats[2] = tokens.permute(0, 2, 1).reshape(b, c, h, w)
            inner = [feats[2]]
            for idx in (2, 1):
                high = self.lateral_convs[2 - idx](inner[0])
                inner[0] = high
                up = F.interpolate(high, scale_factor=2.0, mode="nearest")
                inner.insert(0, self.fpn_blocks[2 - idx](torch.cat([up, feats[idx - 1]], 1)))
            outs = [inner[0]]
            for idx in range(2):
                down = self.downsample_convs[idx](outs[-1])
                outs.append(self.pan_blocks[idx](torch.cat([down, inner[idx + 1]], 1)))
            outs = [outs[1], outs[2]]  # output_indices=[1, 2]
            return [self.projector.convs[i](o) for i, o in enumerate(outs)]

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.neck = Neck()

        def forward(self, feats):
            return self.neck(feats)

    return Model()


def test_hybrid_encoder_conversion_forward_parity():
    """Reference-layout torch HybridEncoder (RTMO neck) -> flax parity,
    including the [enc_h | enc_w] sine positional-encoding flatten layout."""
    from probpose_code_tpu.engine.checkpoint import _t, convert_torch_hybrid_encoder
    from probpose_code_tpu.models.necks.hybrid_encoder import HybridEncoder

    torch.manual_seed(5)
    tm = _build_torch_hybrid_encoder()
    rng = np.random.RandomState(5)
    feats = [rng.rand(2, c, s, s).astype(np.float32)
             for c, s in zip((32, 64, 128), (16, 8, 4))]
    with torch.no_grad():
        tm.train()
        tm([torch.from_numpy(f) for f in feats])
        tm.eval()
        refs = [t.numpy().transpose(0, 2, 3, 1) for t in tm([torch.from_numpy(f) for f in feats])]

    sd = {k: _t(v) for k, v in tm.state_dict().items()}
    neck_p, neck_s = convert_torch_hybrid_encoder(sd, num_heads=4)

    flax_neck = HybridEncoder(
        in_channels=(32, 64, 128), hidden_dim=64, num_heads=4, feedforward_channels=128,
        widen_factor=0.5, deepen_factor=1 / 3, output_indices=(1, 2), projector_channels=48,
    )
    xs = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats)
    init_vars = flax_neck.init(jax.random.PRNGKey(0), xs, train=False)
    init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(neck_p)[0]}
    assert init_paths == conv_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:6]} extra: {sorted(conv_paths - init_paths)[:6]}"
    )

    outs = flax_neck.apply({"params": neck_p, "batch_stats": neck_s}, xs, train=False)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r, atol=1e-3)


def _build_torch_rtmo_head(num_kpts=5, in_ch=64, widen=0.5, cls_feat=32, num_groups=4,
                           cpg=12, pose_vec=32, dcc_feat=16, num_bins=(8, 10), spe_ch=12,
                           gau_s=8, spe_temp=300.0):
    """Reference-layout RTMOHead (``rtmo_head.py``): RTMOHeadModule cls/pose
    towers over split-channel features (:180-219, BN eps 1e-3) and the DCC
    (:228-555) with pose_to_kpts Linear+BN1d, sine bin encodings (temp 300),
    GAU with additive learnable pos_enc, and sigma_fc Linear+Sigmoid+Scale."""
    import math

    import torch.nn.functional as F

    hm_in = int(in_ch * widen)          # per-branch input channels (:89)
    cls_ch = int(cls_feat * widen)
    pose_ch = num_groups * int(widen * cpg)

    class ConvModule(tnn.Module):
        def __init__(self, cin, cout, k, groups=1):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, 1, k // 2, groups=groups, bias=False)
            self.bn = tnn.BatchNorm2d(cout, momentum=0.03, eps=1e-3)
            self.act = tnn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class HeadModule(tnn.Module):
        def __init__(self, n_levels=2):
            super().__init__()
            self.conv_cls = tnn.ModuleList(
                tnn.Sequential(*[ConvModule(hm_in if j == 0 else cls_ch, cls_ch, 3) for j in range(2)])
                for _ in range(n_levels)
            )
            self.conv_pose = tnn.ModuleList(
                tnn.Sequential(*[
                    ConvModule(hm_in if j == 0 else pose_ch, pose_ch, 3, groups=1 if j == 0 else num_groups)
                    for j in range(4)
                ])
                for _ in range(n_levels)
            )
            self.out_cls = tnn.ModuleList(tnn.Conv2d(cls_ch, 1, 1) for _ in range(n_levels))
            self.out_bbox = tnn.ModuleList(tnn.Conv2d(pose_ch, 4, 1) for _ in range(n_levels))
            self.out_kpt_reg = tnn.ModuleList(tnn.Conv2d(pose_ch, num_kpts * 2, 1) for _ in range(n_levels))
            self.out_kpt_vis = tnn.ModuleList(tnn.Conv2d(pose_ch, num_kpts, 1) for _ in range(n_levels))
            self.out_pose = tnn.ModuleList(tnn.Conv2d(pose_ch, pose_vec, 1) for _ in range(n_levels))

        def forward(self, feats):
            out = []
            for i, x in enumerate(feats):
                cls_feat_, reg_feat = x.split(x.size(1) // 2, 1)
                cf = self.conv_cls[i](cls_feat_)
                pf = self.conv_pose[i](reg_feat)
                out.append((self.out_cls[i](cf), self.out_bbox[i](pf), self.out_kpt_reg[i](pf),
                            self.out_kpt_vis[i](pf), self.out_pose[i](pf)))
            return out

    class ScaleNorm(tnn.Module):
        def __init__(self, dim, eps=1e-5):
            super().__init__()
            self.scale = dim ** -0.5
            self.eps = eps
            self.g = tnn.Parameter(torch.ones(1))

        def forward(self, x):
            norm = torch.norm(x, dim=-1, keepdim=True) * self.scale
            return x / norm.clamp(min=self.eps) * self.g

    class ChannelScale(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.scale = tnn.Parameter(torch.ones(d))

        def forward(self, x):
            return x * self.scale

    class GAU(tnn.Module):
        def __init__(self, dim, expansion=2):
            super().__init__()
            e = dim * expansion
            self.e, self.s = e, gau_s
            self.ln = ScaleNorm(dim)
            self.uv = tnn.Linear(dim, 2 * e + gau_s, bias=False)
            self.gamma = tnn.Parameter(torch.rand(2, gau_s))
            self.beta = tnn.Parameter(torch.rand(2, gau_s))
            self.o = tnn.Linear(e, dim, bias=False)
            self.res_scale = ChannelScale(dim)
            self.sqrt_s = math.sqrt(gau_s)

        def forward(self, x, pos_enc):
            shortcut = x
            h = self.ln(x)
            uv = F.silu(self.uv(h))
            u, v, base = torch.split(uv, [self.e, self.e, self.s], dim=-1)
            q = base * self.gamma[0] + self.beta[0] + pos_enc
            k = base * self.gamma[1] + self.beta[1] + pos_enc
            qk = torch.einsum("...ns,...ms->...nm", q, k)
            kernel = torch.square(torch.relu(qk / self.sqrt_s))
            out = u * torch.einsum("...nm,...me->...ne", kernel, v)
            return self.res_scale(shortcut) + self.o(out)

    class Scale(tnn.Module):
        def __init__(self, v):
            super().__init__()
            self.scale = tnn.Parameter(torch.tensor(float(v)))

        def forward(self, x):
            return x * self.scale

    class DCC(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gau = GAU(dcc_feat)
            self.pos_enc = tnn.Parameter(torch.randn(num_kpts, gau_s))
            self.pose_to_kpts = tnn.Sequential(
                tnn.Linear(pose_vec, dcc_feat * num_kpts), tnn.BatchNorm1d(dcc_feat * num_kpts)
            )
            self.x_fc = tnn.Linear(spe_ch, dcc_feat)
            self.y_fc = tnn.Linear(spe_ch, dcc_feat)
            self.sigma_fc = tnn.Sequential(tnn.Linear(pose_vec, num_kpts), tnn.Sigmoid(), Scale(0.1))
            self.register_buffer("x_bins", torch.linspace(-0.5, 0.5, num_bins[0]))
            self.register_buffer("y_bins", torch.linspace(-0.5, 0.5, num_bins[1]))

        def spe(self, position):
            pos_dim = spe_ch // 2
            dim_t = spe_temp ** (torch.arange(pos_dim, dtype=torch.float32) / pos_dim)
            freq = position.unsqueeze(-1) / dim_t
            return torch.cat([freq.cos(), freq.sin()], -1)

        def forward_test(self, pose_feats, bbox_cs, grids):
            center, scale = bbox_cs.split(2, dim=-1)
            rel = center - grids
            x_bins = self.x_bins.view(1, -1) * scale[..., 0:1] + rel[..., 0:1]
            y_bins = self.y_bins.view(1, -1) * scale[..., 1:2] + rel[..., 1:2]
            x_enc = self.x_fc(self.spe(x_bins))
            y_enc = self.y_fc(self.spe(y_bins))
            kf = self.pose_to_kpts(pose_feats)
            kf = kf.reshape(*kf.shape[:-1], num_kpts, dcc_feat)
            kf = self.gau(kf, self.pos_enc)
            x_hms = torch.matmul(kf, x_enc.transpose(-1, -2))
            y_hms = torch.matmul(kf, y_enc.transpose(-1, -2))
            x_hms = x_hms.clamp(min=-5e4, max=5e4)
            y_hms = y_hms.clamp(min=-5e4, max=5e4)
            x_hms = (x_hms - x_hms.max(dim=-1, keepdim=True).values).exp()
            y_hms = (y_hms - y_hms.max(dim=-1, keepdim=True).values).exp()
            x_hms = x_hms / (x_hms.sum(dim=-1, keepdim=True) + 1e-8)
            y_hms = y_hms / (y_hms.sum(dim=-1, keepdim=True) + 1e-8)
            # reference decodes with ABSOLUTE bins (center, not center - grid)
            ax_bins = self.x_bins.view(1, -1) * scale[..., 0:1] + center[..., 0:1]
            ay_bins = self.y_bins.view(1, -1) * scale[..., 1:2] + center[..., 1:2]
            x = (x_hms * ax_bins.unsqueeze(1)).sum(dim=-1)
            y = (y_hms * ay_bins.unsqueeze(1)).sum(dim=-1)
            sigmas = self.sigma_fc(pose_feats)
            return torch.stack((x, y), dim=-1), sigmas

    class Head(tnn.Module):
        def __init__(self):
            super().__init__()
            self.head_module = HeadModule()
            self.dcc = DCC()

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.head = Head()

    return Model()


def test_rtmo_head_conversion_forward_parity():
    """Reference-layout torch RTMOHead (module towers + DCC) -> flax parity."""
    from probpose_code_tpu.engine.checkpoint import _t, convert_torch_rtmo_head
    from probpose_code_tpu.models.heads.rtmo_head import DCC, RTMOHeadModule

    torch.manual_seed(7)
    tm = _build_torch_rtmo_head()
    rng = np.random.RandomState(7)
    feats = [rng.rand(2, 64, s, s).astype(np.float32) for s in (8, 4)]
    pose_feats = rng.rand(6, 32).astype(np.float32)
    bbox_cs = np.concatenate([rng.rand(6, 2) * 32, 5 + rng.rand(6, 2) * 40], -1).astype(np.float32)
    grids = (rng.rand(6, 2) * 32).astype(np.float32)

    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm.head.head_module([torch.from_numpy(f) for f in feats])
            tm.head.dcc.forward_test(torch.from_numpy(pose_feats), torch.from_numpy(bbox_cs),
                                     torch.from_numpy(grids))
        tm.eval()
        level_outs = tm.head.head_module([torch.from_numpy(f) for f in feats])
        ref_kpts, ref_sigmas = tm.head.dcc.forward_test(
            torch.from_numpy(pose_feats), torch.from_numpy(bbox_cs), torch.from_numpy(grids))

    def flat(field):
        return np.concatenate(
            [level_outs[i][field].numpy().transpose(0, 2, 3, 1).reshape(2, -1, level_outs[i][field].shape[1])
             for i in range(2)], axis=1)

    sd = {k: _t(v) for k, v in tm.state_dict().items()}
    head_p, head_s = convert_torch_rtmo_head(sd)

    fm = RTMOHeadModule(num_keypoints=5, in_channels=64, widen_factor=0.5, cls_feat_channels=32,
                        num_groups=4, channels_per_group=12, pose_vec_channels=32,
                        featmap_strides=(16, 32))
    xs = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats)
    init_vars = fm.init(jax.random.PRNGKey(0), xs, train=False)
    init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(head_p["head_module"])[0]}
    assert init_paths == conv_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:6]} extra: {sorted(conv_paths - init_paths)[:6]}"
    )
    out = fm.apply({"params": head_p["head_module"], "batch_stats": head_s["head_module"]}, xs, train=False)
    np.testing.assert_allclose(np.asarray(out["cls_scores"]), flat(0), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["bbox_preds"]), flat(1), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["kpt_offsets"]).reshape(2, -1, 10), flat(2), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["kpt_vis"]), flat(3), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["pose_vecs"]), flat(4), atol=5e-4)

    fd = DCC(in_channels=32, num_keypoints=5, feat_channels=16, num_bins=(8, 10),
             spe_channels=12, spe_temperature=300.0, gau_s=8)
    dcc_init = fd.init(jax.random.PRNGKey(0), jnp.asarray(pose_feats), jnp.asarray(bbox_cs),
                       jnp.asarray(grids), train=False)
    init_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(dcc_init["params"])[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(head_p["dcc"])[0]}
    assert init_paths == conv_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:6]} extra: {sorted(conv_paths - init_paths)[:6]}"
    )
    preds, _, sigmas = fd.apply(
        {"params": head_p["dcc"], "batch_stats": head_s["dcc"]},
        jnp.asarray(pose_feats), jnp.asarray(bbox_cs), jnp.asarray(grids), train=False)
    np.testing.assert_allclose(np.asarray(preds) + grids[:, None, :], ref_kpts.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sigmas), ref_sigmas.numpy(), atol=1e-5)


def test_rtmo_full_checkpoint_dispatch():
    """convert_torch_state_dict routes a combined CSPDarknet+HybridEncoder+
    RTMOHead state dict through the RTMO converter (backbone/neck/head)."""
    torch.manual_seed(1)
    sd = {}
    sd.update(_build_torch_cspdarknet().state_dict())
    sd.update(_build_torch_hybrid_encoder().state_dict())
    sd.update(_build_torch_rtmo_head().state_dict())
    out = convert_torch_state_dict({k: v.detach().numpy() for k, v in sd.items()})
    assert set(out["params"]) == {"backbone", "neck", "head"}
    assert "head_module" in out["params"]["head"] and "dcc" in out["params"]["head"]
    assert "encoder0" in out["params"]["neck"] and "proj1" in out["params"]["neck"]
    assert "pose_bn" in out["batch_stats"]["head"]["dcc"]


def _build_torch_rtmw_neck_head(in_chs=(32, 64), K=6, hidden=32, s=16, csp_blocks=1):
    """Reference-layout CSPNeXtPAFPN (``necks/cspnext_pafpn.py:75-146``,
    out_channels=None -> no out convs) + RTMWHead (``rtmw_head.py:96-194``:
    BN+ReLU conv branches, PixelShuffle fusion, ScaleNorm+Linear MLPs, GAU)."""
    import math

    import torch.nn.functional as F

    class ConvModule(tnn.Module):  # YOLOX-style BN for the neck
        def __init__(self, cin, cout, k, stride=1, groups=1):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, groups=groups, bias=False)
            self.bn = tnn.BatchNorm2d(cout, momentum=0.03, eps=1e-3)
            self.act = tnn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class DWSep(tnn.Module):
        def __init__(self, cin, cout, k=5):
            super().__init__()
            self.depthwise_conv = ConvModule(cin, cin, k, groups=cin)
            self.pointwise_conv = ConvModule(cin, cout, 1)

        def forward(self, x):
            return self.pointwise_conv(self.depthwise_conv(x))

    class CSPNeXtBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = ConvModule(c, c, 3)
            self.conv2 = DWSep(c, c, 5)

        def forward(self, x):
            return self.conv2(self.conv1(x))  # add_identity=False in PAFPN

    class CSPLayer(tnn.Module):
        def __init__(self, cin, cout, n):
            super().__init__()
            mid = int(cout * 0.5)
            self.main_conv = ConvModule(cin, mid, 1)
            self.short_conv = ConvModule(cin, mid, 1)
            self.final_conv = ConvModule(2 * mid, cout, 1)
            self.blocks = tnn.Sequential(*[CSPNeXtBlock(mid) for _ in range(n)])

        def forward(self, x):
            return self.final_conv(torch.cat([self.blocks(self.main_conv(x)), self.short_conv(x)], 1))

    class Neck(tnn.Module):
        def __init__(self):
            super().__init__()
            self.reduce_layers = tnn.ModuleList([ConvModule(in_chs[1], in_chs[0], 1)])
            self.top_down_blocks = tnn.ModuleList([CSPLayer(in_chs[0] * 2, in_chs[0], csp_blocks)])
            self.downsamples = tnn.ModuleList([ConvModule(in_chs[0], in_chs[0], 3, 2)])
            self.bottom_up_blocks = tnn.ModuleList([CSPLayer(in_chs[0] * 2, in_chs[1], csp_blocks)])

        def forward(self, feats):
            high = self.reduce_layers[0](feats[1])
            up = F.interpolate(high, scale_factor=2.0, mode="nearest")
            low = self.top_down_blocks[0](torch.cat([up, feats[0]], 1))
            down = self.downsamples[0](low)
            out_high = self.bottom_up_blocks[0](torch.cat([down, high], 1))
            return low, out_high

    class HeadConv(tnn.Module):  # rtmw_head ConvModule: default-eps BN + ReLU
        def __init__(self, cin, cout, k):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, 1, k // 2, bias=False)
            self.bn = tnn.BatchNorm2d(cout)
            self.act = tnn.ReLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class ScaleNorm(tnn.Module):
        def __init__(self, dim, eps=1e-5):
            super().__init__()
            self.scale = dim ** -0.5
            self.eps = eps
            self.g = tnn.Parameter(torch.ones(1))

        def forward(self, x):
            norm = torch.norm(x, dim=-1, keepdim=True) * self.scale
            return x / norm.clamp(min=self.eps) * self.g

    class GAU(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            e = dim * 2
            self.e, self.s = e, s
            self.ln = ScaleNorm(dim)
            self.uv = tnn.Linear(dim, 2 * e + s, bias=False)
            self.gamma = tnn.Parameter(torch.rand(2, s))
            self.beta = tnn.Parameter(torch.rand(2, s))
            self.o = tnn.Linear(e, dim, bias=False)

            class Scale(tnn.Module):
                def __init__(self, d):
                    super().__init__()
                    self.scale = tnn.Parameter(torch.ones(d))

                def forward(self, x):
                    return x * self.scale

            self.res_scale = Scale(dim)
            self.sqrt_s = math.sqrt(s)

        def forward(self, x):
            shortcut = x
            h = self.ln(x)
            uv = F.silu(self.uv(h))
            u, v, base = torch.split(uv, [self.e, self.e, self.s], dim=-1)
            q = base * self.gamma[0] + self.beta[0]
            k = base * self.gamma[1] + self.beta[1]
            qk = torch.einsum("...ns,...ms->...nm", q, k)
            kernel = torch.square(torch.relu(qk / self.sqrt_s))
            out = u * torch.einsum("...nm,...me->...ne", kernel, v)
            return self.res_scale(shortcut) + self.o(out)

    C = in_chs[1]
    flat = 16  # 4x4 top featuremap

    class Head(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ps = tnn.PixelShuffle(2)
            self.conv_dec = HeadConv(C // 4, C // 4, 1)
            self.final_layer = HeadConv(C, K, 1)
            self.final_layer2 = HeadConv(C // 2 + C // 4, K, 1)
            self.mlp = tnn.Sequential(ScaleNorm(flat), tnn.Linear(flat, hidden // 2, bias=False))
            self.mlp2 = tnn.Sequential(ScaleNorm(flat * 4), tnn.Linear(flat * 4, hidden // 2, bias=False))
            self.gau = GAU(hidden)
            self.cls_x = tnn.Linear(hidden, 128, bias=False)
            self.cls_y = tnn.Linear(hidden, 128, bias=False)

        def forward(self, feats):
            enc_b, enc_t = feats
            ft = self.mlp(torch.flatten(self.final_layer(enc_t), 2))
            dec = self.conv_dec(self.ps(enc_t))
            fb = self.mlp2(torch.flatten(self.final_layer2(torch.cat([dec, enc_b], 1)), 2))
            tokens = self.gau(torch.cat([ft, fb], dim=2))
            return self.cls_x(tokens), self.cls_y(tokens)

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.neck = Neck()
            self.head = Head()

        def forward(self, feats):
            return self.head(self.neck(feats))

    return Model()


def test_rtmw_neck_head_conversion_forward_parity():
    """Reference-layout CSPNeXtPAFPN + RTMWHead -> flax parity (pixel-shuffle
    channel order, BN+ReLU head convs, two-level token fusion)."""
    from probpose_code_tpu.engine.checkpoint import (
        _convert_rtmw_head,
        _t,
        convert_torch_cspnext_pafpn,
    )
    from probpose_code_tpu.models.heads.rtmcc_head import RTMWHead
    from probpose_code_tpu.models.necks import CSPNeXtPAFPN

    torch.manual_seed(11)
    tm = _build_torch_rtmw_neck_head()
    rng = np.random.RandomState(11)
    feats = [rng.rand(2, c, sdim, sdim).astype(np.float32) for c, sdim in ((32, 8), (64, 4))]
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm([torch.from_numpy(f) for f in feats])
        tm.eval()
        ref_x, ref_y = tm([torch.from_numpy(f) for f in feats])

    sd = {k: _t(v) for k, v in tm.state_dict().items()}
    neck_p, neck_s = convert_torch_cspnext_pafpn(sd)
    head_p, head_s = _convert_rtmw_head(sd)

    flax_neck = CSPNeXtPAFPN(in_channels=(32, 64), out_channels=None, num_csp_blocks=1)
    flax_head = RTMWHead(in_channels=64, out_channels=6, input_size=(64, 64),
                         in_featuremap_size=(4, 4), simcc_split_ratio=2.0,
                         gau_cfg=dict(hidden_dims=32, s=16, expansion_factor=2,
                                      act_fn="SiLU", use_rel_bias=False, pos_enc=False))
    xs = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats)

    init_n = flax_neck.init(jax.random.PRNGKey(0), xs, train=False)
    ip = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_n["params"])[0]}
    cp = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(neck_p)[0]}
    assert ip == cp, f"missing: {sorted(ip - cp)[:6]} extra: {sorted(cp - ip)[:6]}"
    neck_out = flax_neck.apply({"params": neck_p, "batch_stats": neck_s}, xs, train=False)

    init_h = flax_head.init(jax.random.PRNGKey(0), neck_out, train=False)
    ip = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_h["params"])[0]}
    cp = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(head_p)[0]}
    assert ip == cp, f"missing: {sorted(ip - cp)[:6]} extra: {sorted(cp - ip)[:6]}"
    px, py = flax_head.apply({"params": head_p, "batch_stats": head_s}, neck_out, train=False)

    np.testing.assert_allclose(np.asarray(px), ref_x.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(py), ref_y.numpy(), atol=1e-3)


def _build_torch_yoloxpose_neck_head(in_chs=(16, 32, 64), out_ch=32, K=4, feat=32, stacked=2):
    """Reference-layout YOLOXPAFPN (``necks/yolox_pafpn.py:61-147``) +
    YOLOXPoseHeadModule (``yoloxpose_head.py:21-226``) with YOLOX-style BN."""
    import torch.nn.functional as F

    class ConvModule(tnn.Module):
        def __init__(self, cin, cout, k, stride=1):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
            self.bn = tnn.BatchNorm2d(cout, momentum=0.03, eps=1e-3)
            self.act = tnn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class Bottleneck(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = ConvModule(c, c, 1)
            self.conv2 = ConvModule(c, c, 3)

        def forward(self, x):
            return self.conv2(self.conv1(x))  # add_identity=False

    class CSPLayer(tnn.Module):
        def __init__(self, cin, cout, n=1):
            super().__init__()
            mid = cout // 2
            self.main_conv = ConvModule(cin, mid, 1)
            self.short_conv = ConvModule(cin, mid, 1)
            self.final_conv = ConvModule(2 * mid, cout, 1)
            self.blocks = tnn.Sequential(*[Bottleneck(mid) for _ in range(n)])

        def forward(self, x):
            return self.final_conv(torch.cat([self.blocks(self.main_conv(x)), self.short_conv(x)], 1))

    class Neck(tnn.Module):
        def __init__(self):
            super().__init__()
            n = len(in_chs)
            self.reduce_layers = tnn.ModuleList(
                ConvModule(in_chs[idx], in_chs[idx - 1], 1) for idx in range(n - 1, 0, -1))
            self.top_down_blocks = tnn.ModuleList(
                CSPLayer(in_chs[idx - 1] * 2, in_chs[idx - 1]) for idx in range(n - 1, 0, -1))
            self.downsamples = tnn.ModuleList(
                ConvModule(in_chs[k], in_chs[k], 3, 2) for k in range(n - 1))
            self.bottom_up_blocks = tnn.ModuleList(
                CSPLayer(in_chs[k] * 2, in_chs[k + 1]) for k in range(n - 1))
            self.out_convs = tnn.ModuleList(ConvModule(c, out_ch, 1) for c in in_chs)

        def forward(self, feats):
            n = len(feats)
            inner = [feats[-1]]
            for j, idx in enumerate(range(n - 1, 0, -1)):
                high = self.reduce_layers[j](inner[0])
                inner[0] = high
                up = F.interpolate(high, scale_factor=2.0, mode="nearest")
                inner.insert(0, self.top_down_blocks[j](torch.cat([up, feats[idx - 1]], 1)))
            outs = [inner[0]]
            for k in range(n - 1):
                down = self.downsamples[k](outs[-1])
                outs.append(self.bottom_up_blocks[k](torch.cat([down, inner[k + 1]], 1)))
            return [self.out_convs[i](o) for i, o in enumerate(outs)]

    class HeadModule(tnn.Module):
        def __init__(self, n_levels=3):
            super().__init__()

            def tower(depth):
                return tnn.ModuleList(
                    tnn.Sequential(*[ConvModule(out_ch if j == 0 else feat, feat, 3) for j in range(depth)])
                    for _ in range(n_levels)
                )

            self.conv_cls = tower(stacked)
            self.conv_reg = tower(stacked)
            self.conv_pose = tower(stacked * 2)
            self.out_cls = tnn.ModuleList(tnn.Conv2d(feat, 1, 1) for _ in range(n_levels))
            self.out_obj = tnn.ModuleList(tnn.Conv2d(feat, 1, 1) for _ in range(n_levels))
            self.out_bbox = tnn.ModuleList(tnn.Conv2d(feat, 4, 1) for _ in range(n_levels))
            self.out_kpt = tnn.ModuleList(tnn.Conv2d(feat, K * 2, 1) for _ in range(n_levels))
            self.out_kpt_vis = tnn.ModuleList(tnn.Conv2d(feat, K, 1) for _ in range(n_levels))

        def forward(self, feats):
            out = []
            for i, x in enumerate(feats):
                cf = self.conv_cls[i](x)
                rf = self.conv_reg[i](x)
                pf = self.conv_pose[i](x)
                out.append((self.out_cls[i](cf), self.out_obj[i](rf), self.out_bbox[i](rf),
                            self.out_kpt[i](pf), self.out_kpt_vis[i](pf)))
            return out

    class Head(tnn.Module):
        def __init__(self):
            super().__init__()
            self.head_module = HeadModule()

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.neck = Neck()
            self.head = Head()

        def forward(self, feats):
            return self.head.head_module(self.neck(feats))

    return Model()


def test_yoloxpose_neck_head_conversion_forward_parity():
    """Reference-layout YOLOXPAFPN + YOLOXPose head module -> flax parity."""
    from probpose_code_tpu.engine.checkpoint import (
        _t,
        convert_torch_yolox_pafpn,
        convert_torch_yoloxpose_head,
    )
    from probpose_code_tpu.models.heads.yoloxpose_head import YOLOXPoseHeadModule
    from probpose_code_tpu.models.necks.hybrid_encoder import YOLOXPAFPN

    torch.manual_seed(13)
    tm = _build_torch_yoloxpose_neck_head()
    rng = np.random.RandomState(13)
    feats = [rng.rand(2, c, sdim, sdim).astype(np.float32)
             for c, sdim in ((16, 16), (32, 8), (64, 4))]
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm([torch.from_numpy(f) for f in feats])
        tm.eval()
        neck_ref = tm.neck([torch.from_numpy(f) for f in feats])
        level_outs = tm.head.head_module(neck_ref)

    sd = {k: _t(v) for k, v in tm.state_dict().items()}
    neck_p, neck_s = convert_torch_yolox_pafpn(sd)
    head_conv = convert_torch_yoloxpose_head(sd)

    flax_neck = YOLOXPAFPN(in_channels=(16, 32, 64), out_channels=32, num_csp_blocks=1)
    xs = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats)
    init_n = flax_neck.init(jax.random.PRNGKey(0), xs, train=False)
    ip = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_n["params"])[0]}
    cp = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(neck_p)[0]}
    assert ip == cp, f"missing: {sorted(ip - cp)[:6]} extra: {sorted(cp - ip)[:6]}"
    neck_out = flax_neck.apply({"params": neck_p, "batch_stats": neck_s}, xs, train=False)
    for o, r in zip(neck_out, neck_ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy().transpose(0, 2, 3, 1), atol=1e-3)

    fm = YOLOXPoseHeadModule(num_keypoints=4, in_channels=32, feat_channels=32,
                             stacked_convs=2, featmap_strides=(8, 16, 32))
    init_h = fm.init(jax.random.PRNGKey(0), neck_out, train=False)
    ip = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(init_h["params"])[0]}
    cp = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(head_conv[0]["head_module"])[0]}
    assert ip == cp, f"missing: {sorted(ip - cp)[:6]} extra: {sorted(cp - ip)[:6]}"
    out = fm.apply({"params": head_conv[0]["head_module"], "batch_stats": head_conv[1]["head_module"]},
                   neck_out, train=False)

    def flat(field, ch):
        return np.concatenate(
            [level_outs[i][field].numpy().transpose(0, 2, 3, 1).reshape(2, -1, ch) for i in range(3)], axis=1)

    np.testing.assert_allclose(np.asarray(out["cls_scores"]), flat(0, 1), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["objectness"]), flat(1, 1), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["bbox_preds"]), flat(2, 4), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["kpt_offsets"]).reshape(2, -1, 8), flat(3, 8), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["kpt_vis"]), flat(4, 4), atol=5e-4)
