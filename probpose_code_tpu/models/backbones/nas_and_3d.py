"""ViPNAS backbones, V2VNet (3D voxels), HRFormer.

Behavioral parity targets:
- ViPNAS_ResNet: reference ``vipnas_resnet.py:340-595`` — NAS-searched
  ResNet (per-stage width/depth/kernel/group/attention)
- ViPNAS_MobileNetV3: reference ``vipnas_mbv3.py:15-175`` — NAS-searched
  inverted residual stack
- V2VNet: reference ``v2v_net.py:17-273`` — 3D conv encoder-decoder over
  voxel grids (NDHWC here)
- HRFormer: reference ``hrformer.py:57-745`` — HRNet topology whose
  high-resolution branches use local-window self-attention blocks
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS
from .classic import SELayer
from .multistage import ConvBNReLU
from .resnet import _bn
from .transformers import Mlp, WindowAttention, window_partition, window_reverse
from .litehrnet import _resize_nearest


@MODELS.register_module()
class ViPNAS_ResNet(nn.Module):
    """NAS-searched ResNet (reference ``vipnas_resnet.py:340``)."""

    depth: int = 50
    out_indices: Sequence[int] = (3,)
    strides: Sequence[int] = (1, 2, 2, 2)
    wid: Sequence[int] = (48, 80, 160, 304, 608)
    expan: Sequence[Any] = (None, 1, 1, 1, 1)
    dep: Sequence[Any] = (None, 4, 6, 7, 3)
    ks: Sequence[int] = (7, 3, 5, 5, 5)
    group: Sequence[Any] = (None, 16, 16, 16, 16)
    att: Sequence[Any] = (None, True, False, True, True)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k0 = self.ks[0]
        x = nn.Conv(self.wid[0], (k0, k0), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = _bn(train, "stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for i in range(4):
            w, e, d, k, g, a = (self.wid[i + 1], self.expan[i + 1], self.dep[i + 1],
                                self.ks[i + 1], self.group[i + 1], self.att[i + 1])
            mid = w * e
            for b in range(d):
                stride = self.strides[i] if b == 0 else 1
                identity = x
                y = ConvBNReLU(mid, 1, dtype=self.dtype, name=f"l{i}_b{b}_conv1")(x, train=train)
                y = nn.Conv(mid, (k, k), strides=(stride, stride), padding="SAME",
                            feature_group_count=min(g, mid), use_bias=False, dtype=self.dtype,
                            name=f"l{i}_b{b}_conv2")(y)
                y = _bn(train, f"l{i}_b{b}_bn2")(y)
                y = nn.relu(y)
                y = ConvBNReLU(w, 1, act=False, dtype=self.dtype, name=f"l{i}_b{b}_conv3")(y, train=train)
                if a:
                    y = SELayer(ratio=16, dtype=self.dtype, name=f"l{i}_b{b}_att")(y)
                if stride != 1 or identity.shape[-1] != w:
                    identity = ConvBNReLU(w, 1, stride=stride, act=False, dtype=self.dtype,
                                          name=f"l{i}_b{b}_down")(identity, train=train)
                x = nn.relu(y + identity)
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
        return tuple(outs)


@MODELS.register_module()
class ViPNAS_MobileNetV3(nn.Module):
    """NAS-searched MobileNetV3 (reference ``vipnas_mbv3.py:15``)."""

    wid: Sequence[int] = (16, 16, 24, 40, 80, 112, 160)
    expan: Sequence[Any] = (None, 1, 5, 4, 5, 5, 6)
    dep: Sequence[Any] = (None, 1, 4, 4, 4, 4, 4)
    ks: Sequence[int] = (3, 3, 7, 7, 5, 7, 5)
    group: Sequence[Any] = (None, 8, 120, 20, 100, 280, 240)
    att: Sequence[Any] = (None, True, True, False, True, True, True)
    stride: Sequence[int] = (2, 1, 2, 2, 2, 1, 2)
    act: Sequence[str] = ("HSwish", "ReLU", "ReLU", "ReLU", "HSwish", "HSwish", "HSwish")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def act_fn(name):
            return (lambda v: v * jnp.clip((v + 3) / 6, 0, 1)) if name == "HSwish" else nn.relu

        k0 = self.ks[0]
        x = nn.Conv(self.wid[0], (k0, k0), strides=(self.stride[0], self.stride[0]), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = _bn(train, "stem_bn")(x)
        x = act_fn(self.act[0])(x)
        for i in range(1, len(self.wid)):
            w, e, d, k, g, a, s = (self.wid[i], self.expan[i], self.dep[i], self.ks[i],
                                   self.group[i], self.att[i], self.stride[i])
            f = act_fn(self.act[i])
            for b in range(d):
                stride = s if b == 0 else 1
                identity = x
                mid = w * e
                y = ConvBNReLU(mid, 1, act=False, dtype=self.dtype, name=f"l{i}_b{b}_expand")(x, train=train)
                y = f(y)
                y = nn.Conv(mid, (k, k), strides=(stride, stride), padding="SAME",
                            feature_group_count=min(g, mid), use_bias=False, dtype=self.dtype,
                            name=f"l{i}_b{b}_dw")(y)
                y = _bn(train, f"l{i}_b{b}_dw_bn")(y)
                y = f(y)
                if a:
                    y = SELayer(ratio=4, hsigmoid=True, dtype=self.dtype, name=f"l{i}_b{b}_se")(y)
                y = ConvBNReLU(w, 1, act=False, dtype=self.dtype, name=f"l{i}_b{b}_project")(y, train=train)
                x = y + identity if (stride == 1 and identity.shape[-1] == w) else y
        return (x.astype(jnp.float32),)


class Res3DBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.channels, (3, 3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _bn(train, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn(train, "bn2")(y)
        identity = x
        if x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1, 1), use_bias=False, dtype=self.dtype, name="skip_conv")(x)
            identity = _bn(train, "skip_bn")(identity)
        return nn.relu(y + identity)


@MODELS.register_module()
class V2VNet(nn.Module):
    """Voxel-to-voxel 3D network (reference ``v2v_net.py:230-273``).

    Input (B, D, H, W, C) voxel grid; output feature volume at the same
    resolution with ``mid_channels`` channels.
    """

    input_channels: int = 17
    output_channels: int = 17
    mid_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def basic(z, c, k, name):
            z = nn.Conv(c, (k, k, k), padding="SAME", use_bias=False, dtype=self.dtype, name=f"{name}_conv")(z)
            z = _bn(train, f"{name}_bn")(z)
            return nn.relu(z)

        x = basic(x, self.mid_channels // 2, 7, "front1")
        x = Res3DBlock(self.mid_channels, dtype=self.dtype, name="front2")(x, train=train)

        # encoder-decoder with skips (reference :177-225)
        skip1 = Res3DBlock(self.mid_channels, dtype=self.dtype, name="skip1")(x, train=train)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = Res3DBlock(self.mid_channels * 2, dtype=self.dtype, name="enc1")(x, train=train)
        skip2 = Res3DBlock(self.mid_channels * 2, dtype=self.dtype, name="skip2")(x, train=train)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = Res3DBlock(self.mid_channels * 4, dtype=self.dtype, name="enc2")(x, train=train)
        x = Res3DBlock(self.mid_channels * 4, dtype=self.dtype, name="mid")(x, train=train)
        x = Res3DBlock(self.mid_channels * 4, dtype=self.dtype, name="dec2")(x, train=train)
        x = nn.ConvTranspose(self.mid_channels * 2, (2, 2, 2), strides=(2, 2, 2), use_bias=False,
                             dtype=self.dtype, name="up2")(x)
        x = nn.relu(_bn(train, "up2_bn")(x)) + skip2
        x = Res3DBlock(self.mid_channels * 2, dtype=self.dtype, name="dec1")(x, train=train)
        x = nn.ConvTranspose(self.mid_channels, (2, 2, 2), strides=(2, 2, 2), use_bias=False,
                             dtype=self.dtype, name="up1")(x)
        x = nn.relu(_bn(train, "up1_bn")(x)) + skip1

        x = basic(x, self.mid_channels, 1, "back1")
        x = basic(x, self.mid_channels, 1, "back2")
        return (x.astype(jnp.float32),)


class HRFormerBlock(nn.Module):
    """Local-window self-attention + conv-FFN (reference ``hrformer.py:304``)."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        y = nn.LayerNorm(name="norm1")(x)
        pad_b, pad_r = (ws - H % ws) % ws, (ws - W % ws) % ws
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        wins = window_partition(y, ws)
        wins = WindowAttention(C, self.num_heads, ws, dtype=self.dtype, name="attn")(wins)
        y = window_reverse(wins, ws, H + pad_b, W + pad_r)[:, :H, :W]
        x = x + y
        # conv-FFN: pw -> dw 3x3 -> pw (reference FFN with depthwise conv)
        y = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="ffn1")(y)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(h.shape[-1], (3, 3), padding="SAME", feature_group_count=h.shape[-1],
                    dtype=self.dtype, name="ffn_dw")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="ffn2")(h)
        return x + h


@MODELS.register_module()
class HRFormer(nn.Module):
    """HRNet topology with transformer branches (reference ``hrformer.py``).

    Stage 1 is a convolutional bottleneck stem; later stages run
    HRFormerBlocks per branch with HRNet-style multi-scale fusion.
    """

    base_channels: int = 32
    num_heads: Sequence[int] = (1, 2, 4, 8)
    depths: Sequence[int] = (2, 2, 2)  # blocks per module for stages 2-4
    num_modules: Sequence[int] = (1, 1, 1)
    window_size: int = 7
    multiscale_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .resnet import ResBottleneck

        # stem: two stride-2 convs + bottleneck stage (stride 4)
        x = ConvBNReLU(64, 3, stride=2, dtype=self.dtype, name="stem1")(x, train=train)
        x = ConvBNReLU(64, 3, stride=2, dtype=self.dtype, name="stem2")(x, train=train)
        for b in range(2):
            x = ResBottleneck(16, dtype=self.dtype, name=f"layer1_b{b}")(x, train=train)
        c = self.base_channels
        chans = [c, 2 * c, 4 * c, 8 * c]
        branches = [ConvBNReLU(chans[0], 3, dtype=self.dtype, name="t0_b0")(x, train=train),
                    ConvBNReLU(chans[1], 3, stride=2, dtype=self.dtype, name="t0_b1")(x, train=train)]
        for stage in range(3):
            nb = stage + 2
            for m in range(self.num_modules[stage]):
                branches = [
                    branch if branch.shape[-1] == chans[j] else
                    ConvBNReLU(chans[j], 1, dtype=self.dtype, name=f"s{stage}_m{m}_proj{j}")(branch, train=train)
                    for j, branch in enumerate(branches)
                ]
                new_branches = []
                for j, branch in enumerate(branches):
                    y = branch
                    for b in range(self.depths[stage]):
                        y = HRFormerBlock(chans[j], self.num_heads[j], self.window_size,
                                          dtype=self.dtype, name=f"s{stage}_m{m}_br{j}_blk{b}")(y, train=train)
                    new_branches.append(y)
                # HRNet-style fuse
                fused = []
                for a in range(nb):
                    acc = new_branches[a]
                    for bidx in range(nb):
                        if bidx == a:
                            continue
                        src = new_branches[bidx]
                        if bidx > a:
                            src = ConvBNReLU(chans[a], 1, act=False, dtype=self.dtype,
                                             name=f"s{stage}_m{m}_f{a}_{bidx}")(src, train=train)
                            src = _resize_nearest(src, acc.shape[1], acc.shape[2])
                        else:
                            for step in range(a - bidx):
                                out_c = chans[a] if step == a - bidx - 1 else src.shape[-1]
                                src = ConvBNReLU(out_c, 3, stride=2,
                                                 act=(step != a - bidx - 1), dtype=self.dtype,
                                                 name=f"s{stage}_m{m}_f{a}_{bidx}_d{step}")(src, train=train)
                        acc = acc + src
                    fused.append(nn.relu(acc))
                branches = fused
            if stage < 2:  # add a new branch
                branches.append(
                    ConvBNReLU(chans[nb], 3, stride=2, dtype=self.dtype,
                               name=f"t{stage + 1}_new")(branches[-1], train=train)
                )
        if self.multiscale_output:
            return tuple(b.astype(jnp.float32) for b in branches)
        return (branches[0].astype(jnp.float32),)
