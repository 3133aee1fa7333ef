"""Torch oracle model for the e2e parity fixtures (shared by generator + tests).

A ProbPose graph built with the REFERENCE's exact layer layout and
state-dict naming (mmpretrain VisionTransformer + ProbMapHead 5 branches,
see /root/reference/mmpose/models/heads/hybrid_heads/probmap_head.py:197-410)
— in two geometries:

- tiny (embed 64 / 2 layers / deconv 32): weights shipped as
  ``tests/golden/e2e_weights.pth``;
- full (embed 384 / 12 layers / deconv 256 — the real ProbPose-S geometry):
  ~98 MB of weights are NOT committed; :func:`build_e2e_model` regenerates
  them deterministically from fixed seeds, and the golden fixture records
  the reference pipeline's outputs for those weights.
"""

from __future__ import annotations

import torch
import torch.nn as tnn

K = 17
INPUT_W, INPUT_H = 192, 256

TINY_ARCH = dict(dim=64, layers=2, heads=4, ffn=128, deconv=32)
FULL_ARCH = dict(dim=384, layers=12, heads=12, ffn=1536, deconv=256)


def torch_sparsemax(z: torch.Tensor, dim: int = -1) -> torch.Tensor:
    """Standard sparsemax (Martins & Astudillo 2016), forward only."""
    z_sorted, _ = torch.sort(z, dim=dim, descending=True)
    n = z.shape[dim]
    rng = torch.arange(1, n + 1, device=z.device, dtype=z.dtype)
    shape = [1] * z.dim()
    shape[dim] = n
    rng = rng.reshape(shape)
    cssv = z_sorted.cumsum(dim) - 1
    support = rng * z_sorted > cssv
    k = support.sum(dim=dim, keepdim=True).clamp(min=1)
    tau = cssv.gather(dim, k.long() - 1) / k
    return torch.clamp(z - tau, min=0)


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

    def forward(self, x):
        B, N, C = x.shape
        h = self.ln1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("bqhd,bkhd->bhqk", q * (C // self.heads) ** -0.5, k).softmax(dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, C)
        x = x + self.attn.proj(o)
        h = self.ln2(x)
        return x + self.ffn.layers[1](tnn.functional.gelu(self.ffn.layers[0][0](h)))


def _tower(dim, out, last):
    """Scalar branch: (conv3x3+BN+pool+ReLU)x3 + 1x1 conv + sigmoid/relu.

    Mirrors probmap_head.py:_build_probability_head:261 etc."""
    layers = []
    for pool in [(4, 3), (2, 2), (2, 2)]:
        layers += [
            tnn.Conv2d(dim, dim, 3, stride=1, padding=1),
            tnn.BatchNorm2d(dim),
            tnn.MaxPool2d(pool, stride=pool),
            tnn.ReLU(inplace=True),
        ]
    layers += [tnn.Conv2d(dim, out, 1), last]
    return tnn.Sequential(*layers)


class TorchTinyProbPose(tnn.Module):
    """ProbPose graph: ViT + ProbMapHead 5 branches, reference layout."""

    def __init__(self, dim=64, layers=2, heads=4, ffn=128, deconv=32):
        super().__init__()
        self.dim = dim
        self.backbone = tnn.Module()
        self.backbone.patch_embed = tnn.Module()
        self.backbone.patch_embed.projection = tnn.Conv2d(3, dim, 16, stride=16, padding=2)
        self.backbone.pos_embed = tnn.Parameter(torch.randn(1, 16 * 12, dim) * 0.02)
        self.backbone.layers = tnn.ModuleList([TorchViTBlock(dim, heads, ffn) for _ in range(layers)])
        self.backbone.ln1 = tnn.LayerNorm(dim, eps=1e-6)

        self.head = tnn.Module()
        self.head.deconv_layers = tnn.Sequential(
            tnn.ConvTranspose2d(dim, deconv, 4, stride=2, padding=1, bias=False),
            tnn.BatchNorm2d(deconv),
            tnn.ReLU(inplace=True),
            tnn.ConvTranspose2d(deconv, deconv, 4, stride=2, padding=1, bias=False),
            tnn.BatchNorm2d(deconv),
            tnn.ReLU(inplace=True),
        )
        self.head.final_layer = tnn.Conv2d(deconv, K, 1)
        self.head.probability_layers = _tower(dim, K, tnn.Sigmoid())
        self.head.visibility_layers = _tower(dim, K, tnn.Sigmoid())
        self.head.oks_layers = _tower(dim, K, tnn.Sigmoid())
        self.head.error_layers = _tower(dim, K, tnn.ReLU(inplace=True))
        self.temperature = 0.5  # probmap_head.py:135

    def backbone_forward(self, x):
        f = self.backbone.patch_embed.projection(x)  # (B, C, 16, 12)
        B, C, H, W = f.shape
        f = f.flatten(2).transpose(1, 2) + self.backbone.pos_embed
        for blk in self.backbone.layers:
            f = blk(f)
        f = self.backbone.ln1(f)
        return f.transpose(1, 2).reshape(B, C, H, W)  # out_type='featmap'

    def forward(self, x):
        feat = self.backbone_forward(x)
        hm = self.head.final_layer(self.head.deconv_layers(feat))
        B, C, H, W = hm.shape
        hm = torch_sparsemax(hm.reshape(B, C, H * W) / self.temperature, dim=2)
        hm = torch.clamp(hm, 0, 1).reshape(B, C, H, W)  # normalize=1.0
        prob = self.head.probability_layers(feat).reshape(B, C)
        vis = self.head.visibility_layers(feat).reshape(B, C)
        oks = self.head.oks_layers(feat).reshape(B, C)
        err = self.head.error_layers(feat).reshape(B, C)
        return hm, prob, vis, oks, err


def build_e2e_model(full: bool = False) -> TorchTinyProbPose:
    """Deterministically construct the oracle model (seed 7) with the
    widened scalar towers and populated BN running stats the fixtures use.

    The full-geometry weights are reproduced from the seed instead of being
    shipped (98 MB); the tiny ones are additionally saved as
    ``e2e_weights.pth`` by the generator for the original fixture."""
    torch.manual_seed(7)
    model = TorchTinyProbPose(**(FULL_ARCH if full else TINY_ARCH))
    # widen the scalar-tower logit range so sigmoid outputs span (0, 1) —
    # an untrained tower is near-constant, which would degenerate the
    # prob-threshold learning and the score/NMS paths the fixture exercises
    with torch.no_grad():
        for tower in (
            model.head.probability_layers,
            model.head.visibility_layers,
            model.head.oks_layers,
            model.head.error_layers,
        ):
            tower[-2].weight *= 12.0
            tower[-2].bias.normal_(0.0, 1.0)
    # populate BN running stats with a few train-mode passes
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(torch.randn(4, 3, INPUT_H, INPUT_W) * 0.7)
    model.eval()
    return model
