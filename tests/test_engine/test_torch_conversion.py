"""Torch -> flax checkpoint conversion parity.

Builds torch modules with the reference's exact layer layout and state-dict
naming (mmpretrain ViT blocks, SimpleBaselines deconv stack, ProbPose scalar
towers), converts their weights with ``convert_torch_state_dict``, and checks
our flax modules produce identical outputs.
"""

import numpy as np
import pytest

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
