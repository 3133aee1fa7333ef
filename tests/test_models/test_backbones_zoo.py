"""Forward-shape tests for the extended backbone zoo + multi-stage heads."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import probpose_code_tpu.models as M
from probpose_code_tpu.registry import MODELS


def _run(mod, x):
    vs = mod.init(jr.PRNGKey(0), x, train=False)
    return mod.apply(vs, x)


@pytest.mark.parametrize(
    "name,kwargs,in_hw,expect",
    [
        ("ShuffleNetV1", dict(), (64, 64), [(1, 2, 2, 960)]),
        ("ShuffleNetV2", dict(), (64, 64), [(1, 2, 2, 1024)]),
        ("MobileNetV3", dict(arch="small"), (64, 64), [(1, 2, 2, 96)]),
        ("VGG", dict(depth=11), (64, 64), [(1, 2, 2, 512)]),
        ("AlexNet", dict(), (128, 128), [(1, 3, 3, 256)]),
        ("SEResNet", dict(depth=50), (64, 64), [(1, 2, 2, 2048)]),
        ("SCNet", dict(depth=50), (128, 128), [(1, 4, 4, 2048)]),
        ("RegNet", dict(arch="regnetx_400mf"), (64, 64), [(1, 2, 2, 384)]),
    ],
)
def test_classic_backbones(name, kwargs, in_hw, expect):
    mod = MODELS.get(name)(**kwargs)
    out = _run(mod, jnp.zeros((1, *in_hw, 3)))
    shapes = [tuple(o.shape) for o in out]
    # RegNet widths come from the quantized ramp; just check count/stride
    if name == "RegNet":
        assert len(shapes) == 1 and shapes[0][1] == expect[0][1]
    else:
        assert shapes == expect


def test_hourglass():
    mod = M.HourglassNet(downsample_times=3, num_stacks=2, stage_channels=(64, 64, 96, 96),
                         stage_blocks=(1, 1, 1, 1), feat_channel=64)
    out = _run(mod, jnp.zeros((1, 128, 128, 3)))
    assert [tuple(o.shape) for o in out] == [(1, 32, 32, 64)] * 2


def test_cpm_backbone_and_head():
    bb = M.CPM(out_channels=17, num_stages=3, feat_channels=32)
    head = M.CPMHead(in_channels=17, out_channels=17, num_stages=3)
    est = M.BottomupPoseEstimator(backbone=bb, head=head)
    x = jnp.zeros((2, 128, 96, 3))
    vs = est.init(jr.PRNGKey(0), x, train=False)
    outs = est.apply(vs, x)
    assert len(outs) == 3 and outs[-1].shape == (2, 17, 16, 12)
    from probpose_code_tpu.models.heads.multistage_heads import cpm_head_loss
    from probpose_code_tpu.models.losses import KeypointMSELoss

    l = cpm_head_loss(outs, dict(heatmaps=jnp.zeros((2, 17, 16, 12))), KeypointMSELoss())
    assert np.isfinite(float(l["loss_kpt"]))


def test_mspn_rsn_and_head():
    for cls, kw in [(M.MSPN, {}), (M.RSN, dict(expand_times=4))]:
        bb = cls(unit_channels=64, num_stages=2, num_units=3, num_blocks=(1, 1, 1),
                 res_top_channels=16, **kw)
        head = M.MSPNHead(num_stages=2, num_units=3, out_shape=(32, 24), unit_channels=64,
                          out_channels=17, use_prm=True)
        est = M.BottomupPoseEstimator(backbone=bb, head=head)
        x = jnp.zeros((2, 128, 96, 3))
        vs = est.init(jr.PRNGKey(0), x, train=False)
        outs = est.apply(vs, x)
        assert len(outs) == 6 and outs[-1].shape == (2, 17, 32, 24)

    from probpose_code_tpu.models.heads.multistage_heads import mspn_head_loss
    from probpose_code_tpu.models.losses import KeypointMSELoss

    gts = [jnp.zeros((2, 17, 32, 24))] * 3
    w = jnp.ones((2, 3, 17))
    l = mspn_head_loss(outs, dict(multilevel_heatmaps=gts, multilevel_keypoint_weights=w),
                       KeypointMSELoss(use_target_weight=True), [0, 1, 2, 0, 1, 2])
    assert np.isfinite(float(l["loss_kpt"]))


def test_vipnas_head():
    vh = M.ViPNASHead(in_channels=160, out_channels=17)
    f = jnp.zeros((2, 8, 6, 160))
    vs = vh.init(jr.PRNGKey(0), (f,), train=False)
    assert tuple(vh.apply(vs, (f,)).shape) == (2, 17, 64, 48)


@pytest.mark.parametrize(
    "name,kwargs,shape",
    [
        ("SwinTransformer", dict(out_indices=(3,), depths=(2, 2, 2, 2)), (1, 112, 112, 3)),
        ("PyramidVisionTransformer", dict(num_layers=(2, 2, 2, 2)), (1, 64, 64, 3)),
        ("PyramidVisionTransformerV2", dict(embed_dims=32, num_layers=(1, 1, 1, 1)), (1, 64, 64, 3)),
        ("SEResNeXt", dict(depth=50), (1, 64, 64, 3)),
        ("LiteHRNet", dict(), (1, 128, 96, 3)),
        ("ResNeSt", dict(depth=50), (1, 64, 64, 3)),
        ("ViPNAS_ResNet", dict(depth=50), (1, 128, 96, 3)),
        ("ViPNAS_MobileNetV3", dict(), (1, 128, 96, 3)),
        ("HRFormer", dict(base_channels=32, depths=(1, 1, 1)), (1, 128, 96, 3)),
    ],
)
def test_transformer_backbones(name, kwargs, shape):
    mod = MODELS.get(name)(**kwargs)
    out = _run(mod, jnp.zeros(shape))
    assert isinstance(out, tuple) and all(np.isfinite(np.asarray(o)).all() for o in out)


def test_hourglass_ae_net():
    """Stacked AE hourglass emits (B, out_channels, 1/4 res) maps per stack
    with inter-stack remapping (reference ``hourglass_ae.py:166-184``)."""
    m = M.HourglassAENet(downsample_times=2, num_stacks=2, out_channels=34,
                         stage_channels=(32, 48, 64), feat_channels=32)
    outs = _run(m, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 16, 16, 34)
        assert np.isfinite(np.asarray(o)).all()


def test_pvtv2_stage_dims_follow_heads():
    """PVTv2 scalar embed_dims scales per-stage width by num_heads
    (reference ``pvt.py:471``)."""
    m = MODELS.get("PyramidVisionTransformerV2")(embed_dims=16, num_layers=(1, 1, 1, 1))
    outs = _run(m, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[-1] for o in outs] == [16, 32, 80, 128]
    # overlapping patch embed: stage strides 4/2/2/2
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_dstformer_and_v2v():
    out = _run(M.DSTFormer(depth=2, feat_size=64, num_heads=4, seq_len=27), jnp.zeros((2, 9, 17, 3)))
    assert out.shape == (2, 9, 17, 64)
    (vol,) = _run(M.V2VNet(input_channels=17, mid_channels=16), jnp.zeros((1, 16, 16, 16, 17)))
    assert vol.shape == (1, 16, 16, 16, 16)


def test_swin_shifted_windows_differ():
    # the shifted block must see cross-window context: compare a 2-block
    # stage (W-MSA + SW-MSA) against two unshifted blocks on a sharp input
    x = jnp.zeros((1, 56, 56, 3)).at[:, :28].set(1.0)
    m = M.SwinTransformer(depths=(2,), num_heads=(3,), out_indices=(0,))
    vs = m.init(jr.PRNGKey(0), x, train=False)
    (o,) = m.apply(vs, x)
    assert np.isfinite(np.asarray(o)).all()
