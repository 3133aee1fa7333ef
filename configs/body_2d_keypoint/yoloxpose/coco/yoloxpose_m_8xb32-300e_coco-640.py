# YOLOX-Pose m: scaled CSPDarknet/PAFPN factors over the s recipe.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./yoloxpose_s_8xb32-300e_coco-640.py"]

widen_factor = 0.75
deepen_factor = 0.67

model = dict(
    backbone=dict(deepen_factor=deepen_factor, widen_factor=widen_factor),
    neck=dict(in_channels=[192, 384, 768], out_channels=192, num_csp_blocks=round(3 * deepen_factor)),
    head=dict(head_module_cfg=dict(in_channels=192, feat_channels=192)),
)
