# RTMW-l 256x192: three-level CSPNeXt-PAFPN fusion, GAU head on 1024ch.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./rtmw-m_8xb1024-270e_cocktail14-256x192.py"]

model = dict(
    backbone=dict(deepen_factor=1.0, widen_factor=1.0, out_indices=(2, 3, 4)),
    neck=dict(in_channels=[256, 512, 1024], out_indices=(1, 2)),
    head=dict(in_channels=1024),
)
