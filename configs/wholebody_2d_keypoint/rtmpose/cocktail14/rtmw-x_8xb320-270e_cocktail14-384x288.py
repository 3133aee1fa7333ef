# RTMW-x 384x288. TPU-native counterpart of the reference config of the same name.
_base_ = ["./rtmw-l_8xb320-270e_cocktail14-384x288.py"]

model = dict(
    backbone=dict(deepen_factor=1.33, widen_factor=1.25),
    neck=dict(in_channels=[320, 640, 1280]),
    head=dict(in_channels=1280),
)
