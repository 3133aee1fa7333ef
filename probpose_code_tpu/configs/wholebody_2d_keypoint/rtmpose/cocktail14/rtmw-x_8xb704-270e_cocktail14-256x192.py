# RTMW-x 256x192 (deepen 1.33 / widen 1.25).
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./rtmw-m_8xb1024-270e_cocktail14-256x192.py"]

auto_scale_lr = dict(base_batch_size=5632)

model = dict(
    backbone=dict(deepen_factor=1.33, widen_factor=1.25, out_indices=(2, 3, 4)),
    neck=dict(in_channels=[320, 640, 1280], out_indices=(1, 2)),
    head=dict(in_channels=1280),
)

train_dataloader = dict(batch_size=704)
