# Pose Anything (PAM) few-shot keypoint detection on MP-100, split 1.
# TPU-native counterpart of the reference project recipe
# /root/reference/projects/pose_anything (graph transformer + shared encoder).
custom_imports = dict(imports=["projects.pose_anything.models", "projects.pose_anything.datasets"])

train_cfg = dict(max_epochs=200, val_interval=10)

optim_wrapper = dict(optimizer=dict(type="AdamW", lr=1e-4, weight_decay=1e-4))

param_scheduler = [
    dict(type="LinearLR", begin=0, end=500, start_factor=0.001, by_epoch=False),
    dict(type="MultiStepLR", begin=0, end=200, milestones=[160, 180], gamma=0.1, by_epoch=True),
]

model = dict(
    type="PoseAnythingModel",
    backbone=dict(type="ResNet", depth=50, out_indices=(3,)),
    head=dict(
        type="GraphTransformerHead",
        in_channels=2048,
        embed_dims=256,
        num_layers=3,
        num_heads=8,
    ),
)

data_root = "data/mp100/"
train_dataloader = dict(
    batch_size=16,
    num_workers=4,
    dataset=dict(
        type="FewShotKeypointDataset",
        ann_file=data_root + "annotations/mp100_split1_train.json",
        img_dir=data_root + "images/",
        img_size=(256, 256),
        num_episodes=16000,
    ),
)
val_dataloader = dict(
    batch_size=16,
    num_workers=4,
    dataset=dict(
        type="FewShotKeypointDataset",
        ann_file=data_root + "annotations/mp100_split1_val.json",
        img_dir=data_root + "images/",
        img_size=(256, 256),
        num_episodes=2000,
    ),
)
