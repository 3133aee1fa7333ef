# DWPose stage-2 (two_dis): student head retrained on frozen stage-1
# teacher features, logit KD only. TPU-native counterpart of the reference
# config configs/wholebody_2d_keypoint/dwpose/.../s2_dis/dwpose_s-ss_coco-ubody-256x192.py
_base_ = ["../../../../_base_/default_runtime.py"]

teacher_config = "configs/wholebody_2d_keypoint/rtmpose/ubody/rtmpose-s_8xb64-270e_coco-ubody-wholebody-256x192.py"
student_config = "configs/wholebody_2d_keypoint/rtmpose/ubody/rtmpose-s_8xb64-270e_coco-ubody-wholebody-256x192.py"

distiller = dict(
    type="DWPoseDistiller",
    teacher_cfg=teacher_config,
    student_cfg=student_config,
    two_dis=True,
    distill_cfg=[
        dict(methods=[dict(type="KDLoss", name="loss_logit", weight=1.0)]),
    ],
    teacher_pretrained="work_dirs/dwpose_s-ss_coco-ubody-256x192/teacher.ckpt",
)

train_cfg = dict(max_epochs=60, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="AdamW", lr=4e-3, weight_decay=0.05))
