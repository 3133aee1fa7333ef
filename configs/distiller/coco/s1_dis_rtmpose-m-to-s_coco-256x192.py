# DWPose stage-1 distillation: RTMPose-m teacher -> RTMPose-s student.
# TPU-native counterpart of the reference DWPose distillation configs.
_base_ = ["../../_base_/default_runtime.py"]

teacher_config = "configs/body_2d_keypoint/rtmpose/coco/rtmpose-m_8xb256-420e_coco-256x192.py"
student_config = "configs/body_2d_keypoint/rtmpose/coco/rtmpose-s_8xb256-420e_coco-256x192.py"

distiller = dict(
    type="DWPoseDistiller",
    teacher_cfg=teacher_config,
    student_cfg=student_config,
    two_dis=False,
    distill_cfg=[
        dict(methods=[dict(type="KDLoss", name="loss_logit", weight=0.1)]),
    ],
    teacher_pretrained=None,
)

train_cfg = dict(max_epochs=210, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="AdamW", lr=4e-3, weight_decay=0.05))
