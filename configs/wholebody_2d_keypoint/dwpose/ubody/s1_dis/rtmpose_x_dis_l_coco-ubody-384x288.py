# DWPose stage-1 distillation: RTMPose-x teacher -> RTMPose-l student
# (feature MSE + SimCC logit KD). TPU-native counterpart of the reference
# config configs/wholebody_2d_keypoint/dwpose/.../s1_dis/rtmpose_x_dis_l_coco-ubody-384x288.py
_base_ = ["../../../../_base_/default_runtime.py"]

teacher_config = "configs/wholebody_2d_keypoint/rtmpose/ubody/rtmpose-x_8xb32-270e_coco-ubody-wholebody-384x288.py"
student_config = "configs/wholebody_2d_keypoint/rtmpose/ubody/rtmpose-l_8xb32-270e_coco-ubody-wholebody-384x288.py"

distiller = dict(
    type="DWPoseDistiller",
    teacher_cfg=teacher_config,
    student_cfg=student_config,
    two_dis=False,
    distill_cfg=[
        dict(methods=[dict(type="FeaLoss", name="loss_fea", student_channels=1024,
                           teacher_channels=1280, alpha_fea=0.00007)]),
        dict(methods=[dict(type="KDLoss", name="loss_logit", weight=0.1)]),
    ],
    teacher_pretrained=None,
)

train_cfg = dict(max_epochs=270, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="AdamW", lr=4e-3, weight_decay=0.05), clip_grad=dict(max_norm=1.0, norm_type=2))
