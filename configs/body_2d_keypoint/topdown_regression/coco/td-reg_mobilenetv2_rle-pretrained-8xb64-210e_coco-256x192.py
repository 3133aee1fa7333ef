# RLE-MobileNetV2 with ImageNet-pretrained backbone initialization.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./td-reg_mobilenetv2_rle_8xb64-210e_coco-192x256.py"]

model = dict(
    backbone=dict(
        init_cfg=dict(type="Pretrained", checkpoint="mmcls://mobilenet_v2"),
    ),
)
