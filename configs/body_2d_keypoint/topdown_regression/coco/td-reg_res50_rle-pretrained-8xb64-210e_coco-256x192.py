# RLE with the backbone initialized from the plain-regression checkpoint.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./td-reg_res50_rle-8xb64-210e_coco-256x192.py"]

model = dict(
    backbone=dict(
        init_cfg=dict(
            type="Pretrained",
            prefix="backbone.",
            checkpoint="https://download.openmmlab.com/mmpose/"
            "top_down/resnet/res50_coco_256x192-ec54d7f3_20200709.pth",
        ),
    ),
)
