# UniFormer-S 256x192 (reference projects/uniformer config of the same name).
_base_ = ["./td-hm_uniformer-b-8xb128-210e_coco-256x192.py"]
auto_scale_lr = dict(base_batch_size=1024)
model = dict(backbone=dict(depths=[3, 4, 8, 3], drop_path_rate=0.2))
train_dataloader = dict(batch_size=32)
val_dataloader = dict(batch_size=256)
