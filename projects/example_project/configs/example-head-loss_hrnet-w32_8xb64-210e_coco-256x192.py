# Swap in the project-local head and loss; everything else inherits from the
# zoo HRNet-w32 recipe. `custom_imports` makes the registry see the project.
_base_ = ["../../../configs/body_2d_keypoint/topdown_heatmap/coco/td-hm_hrnet-w32_8xb64-210e_coco-256x192.py"]

custom_imports = dict(imports=["projects.example_project.models"])

model = dict(head=dict(type="ExampleHead", loss=dict(type="ExampleLoss", use_target_weight=True)))
