# Default runtime config (counterpart of reference configs/_base_/default_runtime.py)
default_scope = "probpose_code_tpu"

default_hooks = dict(
    timer=dict(type="IterTimerHook"),
    logger=dict(type="LoggerHook", interval=50),
    param_scheduler=dict(type="ParamSchedulerHook"),
    checkpoint=dict(type="CheckpointHook", interval=10),
    visualization=dict(type="PoseVisualizationHook", enable=False),
)

env_cfg = dict(mesh=dict(data=-1, model=1))  # -1: all available devices

vis_backends = [dict(type="LocalVisBackend")]
visualizer = dict(type="PoseLocalVisualizer", vis_backends=vis_backends, name="visualizer")

log_level = "INFO"
log_processor = dict(type="LogProcessor", window_size=50, by_epoch=True)
load_from = None
resume = False

custom_hooks = [
    # Synchronize model buffers such as running_mean and running_var in BN
    # at the end of each epoch
    dict(type="SyncBuffersHook")
]
