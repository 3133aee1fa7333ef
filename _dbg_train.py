import os, time
import numpy as np
import jax, jax.numpy as jnp
from probpose_code_tpu.config import Config
from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.engine.optim import build_optimizer
from probpose_code_tpu.models import PoseModel
from probpose_code_tpu.parallel import create_train_state, make_mesh, make_train_step, shard_batch

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

print("devices:", jax.devices())
cfg = Config.fromfile("configs/body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py")
model = PoseModel(cfg.model, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
variables = model.init()
tx, _ = build_optimizer(variables["params"], cfg.optim_wrapper, param_scheduler=cfg.param_scheduler,
                        steps_per_epoch=100, max_epochs=210)
mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
state = create_train_state(variables, tx)
train_step = make_train_step(model, tx, mesh=mesh)

B, K, H, W = 64, 17, 64, 48
rng = np.random.RandomState(0)
batch = dict(
    inputs=jnp.asarray(rng.rand(B, 256, 192, 3).astype(np.float32) * 255),
    heatmaps=jnp.asarray(rng.rand(B, K, H, W).astype(np.float32)),
    keypoint_weights=jnp.ones((B, K), jnp.float32),
    in_image=jnp.ones((B, K), jnp.float32),
    annotated=jnp.ones((B, K), jnp.float32),
    keypoints_visibility=jnp.asarray((rng.rand(B, K) > 0.5).astype(np.float32)),
)
batch = shard_batch(batch, mesh)
key = jax.random.PRNGKey(0)

t0 = time.perf_counter(); state, metrics = train_step(state, batch, key); l = float(metrics["loss"])
print(f"compile+first step: {time.perf_counter()-t0:.1f}s loss={l:.4f}")
# fixed batch (no chain): state threading already forces sequential steps
for trial in range(2):
    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = train_step(state, batch, key)
    l = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 5
    print(f"fixed-batch trial {trial}: {dt*1e3:.1f} ms/step  {B/dt:,.0f} crops/s")
for trial in range(2):
    t0 = time.perf_counter()
    for _ in range(5):
        batch = dict(batch, inputs=batch["inputs"] + metrics["loss"] * 1e-6)
        state, metrics = train_step(state, batch, key)
    l = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 5
    print(f"chained trial {trial}: {dt*1e3:.1f} ms/step  {B/dt:,.0f} crops/s")
