"""Child process for the 2-process x 4-device multi-host dryrun test.

Launched by ``test_multihost.py`` with ``argv = [rank, coordinator_port]``.
Prints one JSON line of results for the parent to assert on.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
port = int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from probpose_code_tpu.datasets.loader import DataLoader  # noqa: E402
from probpose_code_tpu.parallel import make_mesh, shard_batch  # noqa: E402
from probpose_code_tpu.utils.misc import all_gather_object  # noqa: E402

out = {
    "rank": rank,
    "process_count": jax.process_count(),
    "n_global_devices": len(jax.devices()),
    "n_local_devices": len(jax.local_devices()),
}


class _IndexDataset:
    """Dataset of marker samples to verify the distributed partition."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i], np.int64)}


def _collate(samples):
    return {"idx": np.stack([s["idx"] for s in samples])}


loader = DataLoader(
    _IndexDataset(64), batch_size=4, shuffle=True, drop_last=True,
    num_workers=1, collate_fn=_collate,
)
local_indices = []
for batch in loader:
    local_indices.extend(int(v) for v in batch["idx"].reshape(-1))
out["n_local_samples"] = len(local_indices)
gathered = all_gather_object(local_indices)
all_indices = sorted(i for rank_idx in gathered for i in rank_idx)
out["global_coverage_ok"] = all_indices == sorted(range(64))

# global batch assembly + a sharded computation over the full 8-device mesh
mesh = make_mesh()  # all 8 global devices on the data axis
out["mesh_data_size"] = mesh.shape["data"]
local_batch = {"x": np.full((4, 3), rank + 1.0, np.float32)}
global_batch = shard_batch(local_batch, mesh)
out["global_batch_shape"] = list(global_batch["x"].shape)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

total = jax.jit(
    lambda b: b["x"].sum(), out_shardings=NamedSharding(mesh, P())
)(global_batch)
out["global_sum"] = float(total)  # expect 4*3*1 + 4*3*2 = 36

# one sharded train step of a real (tiny) model through the same path
from probpose_code_tpu.models import PoseModel  # noqa: E402
from probpose_code_tpu.parallel import create_train_state, make_train_step  # noqa: E402

model_cfg = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(mean=[127.5] * 3, std=[57.0] * 3, bgr_to_rgb=True),
    backbone=dict(
        type="VisionTransformer",
        arch=dict(embed_dims=32, num_layers=2, num_heads=2, feedforward_channels=64),
        img_size=(256, 192), patch_size=16, with_cls_token=False, out_type="featmap",
        patch_padding=2, qkv_bias=True,
    ),
    head=dict(
        type="ProbMapHead", in_channels=32, out_channels=17,
        deconv_out_channels=(32, 32), deconv_kernel_sizes=(4, 4),
        keypoint_loss=dict(type="OKSHeatmapLoss", use_target_weight=True),
        probability_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        visibility_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        oks_loss=dict(type="MSELoss", use_target_weight=True),
        error_loss=dict(type="L1LogLoss", use_target_weight=True),
        freeze_error=True, freeze_oks=False,
        decoder=dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1),
    ),
    test_cfg=dict(flip_test=False),
)
model = PoseModel(model_cfg)
model.init()
import optax  # noqa: E402

tx = optax.adamw(1e-4)
state = create_train_state(model.variables, tx)
step = make_train_step(model, tx, mesh=mesh)

rng = np.random.RandomState(rank)
K = 17
local = dict(
    inputs=(rng.rand(4, 256, 192, 3) * 255).astype(np.float32),
    heatmaps=rng.rand(4, K, 64, 48).astype(np.float32),
    keypoint_weights=np.ones((4, K), np.float32),
    in_image=np.ones((4, K), np.float32),
    annotated=np.ones((4, K), np.float32),
    keypoints_visibility=(rng.rand(4, K) > 0.5).astype(np.float32),
)
db = shard_batch(local, mesh)
state, metrics = step(state, db, jax.random.PRNGKey(0))
out["train_loss"] = float(metrics["loss"])
out["train_loss_finite"] = bool(np.isfinite(out["train_loss"]))

print("MHRESULT " + json.dumps(out), flush=True)
