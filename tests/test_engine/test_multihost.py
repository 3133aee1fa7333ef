"""Multi-host (2-process x 4-device) dryrun: distributed sampler partition,
``make_array_from_process_local_data`` batch assembly, cross-process result
gather, and a sharded train step over the full global mesh.

This is the CPU stand-in for a real multi-host TPU pod: two OS processes
coordinate via ``jax.distributed.initialize`` (Gloo collectives), each owning
4 virtual devices — exactly the code path a pod slice runs per host.
Reference semantics being reproduced: torch DistributedSampler + DDP +
mmengine metric ``collect_device`` (``coco_metric.py:118``).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_four_device_dryrun():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # children share the repo-local compile cache (fast re-runs)
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=570)
        assert p.returncode == 0, f"child failed:\n{stderr[-3000:]}"
        lines = [ln for ln in stdout.splitlines() if ln.startswith("MHRESULT ")]
        assert lines, f"no result line in child stdout:\n{stdout[-2000:]}\n{stderr[-2000:]}"
        outs.append(json.loads(lines[-1][len("MHRESULT "):]))

    by_rank = {o["rank"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["n_global_devices"] == 8
        assert o["n_local_devices"] == 4
        assert o["mesh_data_size"] == 8
        # loader: each process got exactly half the (padded) samples,
        # global coverage is the full index set
        assert o["n_local_samples"] == 32
        assert o["global_coverage_ok"]
        # global batch: 2 local shards of 4 -> global 8
        assert o["global_batch_shape"] == [8, 3]
        assert o["global_sum"] == pytest.approx(36.0)
        assert o["train_loss_finite"]
    # SPMD: both processes observe the identical global loss
    assert by_rank[0]["train_loss"] == pytest.approx(by_rank[1]["train_loss"], rel=1e-6)
