"""Runner/optimizer extras: gradient accumulation, AMP surface, logging
backends, val flip-TTA override (VERDICT r2 weak #7)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from probpose_code_tpu.engine.optim import build_optimizer  # noqa: E402


def _params():
    return {"w": jnp.ones((4,), jnp.float32)}


def test_gradient_accumulation_matches_big_batch():
    """accumulative_counts=k applies the mean of k gradients once per k
    steps (mmengine OptimWrapper semantics)."""
    params = _params()
    tx_accum, _ = build_optimizer(
        params,
        dict(optimizer=dict(type="SGD", lr=0.1, momentum=0.0), accumulative_counts=2),
    )
    state = tx_accum.init(params)
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0, 4.0])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0, 0.0])}

    p = params
    for g in (g1, g2):
        updates, state = tx_accum.update(g, state, p)
        p = optax.apply_updates(p, updates)

    tx_plain, _ = build_optimizer(params, dict(optimizer=dict(type="SGD", lr=0.1, momentum=0.0)))
    s2 = tx_plain.init(params)
    mean_g = {"w": (g1["w"] + g2["w"]) / 2}
    updates, _ = tx_plain.update(mean_g, s2, params)
    p_ref = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p_ref["w"]), rtol=1e-6)


def test_amp_wrapper_accepted_with_warning():
    params = _params()
    with pytest.warns(UserWarning, match="loss_scale is ignored"):
        tx, _ = build_optimizer(
            params,
            dict(type="AmpOptimWrapper", loss_scale=512.0, optimizer=dict(type="AdamW", lr=1e-3)),
        )
    # 'dynamic' (the config default) is silently accepted
    tx, _ = build_optimizer(
        params,
        dict(type="AmpOptimWrapper", loss_scale="dynamic", optimizer=dict(type="AdamW", lr=1e-3)),
    )
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(4)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_local_vis_backend(tmp_path):
    from probpose_code_tpu.visualization import LocalVisBackend

    b = LocalVisBackend(save_dir=str(tmp_path))
    b.add_scalars({"train/loss": 1.5}, step=10)
    b.add_scalars({"train/loss": 1.2}, step=20)
    b.close()
    lines = [json.loads(ln) for ln in open(tmp_path / "scalars.json")]
    assert lines[0] == {"train/loss": 1.5, "step": 10}
    assert lines[1]["step"] == 20


def test_tensorboard_vis_backend(tmp_path):
    from probpose_code_tpu.visualization import TensorboardVisBackend

    b = TensorboardVisBackend(save_dir=str(tmp_path))
    b.add_scalars({"val/AP": 0.7}, step=5)
    b.close()
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(tmp_path))


def test_build_vis_backends_from_config(tmp_path):
    from probpose_code_tpu.config import Config
    from probpose_code_tpu.visualization import LocalVisBackend, build_vis_backends

    cfg = Config.fromdict(dict(visualizer=dict(vis_backends=[dict(type="LocalVisBackend")])))
    backends = build_vis_backends(cfg, str(tmp_path))
    assert len(backends) == 1 and isinstance(backends[0], LocalVisBackend)
    assert build_vis_backends(Config.fromdict({}), str(tmp_path)) == []


def test_profiler_hook_traces_window(tmp_path):
    """ProfilerHook captures a jax.profiler trace over [begin, begin+n) and
    writes it under work_dir/profiler_trace (SURVEY §5 tracing subsystem)."""
    from probpose_code_tpu.engine.hooks import ProfilerHook

    class _FakeRunner:
        work_dir = str(tmp_path)

    hook = ProfilerHook(begin_iter=2, num_iters=2)
    runner = _FakeRunner()
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a @ a)
    for step in range(1, 7):
        f(x).block_until_ready()
        hook.after_train_iter(runner, step, {})
    hook.after_run(runner)
    assert hook._done and not hook._active
    trace_root = os.path.join(str(tmp_path), "profiler_trace")
    found = [
        os.path.join(r, fn)
        for r, _, fns in os.walk(trace_root)
        for fn in fns
    ]
    assert found, "no trace files written"


def test_profiler_hook_stops_on_early_end(tmp_path):
    """A run ending inside the window still closes the trace cleanly."""
    from probpose_code_tpu.engine.hooks import ProfilerHook

    class _FakeRunner:
        work_dir = str(tmp_path)

    hook = ProfilerHook(begin_iter=0, num_iters=100)
    runner = _FakeRunner()
    hook.after_train_iter(runner, 1, {})
    assert hook._active
    hook.after_run(runner)
    assert hook._done and not hook._active
