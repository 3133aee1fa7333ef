"""SimpleCamera projections + timer/env utils + EMA hook math
(reference ``mmpose/utils/camera.py``, ``timer.py``, ``engine/hooks``)."""

import math
import time

import numpy as np


def _cam(with_distortion=False):
    rng = np.random.RandomState(0)
    # random proper rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    param = dict(R=q, T=rng.randn(3, 1) * 0.1, f=[[1145.0], [1144.0]], c=[[512.0], [515.0]])
    if with_distortion:
        param["k"] = [-0.2, 0.24, -0.002]
        param["p"] = [-0.0009, -0.0007]
    return param


def test_world_camera_round_trip():
    from probpose_code_tpu.utils.camera import SimpleCamera

    cam = SimpleCamera(_cam())
    X = np.random.RandomState(1).randn(17, 3)
    Xc = cam.world_to_camera(X)
    np.testing.assert_allclose(cam.camera_to_world(Xc), X, atol=1e-10)


def test_camera_pixel_round_trip_no_distortion():
    from probpose_code_tpu.utils.camera import SimpleCamera

    cam = SimpleCamera(_cam())
    Xc = np.abs(np.random.RandomState(2).randn(17, 3)) + np.array([0, 0, 3.0])
    pix = cam.camera_to_pixel(Xc)
    back = cam.pixel_to_camera(np.concatenate([pix, Xc[:, 2:]], axis=1))
    np.testing.assert_allclose(back, Xc, atol=1e-8)


def test_intrinsics_matrix_form_matches_fc():
    from probpose_code_tpu.utils.camera import SimpleCamera

    p = _cam()
    K = np.array([[p["f"][0][0], 0, p["c"][0][0]], [0, p["f"][1][0], p["c"][1][0]]])
    cam_fc = SimpleCamera(p)
    cam_K = SimpleCamera(dict(R=p["R"], T=p["T"], K=K))
    Xc = np.abs(np.random.RandomState(3).randn(5, 3)) + np.array([0, 0, 2.0])
    np.testing.assert_allclose(cam_fc.camera_to_pixel(Xc), cam_K.camera_to_pixel(Xc))


def test_distortion_changes_projection_smoothly():
    from probpose_code_tpu.utils.camera import SimpleCamera

    cam = SimpleCamera(_cam(with_distortion=True))
    cam0 = SimpleCamera(_cam())
    Xc = np.array([[0.1, 0.05, 2.0], [0.4, -0.3, 3.0]])
    d = cam.camera_to_pixel(Xc)
    u = cam0.camera_to_pixel(Xc)
    assert np.all(np.abs(d - u) < 50)  # small distortion, bounded shift
    assert not np.allclose(d, u)


def test_stopwatch_and_running_average():
    from probpose_code_tpu.utils.misc import RunningAverage, StopWatch

    ra = RunningAverage(window=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        ra.update(v)
    assert ra.average() == 3.0  # window keeps (2, 3, 4)

    sw = StopWatch(window=2)
    with sw.timeit("stage"):
        time.sleep(0.01)
    rep = sw.report()
    assert "stage" in rep and rep["stage"] >= 5.0  # ms
    assert any("stage" in s for s in sw.report_strings())
    sw.reset()
    assert sw.report() == {}


def test_collect_env_keys():
    from probpose_code_tpu.utils.misc import collect_env

    env = collect_env()
    assert "JAX" in env and "Python" in env and "probpose_code_tpu" in env


def test_exp_momentum_ema_math():
    import jax.numpy as jnp

    import probpose_code_tpu.engine.hooks  # noqa: F401 - registers hooks
    from probpose_code_tpu.registry import HOOKS

    class _Runner:
        pass

    hook = HOOKS.build(dict(type="ExpMomentumEMA", momentum=0.1, gamma=10))
    r = _Runner()

    class _State:
        params = {"w": jnp.asarray(0.0)}

    r.state = _State()
    hook.after_train_iter(r, 0, {})  # seeds ema with 0.0
    r.state.params = {"w": jnp.asarray(1.0)}
    hook.after_train_iter(r, 1, {})
    m = (1 - 0.1) * math.exp(-2 / 10) + 0.1
    np.testing.assert_allclose(float(hook.ema_params["w"]), m, rtol=1e-6)


def test_emahook_mmengine_schema():
    """EMAHook builds from the exact dict the RTMO/YOLOX recipes write
    (reference ``rtmo-l_16xb16-600e_coco-640x640.py`` custom_hooks) and
    tracks buffers when update_buffers=True."""
    import jax.numpy as jnp
    import math
    import numpy as np
    from probpose_code_tpu.registry import HOOKS

    hook = HOOKS.build(dict(type="EMAHook", ema_type="ExpMomentumEMA",
                            momentum=0.1, gamma=10, update_buffers=True, priority=49))

    class _State:
        params = {"w": jnp.asarray(0.0)}
        batch_stats = {"bn": jnp.asarray(0.0)}

    class _Runner:
        state = _State()

    r = _Runner()
    hook.after_train_iter(r, 0, {})
    r.state.params = {"w": jnp.asarray(1.0)}
    r.state.batch_stats = {"bn": jnp.asarray(2.0)}
    hook.after_train_iter(r, 1, {})
    m = (1 - 0.1) * math.exp(-2 / 10) + 0.1
    np.testing.assert_allclose(float(hook.ema_params["w"]), m, rtol=1e-6)
    np.testing.assert_allclose(float(hook.ema_buffers["bn"]), 2 * m, rtol=1e-6)

    # constant-momentum mode (non-ExpMomentumEMA ema_type)
    hook2 = HOOKS.build(dict(type="EMAHook", ema_type="ExponentialMovingAverage", momentum=0.25))
    r2 = _Runner()
    r2.state = _State()
    r2.state.params = {"w": jnp.asarray(0.0)}
    hook2.after_train_iter(r2, 0, {})
    r2.state.params = {"w": jnp.asarray(1.0)}
    hook2.after_train_iter(r2, 1, {})
    np.testing.assert_allclose(float(hook2.ema_params["w"]), 0.25, rtol=1e-6)
