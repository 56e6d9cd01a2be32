"""Aux subsystems (SURVEY §5 new scope): profiling/roofline,
checkpoint/resume, accuracy metrics."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.utils import (device_time, cost_analysis, roofline,
                                save_checkpoint, load_checkpoint,
                                latest_checkpoint, resumable_iterate)
from libstevi_tpu.statistics import (prop_good, bad_n, inlier_mae,
                                     end_point_error)


def test_device_time_measures_work(rng):
    x = jnp.asarray(rng.uniform(size=(1024, 1024)).astype(np.float32))
    t_small = device_time(lambda a: a * 2.0, x, iters=5)

    def big(a):
        for _ in range(8):
            a = a @ a * 1e-3
        return a

    t_big = device_time(big, x, iters=5)
    assert t_small >= 0 and np.isfinite(t_small)
    assert t_big > 2 * t_small  # 8 matmuls must dominate one multiply


def test_cost_analysis_reports_flops(rng):
    x = jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32))
    ca = cost_analysis(lambda a: a @ a, x)
    assert ca.get("flops", 0) >= 2 * 64 ** 3 * 0.9


def test_roofline_report_structure(rng):
    x = jnp.asarray(rng.uniform(size=(128, 128)).astype(np.float32))
    r = roofline(lambda a: a @ a + 1.0, x, iters=3)
    assert r["bound_by"] in ("memory", "compute")
    assert r["flops"] > 0 and r["measured_s"] > 0
    assert np.isfinite(r["fraction_of_roofline"])


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {"x": rng.normal(size=(7, 3)).astype(np.float32),
            "step": np.int64(4),
            "nested": [np.arange(5), np.float32(2.5)]}
    p = save_checkpoint(str(tmp_path), 12, tree)
    step, path = latest_checkpoint(str(tmp_path))
    assert step == 12 and path == p
    back = load_checkpoint(path, like=tree)
    np.testing.assert_array_equal(back["x"], tree["x"])
    np.testing.assert_array_equal(back["nested"][0], tree["nested"][0])
    assert back["step"] == 4


def test_resumable_iterate_resumes(tmp_path):
    calls = []

    def step(s):
        calls.append(1)
        return {"v": s["v"] + 1}

    out = resumable_iterate(step, {"v": np.int64(0)}, 5, str(tmp_path),
                            checkpoint_every=1)
    assert out["v"] == 5 and len(calls) == 5

    # a "preempted" rerun resumes from the newest checkpoint: no re-work
    calls.clear()
    out = resumable_iterate(step, {"v": np.int64(0)}, 5, str(tmp_path))
    assert out["v"] == 5 and len(calls) == 0

    # extending the run does only the missing steps
    out = resumable_iterate(step, {"v": np.int64(0)}, 8, str(tmp_path))
    assert out["v"] == 8 and len(calls) == 3


def test_metrics_match_reference_semantics():
    gt = np.array([[0.0, 1.0, np.nan, 4.0]])
    disp = np.array([[0.5, 3.5, 7.0, np.nan]])
    # valid GT pixels: 3; errors 0.5 (good), 2.5 (bad), NaN disp (bad)
    assert prop_good(disp, gt, 2.0) == pytest.approx(1 / 3)
    assert bad_n(disp, gt, 2.0) == pytest.approx(2 / 3)
    assert inlier_mae(disp, gt, 2.0) == pytest.approx(0.5)


def test_end_point_error():
    gt = np.zeros((4, 4, 2))
    flow = np.zeros((4, 4, 2))
    flow[..., 0] = 3.0
    flow[..., 1] = 4.0
    assert end_point_error(flow, gt) == pytest.approx(5.0)
