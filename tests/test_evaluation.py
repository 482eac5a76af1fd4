"""Evaluation harness tests: associate, Horn/ATE, RPE."""

import numpy as np

from cvo_rgbd_tpu.evaluation import associate, ate_rmse, horn_align, rpe
from cvo_rgbd_tpu import se3


def test_associate_greedy():
    first = {0.0: ["a"], 1.0: ["b"], 2.0: ["c"]}
    second = {0.015: ["x"], 1.001: ["y"], 5.0: ["z"]}
    m = associate(first, second)
    assert m == [(0.0, 0.015), (1.0, 1.001)]


def test_associate_one_to_one():
    # two firsts near one second: only the closer wins
    first = {0.0: ["a"], 0.01: ["b"]}
    second = {0.009: ["x"]}
    m = associate(first, second)
    assert m == [(0.01, 0.009)]


def test_horn_align_exact(rng):
    pts = rng.standard_normal((3, 50))
    w = np.array([0.3, -0.2, 0.5], np.float32)
    R = np.asarray(se3.exp_so3(w)).astype(np.float64)
    t = np.array([[1.0], [-2.0], [0.5]])
    data = R @ pts + t
    rot, trans, err = horn_align(pts, data)
    np.testing.assert_allclose(rot, R, atol=1e-6)
    np.testing.assert_allclose(trans, t, atol=1e-6)
    assert err.max() < 1e-6  # R comes from fp32 exp_so3


def _traj_line(t, T):
    return {t: T}


def _make_traj(n, step_t, step_w, t0=100.0, dt=0.1):
    traj = {}
    T = np.eye(4)
    for i in range(n):
        traj[t0 + i * dt] = T.copy()
        dT = np.eye(4)
        dT[:3, :3] = np.asarray(se3.exp_so3(np.asarray(step_w, np.float32))).astype(np.float64)
        dT[:3, 3] = step_t
        T = T @ dT
    return traj


def test_ate_zero_for_identical():
    traj = _make_traj(20, [0.01, 0, 0.002], [0.001, 0.002, 0])
    stats = ate_rmse(traj, traj)
    assert stats["rmse"] < 1e-12
    assert stats["pairs"] == 20


def test_ate_invariant_to_global_transform():
    """ATE aligns with Horn: a global rigid offset must not change it."""
    traj = _make_traj(20, [0.01, 0, 0.002], [0.001, 0.002, 0])
    G = np.eye(4)
    G[:3, :3] = np.asarray(se3.exp_so3(np.array([0.2, -0.1, 0.4], np.float32))).astype(np.float64)
    G[:3, 3] = [5.0, -3.0, 1.0]
    moved = {t: G @ T for t, T in traj.items()}
    stats = ate_rmse(traj, moved)
    assert stats["rmse"] < 1e-8


def test_ate_detects_drift():
    traj = _make_traj(20, [0.01, 0, 0], [0, 0, 0])
    drifted = {
        t: T @ np.diag([1.0, 1, 1, 1]) for t, T in traj.items()
    }
    for i, (t, T) in enumerate(sorted(drifted.items())):
        T2 = T.copy()
        T2[0, 3] += 0.005 * i  # linear drift
        drifted[t] = T2
    stats = ate_rmse(traj, drifted)
    assert stats["rmse"] > 0.01


def test_rpe_zero_for_identical():
    traj = _make_traj(30, [0.01, 0, 0.002], [0.001, 0.002, 0])
    stats = rpe(traj, traj, delta=1, delta_unit="f")
    assert stats["trans_rmse"] < 1e-12
    assert stats["rot_rmse"] < 1e-9


def test_rpe_constant_error():
    """Estimated motion 1mm short per frame -> RPE trans ~1mm at delta=1f."""
    gt = _make_traj(30, [0.010, 0, 0], [0, 0, 0])
    est = _make_traj(30, [0.009, 0, 0], [0, 0, 0])
    stats = rpe(gt, est, delta=1, delta_unit="f")
    np.testing.assert_allclose(stats["trans_rmse"], 0.001, rtol=1e-6)
