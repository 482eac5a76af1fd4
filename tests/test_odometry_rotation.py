"""Rotation-rich end-to-end odometry on a ray-traced synthetic scene.

The camera ORBITS a pivot inside the banded-depth scene (yaw + a touch
of pitch), so every frame pair carries genuine rotation — the full
chain (selector -> backproject -> align -> quaternion writer -> ATE)
would fail here on any exp_sek3 / quaternion / chaining sign error,
which the pure-lateral-translation scene of test_odometry.py cannot
catch (VERDICT r1 item 4; reference acceptance evaluate_ate.py:152-162).

The world is 6 horizontal depth bands (fixed rectangles at z in
{1,2,4} m, defined by frame 0's frustum) with smooth per-channel
textures; frames are rendered by exact per-pixel ray/plane
intersection with z-buffering, so ground truth is closed-form and
occlusion is handled correctly.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from cvo_rgbd_tpu.evaluation import ate_rmse
from cvo_rgbd_tpu.frontend.camera import get_camera
from cvo_rgbd_tpu.io.tum import read_trajectory
from cvo_rgbd_tpu.odometry import run_odometry

H, W = 96, 128
N_FRAMES = 6
DEPTHS = [1.0, 2.0, 4.0]
BAND_ROWS = 16
NUM_WANT = 1024
CAM = get_camera(1)  # fr1 intrinsics — same registry key the driver uses
YAW_STEP = np.deg2rad(0.8)    # per-frame yaw about the pivot
PITCH_STEP = np.deg2rad(0.15)  # slight pitch so rotation is off-axis
U_PAD, V_PAD = 80, 16          # texture margins beyond frame 0's frustum


def _smooth_field(seed, h, w):
    from scipy.ndimage import gaussian_filter, zoom

    r = np.random.default_rng(seed)
    b = zoom(gaussian_filter(r.normal(0, 1, (h // 4 + 2, w // 4 + 2)), 1.2),
             4.05)
    b = b[:h, :w]
    return (b - b.min()) / (b.max() - b.min())


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _quat_xyzw(R):
    """Rotation matrix -> TUM-order quaternion (qx qy qz qw)."""
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(R).as_quat()


def _render(texture, R_cam, c_cam):
    """Ray-trace one frame: camera-to-world pose (R_cam, c_cam)."""
    fx, fy, cx, cy = CAM.fx, CAM.fy, CAM.cx, CAM.cy
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    ray_c = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, float)], axis=-1
    )
    ray_w = ray_c @ R_cam.T                      # [H,W,3]

    best_s = np.full((H, W), np.inf)
    rgb = np.zeros((H, W, 3), np.float32)
    for b in range(6):
        z_b = DEPTHS[b % 3]
        s = (z_b - c_cam[2]) / ray_w[..., 2]     # ray parameter to plane
        X = c_cam[None, None, :] + s[..., None] * ray_w
        v0 = fy * X[..., 1] / z_b + cy           # frame-0 row of the hit
        u0 = fx * X[..., 0] / z_b + cx
        lo = b * BAND_ROWS - (V_PAD if b == 0 else 0)
        hi = (b + 1) * BAND_ROWS + (V_PAD if b == 5 else 0)
        valid = (
            (s > 0) & (v0 >= lo) & (v0 < hi)
            & (u0 >= -U_PAD) & (u0 < W + U_PAD) & (s < best_s)
        )
        # bilinear texture sample at (v0 + V_PAD, u0 + U_PAD)
        tv = np.clip(v0 + V_PAD, 0, texture.shape[0] - 1.001)
        tu = np.clip(u0 + U_PAD, 0, texture.shape[1] - 1.001)
        i0, j0 = tv.astype(int), tu.astype(int)
        av, au = (tv - i0)[..., None], (tu - j0)[..., None]
        samp = (
            texture[i0, j0] * (1 - av) * (1 - au)
            + texture[i0 + 1, j0] * av * (1 - au)
            + texture[i0, j0 + 1] * (1 - av) * au
            + texture[i0 + 1, j0 + 1] * av * au
        )
        rgb = np.where(valid[..., None], samp, rgb)
        best_s = np.where(valid, s, best_s)

    depth = np.where(np.isfinite(best_s), best_s, 0.0)  # z-depth: ray_c z=1
    return rgb, depth


@pytest.fixture(scope="module")
def orbit_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tumorbit")
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    texture = np.stack(
        [
            40 + 200 * _smooth_field(s, H + 2 * V_PAD, W + 2 * U_PAD)
            for s in (11, 12, 13)
        ],
        axis=-1,
    ).astype(np.float32)

    # pivot on the optical axis of the (off-axis) fr1 frustum at 2 m
    pivot = np.array([2.0 * (W / 2 - CAM.cx) / CAM.fx,
                      2.0 * (H / 2 - CAM.cy) / CAM.fy, 2.0])

    lines, gt_lines = [], ["# ground truth"]
    for i in range(N_FRAMES):
        R = _rot_y(i * YAW_STEP) @ _rot_x(i * PITCH_STEP)
        c = pivot - R @ pivot                    # orbit: camera center
        rgb, depth = _render(texture, R, c)
        t = 200.0 + 0.1 * i
        name = f"{t:.6f}"
        Image.fromarray(rgb.astype(np.uint8)).save(
            root / "rgb" / f"{name}.png"
        )
        Image.fromarray(
            (depth * CAM.scaling_factor).astype(np.uint16)
        ).save(root / "depth" / f"{name}.png")
        lines.append(f"{name} rgb/{name}.png {name} depth/{name}.png")
        q = _quat_xyzw(R)
        gt_lines.append(
            f"{name} {c[0]:.9f} {c[1]:.9f} {c[2]:.9f} "
            f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
        )
    (root / "assoc.txt").write_text("\n".join(lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return root


def _rotation_errors_mrad(root, est):
    gt = read_trajectory(root / "groundtruth.txt")
    errs = []
    for t, T in est.items():
        k = min(gt.keys(), key=lambda g: abs(g - t))
        dR = T[:3, :3] @ gt[k][:3, :3].T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        errs.append(ang * 1e3)
    return errs


def _cli_ate(root, est_path):
    """Round-trip the written trajectory through the evaluate-ate CLI."""
    out = subprocess.run(
        [sys.executable, "-m", "cvo_rgbd_tpu.cli", "evaluate-ate",
         str(root / "groundtruth.txt"), str(est_path)],
        capture_output=True, text=True, check=True,
    )
    return float(out.stdout.strip())


def test_rotation_odometry_cvo(orbit_dataset):
    records = run_odometry(
        str(orbit_dataset), 1, num_want=NUM_WANT, log=lambda *a: None,
    )
    assert all(not r.failed for r in records)
    est_path = orbit_dataset / "cvo_poses_qt.txt"
    est = read_trajectory(est_path)
    assert len(est) == N_FRAMES

    gt = read_trajectory(orbit_dataset / "groundtruth.txt")
    stats = ate_rmse(gt, est)
    # total camera path ~120 mm with ~4.8 deg of accumulated rotation;
    # a sign/convention error anywhere in the rotation chain produces
    # errors at the FULL motion scale (>= 40 mm / >= 30 mrad)
    assert stats["rmse"] < 0.015, stats

    # measured drift: ~3 mrad/pair accumulating to ~15 mrad over the
    # 70 mrad of total rotation (the scene's intrinsic ~20% per-pair
    # bias, see test_odometry.py fixture note); a sign error would read
    # ~140 mrad (rotating the wrong way doubles the error)
    rot_errs = _rotation_errors_mrad(orbit_dataset, est)
    assert max(rot_errs) < 25.0, rot_errs

    # quaternion writer round-trips through the evaluate-ate CLI and
    # agrees with the library ATE (evaluate_ate.py:152-162 analog)
    cli_rmse = _cli_ate(orbit_dataset, est_path)
    np.testing.assert_allclose(cli_rmse, stats["rmse"], rtol=1e-4)


def test_rotation_odometry_acvo(orbit_dataset, tmp_path):
    out = tmp_path / "acvo_poses_qt.txt"
    records = run_odometry(
        str(orbit_dataset), 1, adaptive=True, num_want=NUM_WANT,
        output=str(out), log=lambda *a: None,
    )
    assert all(not r.failed for r in records)
    est = read_trajectory(out)
    assert len(est) == N_FRAMES

    gt = read_trajectory(orbit_dataset / "groundtruth.txt")
    stats = ate_rmse(gt, est)
    assert stats["rmse"] < 0.02, stats
    rot_errs = _rotation_errors_mrad(orbit_dataset, est)
    assert max(rot_errs) < 30.0, rot_errs
