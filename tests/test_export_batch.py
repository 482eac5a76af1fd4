"""Export, batch runner, and plot tooling tests."""

import numpy as np
import pytest

from cvo_rgbd_tpu.frontend.camera import get_camera
from cvo_rgbd_tpu.io.export import (
    depth_to_cloud,
    merge_clouds,
    pack_rgb,
    transform_points,
    write_pcd,
    write_ply,
)
from cvo_rgbd_tpu.io.pcd import read_pcd, unpack_rgb


def test_pcd_roundtrip_binary(tmp_path, rng):
    pos = rng.standard_normal((50, 3)).astype(np.float32)
    col = rng.integers(0, 256, (50, 3)).astype(np.float32)
    p = tmp_path / "c.pcd"
    write_pcd(p, pos, col, binary=True)
    d = read_pcd(p)
    np.testing.assert_allclose(d["positions"], pos, rtol=1e-6)
    np.testing.assert_allclose(d["colors"] * 255, col, atol=0.5)


def test_pcd_roundtrip_ascii(tmp_path, rng):
    pos = rng.standard_normal((20, 3)).astype(np.float32)
    p = tmp_path / "c.pcd"
    write_pcd(p, pos, None, binary=False)
    d = read_pcd(p)
    np.testing.assert_allclose(d["positions"], pos, rtol=1e-5)


def test_pack_unpack_rgb(rng):
    col = rng.integers(0, 256, (30, 3)).astype(np.float32)
    back = unpack_rgb(pack_rgb(col)) * 255
    np.testing.assert_allclose(back, col, atol=0.5)


def test_ply_writer(tmp_path, rng):
    pos = rng.standard_normal((10, 3)).astype(np.float32)
    col = rng.integers(0, 256, (10, 3)).astype(np.float32)
    p = tmp_path / "c.ply"
    write_ply(p, pos, col)
    text = open(p).read()
    assert "element vertex 10" in text
    assert len(text.strip().splitlines()) == 10 + 10  # header + points


def test_depth_to_cloud(rng):
    cam = get_camera("fr1")
    depth = np.zeros((10, 12), np.float32)
    depth[5, 6] = 5000.0  # 1m
    rgb = np.full((10, 12, 3), 128, np.uint8)
    pos, col = depth_to_cloud(rgb, depth, cam)
    assert pos.shape == (1, 3)
    np.testing.assert_allclose(pos[0, 2], 1.0, rtol=1e-6)
    np.testing.assert_allclose(pos[0, 0], (6 - cam.cx) / cam.fx, rtol=1e-5)


def test_merge_and_transform(rng):
    a = rng.standard_normal((40, 3)).astype(np.float32)
    ca = np.ones((40, 3), np.float32)
    T = np.eye(4); T[:3, 3] = [1, 0, 0]
    b = transform_points(T, a)
    np.testing.assert_allclose(b[:, 0], a[:, 0] + 1, rtol=1e-6)
    pos, col = merge_clouds([(a, ca), (b, ca)], grid=0.001)
    assert pos.shape[0] <= 80


def test_batch_runner(tmp_path, rng):
    """Batch pairwise registration with NaN-on-failure semantics."""
    from cvo_rgbd_tpu.batch import run_batch

    base = rng.standard_normal((300, 3)).astype(np.float32)
    base = base / np.linalg.norm(base, axis=1, keepdims=True) * (
        1.0 + rng.random(300).astype(np.float32)[:, None] * 2.0
    )  # radii in [1,3] -> survives range filter
    col = rng.integers(0, 256, (300, 3)).astype(np.float32)
    for i in range(3):
        shift = np.array([0.005 * i, 0, 0], np.float32)
        write_pcd(tmp_path / f"f{i}.pcd", base + shift, col)
    results, times = run_batch(str(tmp_path), grid=0.02, log=lambda *a: None)
    assert results.shape == (3, 4, 4)
    np.testing.assert_allclose(results[0], np.eye(4))
    assert np.isfinite(results[1:]).all()
    # estimated pairwise translation ~ -5mm in x (moving->fixed maps back)
    assert abs(results[1][0, 3] + 0.005) < 0.004
    assert times.shape == (2,)
    assert len(list(tmp_path.glob("cvo_batch_*.npz"))) == 1


def test_plots(tmp_path, rng):
    from cvo_rgbd_tpu.evaluation.plots import (
        plot_error_cdfs,
        plot_trajectories,
        relative_errors,
    )

    traj = {}
    T = np.eye(4)
    for i in range(10):
        traj[100.0 + i * 0.1] = T.copy()
        T = T.copy()
        T[0, 3] += 0.01
    est = {t: m.copy() for t, m in traj.items()}
    for i, t in enumerate(sorted(est)):
        est[t][1, 3] += 0.001 * i
    te, re = relative_errors(traj, est)
    assert te.shape == (9,)
    np.testing.assert_allclose(te, 0.001, rtol=1e-6)

    p1 = plot_error_cdfs({"cvo": (te, re)}, tmp_path / "cdf.png")
    p2 = plot_trajectories({"gt": traj, "est": est}, tmp_path / "traj.png")
    assert (tmp_path / "cdf.png").stat().st_size > 1000
    assert (tmp_path / "traj.png").stat().st_size > 1000
