"""Visualization tool tests."""

import numpy as np

from cvo_rgbd_tpu.frontend import image as image_mod
from cvo_rgbd_tpu.frontend import selector as selector_mod
from cvo_rgbd_tpu.frontend.camera import get_camera
from cvo_rgbd_tpu.visualize import (
    draw_trajectory_into_image,
    export_registered_clouds,
    selected_pixels_image,
)


def test_selected_pixels_image(rng):
    rgb = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    depth = np.full((64, 96), 5000.0, np.float32)
    gray = np.asarray(image_mod.rgb_to_gray(rgb.astype(np.float32)))
    pyr = image_mod.make_pyramid(gray)
    idx, valid = selector_mod.select_pixels(pyr, 100)
    out = selected_pixels_image(rgb, depth, np.asarray(idx), np.asarray(valid))
    assert out.shape == rgb.shape and out.dtype == np.uint8
    assert not np.array_equal(out, rgb)  # something was drawn


def test_draw_trajectory(rng):
    cam = get_camera("fr1")
    rgb = np.zeros((480, 640, 3), np.uint8)
    traj = {}
    for i in range(5):
        T = np.eye(4)
        T[:3, 3] = [0.01 * i, 0.0, 2.0]  # points in front of the camera
        traj[float(i)] = T
    out = draw_trajectory_into_image(rgb, cam, np.eye(4), traj)
    assert (out[:, :, 0] == 255).sum() > 5  # red marks drawn


def test_export_registered_clouds(rng):
    cam = get_camera("fr1")
    depth = np.full((48, 64), 5000.0, np.float32)
    rgb = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    T1 = np.eye(4)
    T2 = np.eye(4)
    T2[:3, 3] = [1.0, 0, 0]
    frames = [(0.0, rgb, depth), (1.0, rgb, depth)]
    traj = {0.0: T1, 1.0: T2}
    pos, col = export_registered_clouds(frames, traj, cam, stride=8)
    assert pos.shape[0] == col.shape[0] > 0
    # second frame's points are offset by 1m in x
    n = pos.shape[0] // 2
    np.testing.assert_allclose(pos[n:, 0] - pos[:n, 0], 1.0, atol=1e-5)
