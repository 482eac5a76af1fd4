"""Canny edge filter (the ptcloud_edge_filter.m analog)."""

import numpy as np

from cvo_rgbd_tpu.utils import canny_edges, edge_filter


def _step_image(h=48, w=64, col=32):
    img = np.zeros((h, w), np.float32)
    img[:, col:] = 200.0
    return img


def test_canny_finds_step_edge():
    edges = canny_edges(_step_image())
    ys, xs = np.nonzero(edges)
    assert len(xs) > 0
    # all edge pixels hug the step column
    assert np.all(np.abs(xs - 31.5) < 3.0)
    # the edge is (nearly) a full vertical line
    assert len(np.unique(ys)) > 40


def test_canny_flat_image_no_edges():
    assert not canny_edges(np.full((32, 32), 7.0, np.float32)).any()


def test_canny_nms_thin_edges():
    """Non-max suppression keeps the edge thin: at most 2 px per row."""
    edges = canny_edges(_step_image())
    per_row = edges.sum(axis=1)
    assert per_row.max() <= 2


def test_edge_filter_organized_cloud(rng):
    h, w = 40, 56
    img = np.zeros((h, w, 3), np.float32)
    img[:, 28:, :] = 180.0
    # organized cloud: each pixel backprojects to x=u, y=v, z=1
    ys, xs = np.mgrid[0:h, 0:w]
    pos = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
    pos[5, 30] = 0.0          # zero point must be dropped
    pos[6, 30] = np.nan       # NaN point must be dropped
    col = img.copy()

    p, c = edge_filter(img, pos, col)
    assert p.shape[0] > 0 and p.shape == c.shape
    assert np.isfinite(p).all()
    # every kept point sits near the step column
    assert np.all(np.abs(p[:, 0] - 27.5) < 3.0)
    # and the dropped pixels are absent even though they are on the edge
    assert not ((p[:, 1] == 5) & (p[:, 0] == 30)).any()


def test_edge_filter_positions_only():
    img = np.zeros((24, 24, 3), np.float32)
    img[:, 12:, :] = 100.0
    pos = np.ones((24, 24, 3), np.float32)
    p = edge_filter(img, pos)
    assert p.ndim == 2 and p.shape[1] == 3
