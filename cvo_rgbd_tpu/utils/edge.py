"""Edge-based point filtering — the util/ptcloud_edge_filter.m analog.

The MATLAB toy pipeline (run_toy_example.m:7-13) filters each organized
Kinect cloud to points whose pixel lies on a Canny edge of the color
image (ptcloud_edge_filter.m:6-14) before downsampling and alignment.
This is the MATLAB-path counterpart of the DSO gradient selector used
by the C++ frontend (SURVEY.md section 2.3).

Host-side numpy (one-time data preparation, like utils.downsample):
a compact Canny — Gaussian smooth, Sobel gradients, non-maximum
suppression along the quantized gradient direction, double-threshold
hysteresis grown to connectivity-8 neighbors.
"""

from __future__ import annotations

import numpy as np


def _gaussian_blur(img, sigma=1.0, radius=2):
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    try:
        from scipy.ndimage import convolve1d

        out = convolve1d(np.asarray(img, np.float32), k, axis=1,
                         mode="nearest")
        out = convolve1d(out, k, axis=0, mode="nearest")
        return out.astype(np.float32)
    except ImportError:  # pragma: no cover - scipy is in the base image
        pad = np.pad(img, radius, mode="edge")
        win = np.lib.stride_tricks.sliding_window_view(
            pad, 2 * radius + 1, axis=1
        )
        out = win @ k  # [H+2r, W]
        win = np.lib.stride_tricks.sliding_window_view(
            out, 2 * radius + 1, axis=0
        )
        return (win @ k).astype(np.float32)  # [H, W]


def canny_edges(gray, low=None, high=None, sigma=1.0):
    """Boolean edge map of a grayscale image [H,W] (values any scale).

    `low`/`high` default to 0.1/0.2 of the max gradient magnitude —
    the same auto-threshold spirit as MATLAB's edge(...,'canny').
    """
    g = _gaussian_blur(np.asarray(gray, np.float32), sigma=sigma)
    gx = np.zeros_like(g)
    gy = np.zeros_like(g)
    gx[:, 1:-1] = (g[:, 2:] - g[:, :-2]) * 0.5
    gy[1:-1, :] = (g[2:, :] - g[:-2, :]) * 0.5
    mag = np.hypot(gx, gy)
    if high is None:
        high = 0.2 * float(mag.max() or 1.0)
    if low is None:
        low = 0.5 * high

    # non-maximum suppression: compare against the two neighbors along
    # the gradient direction, quantized to 0/45/90/135 degrees
    ang = np.rad2deg(np.arctan2(gy, gx)) % 180.0
    padm = np.pad(mag, 1, mode="constant")

    def shift(dy, dx):
        return padm[1 + dy : 1 + dy + mag.shape[0],
                    1 + dx : 1 + dx + mag.shape[1]]

    sectors = [
        ((ang < 22.5) | (ang >= 157.5), shift(0, 1), shift(0, -1)),     # 0
        ((ang >= 22.5) & (ang < 67.5), shift(1, 1), shift(-1, -1)),     # 45
        ((ang >= 67.5) & (ang < 112.5), shift(1, 0), shift(-1, 0)),     # 90
        ((ang >= 112.5) & (ang < 157.5), shift(1, -1), shift(-1, 1)),   # 135
    ]
    keep = np.zeros(mag.shape, bool)
    for sel, a, b in sectors:
        keep |= sel & (mag >= a) & (mag >= b)
    nms = np.where(keep, mag, 0.0)

    strong = nms >= high
    weak = (nms >= low) & ~strong
    # hysteresis: keep weak pixels 8-connected (through weak/strong) to
    # a strong pixel — one connected-components pass, not an iterative
    # grow (which is O(H*W*chain_length))
    try:
        from scipy import ndimage

        labels, _ = ndimage.label(strong | weak, structure=np.ones((3, 3)))
        keep = np.unique(labels[strong])
        keep = keep[keep > 0]
        return np.isin(labels, keep) & (strong | weak)
    except ImportError:  # pragma: no cover - scipy is in the base image
        edges = strong.copy()
        changed = True
        while changed:
            grown = np.pad(edges, 1)
            neigh = np.zeros(edges.shape, bool)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy or dx:
                        neigh |= grown[1 + dy : 1 + dy + edges.shape[0],
                                       1 + dx : 1 + dx + edges.shape[1]]
            new = edges | (weak & neigh)
            changed = bool((new != edges).any())
            edges = new
        return edges


def edge_filter(rgb, positions, colors=None, low=None, high=None,
                sigma=1.0):
    """Keep organized-cloud points on color-image edges
    (ptcloud_edge_filter.m:6-14).

    rgb [H,W,3]; positions [H,W,3] organized cloud (NaN/zero-depth
    points are dropped regardless); colors optional [H,W,3].  Returns
    (positions [N,3], colors [N,3]) or positions alone.
    """
    rgb = np.asarray(rgb, np.float32)
    positions = np.asarray(positions, np.float32)
    gray = rgb @ np.array([0.299, 0.587, 0.114], np.float32)
    mask = canny_edges(gray, low=low, high=high, sigma=sigma)
    finite = np.isfinite(positions).all(-1) & (
        np.abs(positions).sum(-1) > 0
    )
    keep = mask & finite
    pos = positions[keep]
    if colors is None:
        return pos
    return pos, np.asarray(colors)[keep]
