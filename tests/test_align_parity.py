"""Implementation parity: jitted fp32 align vs the float64 numpy oracle.

The strongest correctness statement available without the reference
binaries: both implementations of the full align loop (gram + flow +
step + integrator + stopping rules) produce the same trajectory on the
same input.
"""

import dataclasses

import numpy as np

from cvo_rgbd_tpu import CvoParams, align_jit, pad_cloud
from oracle import align_oracle


def _pair(rng, n=120):
    # two overlapping fragments with small relative motion, se-mode
    # features at raw-RGB scale (cvo.cpp feature_type 1)
    base = rng.standard_normal((n + 30, 3)).astype(np.float32) * 0.4
    feat = (rng.random((n + 30, 5)) * np.array([255, 255, 255, 60, 60])).astype(np.float32)
    xp, xf = base[:n], feat[:n]
    w = np.array([0.01, -0.012, 0.008], np.float32)
    from cvo_rgbd_tpu import se3
    R = np.asarray(se3.exp_so3(w))
    t = np.array([0.02, -0.01, 0.015], np.float32)
    yp = (base[20:20 + n] @ R.T + t).astype(np.float32)
    yf = feat[20:20 + n]
    return xp, xf, yp, yf


def test_align_matches_float64_oracle(rng):
    xp, xf, yp, yf = _pair(rng)
    # fixed 25 iterations: disable early stopping so fp32-vs-fp64
    # trajectory drift is the only difference being measured
    p = CvoParams(max_iter=25, eps=0.0, eps_2=0.0)
    tf_oracle, iters = align_oracle(xp, xf, yp, yf, p)
    assert iters == 24

    x = pad_cloud(xp, xf)
    y = pad_cloud(yp, yf)
    res = align_jit(p, x, y)
    tf = np.asarray(res.tf)
    # trajectory-level agreement after 25 iterations of chaotic-ish
    # dynamics: translations to ~0.1mm, rotations to ~1e-4
    np.testing.assert_allclose(tf[:3, 3], tf_oracle[:3, 3], atol=2e-4)
    np.testing.assert_allclose(tf[:3, :3], tf_oracle[:3, :3], atol=2e-4)


def test_align_oracle_iteration_count_parity(rng):
    """With real stopping rules both implementations stop at the same
    iteration (or within 1 — stopping thresholds are knife-edge)."""
    xp, xf, yp, yf = _pair(rng)
    p = CvoParams(max_iter=300)
    tf_oracle, iters_oracle = align_oracle(xp, xf, yp, yf, p)
    x = pad_cloud(xp, xf)
    y = pad_cloud(yp, yf)
    res = align_jit(p, x, y)
    assert abs(int(res.iterations) - iters_oracle) <= 2
    np.testing.assert_allclose(
        np.asarray(res.tf)[:3, 3], tf_oracle[:3, 3], atol=5e-4
    )
