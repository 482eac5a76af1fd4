"""Keyframe selection tests."""

import numpy as np

from cvo_rgbd_tpu import AcvoParams, pad_cloud
from cvo_rgbd_tpu.keyframes import KeyframePolicy, KeyframeSelector, keyframe_score

P = AcvoParams()


def _cloud(rng, offset=0.0, n=60):
    pos = rng.standard_normal((n, 3)).astype(np.float32) * 0.4
    pos[:, 0] += offset
    feat = rng.random((n, 5)).astype(np.float32) * 0.5
    return pad_cloud(pos, feat)


def test_score_self_is_one(rng):
    c = _cloud(rng)
    assert abs(keyframe_score(P, c, c) - 1.0) < 1e-5


def test_score_decreases_with_offset(rng):
    base = np.random.default_rng(3)
    c0 = _cloud(base)
    scores = []
    for off in [0.0, 0.05, 0.2]:
        b2 = np.random.default_rng(3)
        scores.append(keyframe_score(P, c0, _cloud(b2, offset=off)))
    assert scores[0] > scores[1] >= scores[2] - 1e-6


def test_selector_promotes_on_low_overlap(rng):
    sel = KeyframeSelector(P, KeyframePolicy(threshold=0.9, max_span=100))
    base = np.random.default_rng(5)
    c0 = _cloud(base)
    new, s = sel.update(0, c0)
    assert new and sel.key_index == 0
    # same cloud: no promotion
    new, s = sel.update(1, c0)
    assert not new
    # far-away cloud: promotion
    far = np.random.default_rng(5)
    new, s = sel.update(2, _cloud(far, offset=1.0))
    assert new and sel.key_index == 2


def test_selector_max_span(rng):
    sel = KeyframeSelector(P, KeyframePolicy(threshold=0.0, max_span=2))
    c = _cloud(rng)
    sel.update(0, c)
    assert not sel.update(1, c)[0]
    assert sel.update(2, c)[0]  # forced by span


def test_function_inner_product_ell_argument(rng):
    """The reference evaluates at the *current* member ell
    (adaptive_cvo.cpp:393); the ell argument exposes that, defaulting to
    ell_init.  A larger ell admits more pairs -> different score."""
    from cvo_rgbd_tpu.core.registration import function_inner_product

    p = AcvoParams()
    a, b = _cloud(rng), _cloud(rng, offset=0.05)
    default = float(function_inner_product(p, a, b))
    at_init = float(function_inner_product(p, a, b, ell=p.ell_init))
    wide = float(function_inner_product(p, a, b, ell=5.0 * p.ell_init))
    assert default == at_init
    assert wide != default
    assert np.isfinite(wide)
