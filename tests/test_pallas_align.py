"""Whole-align Pallas mega-kernel vs the XLA reference path.

Runs in interpret mode on CPU (the kernel logic as plain JAX); the
Mosaic lowering is validated on hardware (docs/PERF.md).
"""

import numpy as np
import pytest

from cvo_rgbd_tpu import CvoParams, MATLAB_PARAMS, AcvoParams, align_jit, pad_cloud, se3
from cvo_rgbd_tpu.ops.pallas_align import align_fused


def _pair(rng, nfeat, n=200, cap=256):
    base = rng.standard_normal((n + 30, 3)).astype(np.float32) * 0.4
    feat = (rng.random((n + 30, 5)) * np.array([255, 255, 255, 60, 60]))
    feat = feat[:, :nfeat].astype(np.float32)
    R = np.asarray(se3.exp_so3(np.array([0.01, -0.012, 0.008], np.float32)))
    t = np.array([0.02, -0.01, 0.015], np.float32)
    yp = (base[20:20 + n] @ R.T + t).astype(np.float32)
    x = pad_cloud(base[:n], feat[:n], capacity=cap)
    y = pad_cloud(yp, feat[20:20 + n], capacity=cap)
    return x, y


@pytest.mark.parametrize("params,nfeat", [
    (CvoParams(max_iter=60), 5),
    (MATLAB_PARAMS, 3),
    (AcvoParams(max_iter=60), 5),
])
def test_fused_matches_xla(rng, params, nfeat):
    x, y = _pair(rng, nfeat)
    ref = align_jit(params, x, y)
    got = align_fused(params, x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(got.tf), np.asarray(ref.tf),
                               atol=2e-5)
    assert int(got.iterations) == int(ref.iterations)
    assert bool(got.converged) == bool(ref.converged)
    # cvo ell comes off a fixed schedule (exact); adaptive ell is a
    # per-iteration dl accumulation — the kernel's direct (x-y)^2
    # distances round differently from the XLA matmul-factored form
    ell_tol = 5e-4 if isinstance(params, AcvoParams) else 1e-6
    np.testing.assert_allclose(float(got.ell), float(ref.ell), atol=ell_tol)


def test_fused_warm_start(rng):
    x, y = _pair(rng, 3)
    R0 = np.asarray(se3.exp_so3(np.array([0.005, 0.003, -0.002], np.float32)))
    T0 = np.array([0.01, 0.0, -0.005], np.float32)
    ref = align_jit(MATLAB_PARAMS, x, y, R0, T0)
    got = align_fused(MATLAB_PARAMS, x, y, R0, T0, interpret=True)
    np.testing.assert_allclose(np.asarray(got.tf), np.asarray(ref.tf),
                               atol=2e-5)
    assert int(got.iterations) == int(ref.iterations)


def test_ell0_seed_matches_across_backends(rng):
    """`ell0` seeds the length-scale state (the reference cvo carries
    ell across pairs, cvo.cpp:408-410): explicit ell_init reproduces the
    default exactly, a carried-over ell changes iterations 0-2 only,
    and the fused kernel agrees with XLA for both."""
    x, y = _pair(rng, 3)
    base = align_jit(MATLAB_PARAMS, x, y)
    seeded = align_jit(MATLAB_PARAMS, x, y, ell0=MATLAB_PARAMS.ell_init)
    np.testing.assert_array_equal(np.asarray(seeded.tf), np.asarray(base.tf))
    assert int(seeded.iterations) == int(base.iterations)

    carried = align_jit(MATLAB_PARAMS, x, y, ell0=0.03)
    fused = align_fused(MATLAB_PARAMS, x, y, ell0=0.03, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.tf), np.asarray(carried.tf),
                               atol=2e-5)
    assert int(fused.iterations) == int(carried.iterations)
    # the early iterations really ran at the carried ell: the align
    # differs from the cold start (before the absolute schedule resets
    # ell at k>2)
    assert not np.allclose(np.asarray(carried.tf), np.asarray(base.tf),
                           atol=1e-7) or (
        int(carried.iterations) != int(base.iterations)
    )


def test_fused_self_registration_identity(rng):
    x, _ = _pair(rng, 3)
    res = align_fused(MATLAB_PARAMS, x, x, interpret=True)
    assert int(res.iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.tf),
                                  np.eye(4, dtype=np.float32))


def test_fused_empty_moving(rng):
    x, _ = _pair(rng, 3)
    empty = pad_cloud(np.zeros((0, 3), np.float32),
                      np.zeros((0, 3), np.float32), capacity=256)
    res = align_fused(MATLAB_PARAMS, x, empty, interpret=True)
    assert int(res.iterations) == 0
    assert np.isfinite(np.asarray(res.tf)).all()


def test_fused_rejects_quirk_and_oversize(rng):
    x, y = _pair(rng, 5)
    with pytest.raises((ValueError, TypeError)):
        align_fused(AcvoParams(yy_quirk=True), x, y, interpret=True)
    # capacities beyond the tiled kernel's resident budget still raise
    big = pad_cloud(np.zeros((0, 3), np.float32),
                    np.zeros((0, 5), np.float32), capacity=32768)
    with pytest.raises(ValueError):
        align_fused(CvoParams(), big, big, interpret=True)


def test_fused_via_backend_param(rng):
    """backend='fused' routes core.registration.align to the kernel."""
    import dataclasses

    x, y = _pair(rng, 3)
    p = dataclasses.replace(MATLAB_PARAMS, backend="fused")
    ref = align_jit(MATLAB_PARAMS, x, y)
    got = align_jit(p, x, y)
    np.testing.assert_allclose(np.asarray(got.tf), np.asarray(ref.tf),
                               atol=2e-5)
    assert int(got.iterations) == int(ref.iterations)


def test_fused_fallback_routes_ineligible_problems(rng):
    """backend='fused' on problems the kernel cannot hold must fall
    back to the standard backends instead of raising (the CLI default
    num_want=3000 exceeds the VMEM pair budget)."""
    import dataclasses

    from cvo_rgbd_tpu import align_jit

    # oversize: capacity 2048 -> 4M pairs > 1<<20
    x, y = _pair(rng, 5, n=300, cap=2048)
    p = CvoParams(max_iter=30, backend="fused")
    ref = align_jit(CvoParams(max_iter=30, backend="pallas"), x, y)
    got = align_jit(p, x, y)
    np.testing.assert_allclose(np.asarray(got.tf), np.asarray(ref.tf),
                               atol=2e-5)

    # the yy_quirk emulation falls back (to xla — the only backend
    # implementing it)
    xa, ya = _pair(rng, 5)
    pa = AcvoParams(max_iter=20, backend="fused", yy_quirk=True)
    ref_a = align_jit(AcvoParams(max_iter=20, yy_quirk=True), xa, ya)
    got_a = align_jit(pa, xa, ya)
    np.testing.assert_allclose(np.asarray(got_a.tf), np.asarray(ref_a.tf),
                               atol=2e-5)


def test_fused_vmap_batched_matches_per_pair(rng):
    """vmap over align_fused (lowered to a Pallas grid dimension — the
    bench.py headline path via align_batched(backend='fused')): each
    lane must match its own single-pair run exactly, with no
    cross-lane convergence coupling."""
    import jax

    from cvo_rgbd_tpu.core.cloud import stack_clouds

    ps = [_pair(rng, 3) for _ in range(3)]
    fb = stack_clouds([x for x, _ in ps])
    mb = stack_clouds([y for _, y in ps])
    vf = jax.vmap(lambda f, m: align_fused(MATLAB_PARAMS, f, m,
                                           interpret=True))
    out = vf(fb, mb)
    for i, (x, y) in enumerate(ps):
        one = align_fused(MATLAB_PARAMS, x, y, interpret=True)
        np.testing.assert_array_equal(np.asarray(out.tf)[i],
                                      np.asarray(one.tf))
        assert int(np.asarray(out.iterations)[i]) == int(one.iterations)


def test_ck_cache_opt_out_matches(rng):
    """ck_cache=False (memory-bound opt-out) is numerically identical."""
    import dataclasses

    from cvo_rgbd_tpu import align_jit

    x, y = _pair(rng, 5)
    on = align_jit(CvoParams(max_iter=30, backend="pallas"), x, y)
    off = align_jit(CvoParams(max_iter=30, backend="pallas",
                              ck_cache=False), x, y)
    np.testing.assert_array_equal(np.asarray(on.tf), np.asarray(off.tf))
    assert int(on.iterations) == int(off.iterations)


def test_fused_fallback_unaligned_capacity_routes_to_xla(rng):
    """A hand-built cloud whose capacity is a multiple of 8 but not 128
    and which is ALSO fused-ineligible for size must fall back to xla
    (the per-iteration pallas backend tiles in 128-lane blocks and would
    raise).  pad_cloud always produces 128-multiples, so only hand-built
    clouds hit this; the fallback is advertised as never raising."""
    x, y = _pair(rng, 5, n=300, cap=1032)  # 1032 % 128 != 0; 1032^2 > 1<<20
    p = CvoParams(max_iter=30, backend="fused")
    ref = align_jit(CvoParams(max_iter=30), x, y)  # xla
    got = align_jit(p, x, y)
    np.testing.assert_allclose(np.asarray(got.tf), np.asarray(ref.tf),
                               atol=2e-5)


# ---------------------------------------------------------------------------
# Reference-scale TILED mega-kernel (VERDICT r4 item 4): clouds beyond
# the resident VMEM budget run a per-iteration tile sweep with momT
# scratch accumulation + AABB tile pruning, inside the same
# while-loop-on-scalar-carries kernel.
# ---------------------------------------------------------------------------

def _mid_pair(rng, nfeat=5, n=1300, cap=1536):
    return _pair(rng, nfeat, n=n, cap=cap)


@pytest.mark.parametrize("base,nfeat", [
    (CvoParams(max_iter=40, eps=5e-4, eps_2=1e-4), 5),
    (MATLAB_PARAMS, 3),
    (AcvoParams(max_iter=40, eps=5e-4, eps_2=1e-4), 5),
])
def test_tiled_fused_matches_pallas_backend(rng, base, nfeat):
    import dataclasses

    from cvo_rgbd_tpu.ops.pallas_align import _fused_mode

    x, y = _mid_pair(rng, nfeat)
    p_f = dataclasses.replace(base, backend="fused")
    p_p = dataclasses.replace(base, backend="pallas")
    assert _fused_mode(p_f, x, y) == "tiled"
    a = align_jit(p_f, x, y)
    b = align_jit(p_p, x, y)
    # coarse-stop skew class (docs/PARITY.md section 1): both converge,
    # poses agree at the sub-mm scale
    np.testing.assert_allclose(np.asarray(a.tf), np.asarray(b.tf),
                               atol=1e-3)
    assert bool(a.converged) and bool(b.converged)


def test_tiled_fused_skip_off_matches_on(rng):
    """AABB tile pruning in the tiled kernel is exact: identical
    results with the prune disabled."""
    import dataclasses

    x, y = _mid_pair(rng)
    p_on = CvoParams(max_iter=30, backend="fused", tile_skip=True)
    p_off = dataclasses.replace(p_on, tile_skip=False)
    a = align_jit(p_on, x, y)
    b = align_jit(p_off, x, y)
    np.testing.assert_array_equal(np.asarray(a.tf), np.asarray(b.tf))
    assert int(a.iterations) == int(b.iterations)


def test_tiled_fused_self_registration(rng):
    x, _ = _mid_pair(rng)
    p = CvoParams(backend="fused")
    res = align_jit(p, x, x)
    assert int(res.iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.tf),
                                  np.eye(4, dtype=np.float32))
