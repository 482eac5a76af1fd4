"""Pallas fused-kernel tests (interpret mode on CPU) vs the XLA path."""

import numpy as np
import pytest

from cvo_rgbd_tpu import AcvoParams, CvoParams, pad_cloud, se3
from cvo_rgbd_tpu.core import flow as flow_mod
from cvo_rgbd_tpu.core import gram as gram_mod
from cvo_rgbd_tpu.core.step import step_coefficients
from cvo_rgbd_tpu.ops import fused_flow, fused_step_coeffs

CAP = 256  # one TILE
P = CvoParams()


def _pair(rng, n=200, cap=CAP, nfeat=5):
    base = rng.standard_normal((n + 30, 3)).astype(np.float32) * 0.4
    feat = (rng.random((n + 30, 5)) * np.array([255, 255, 255, 60, 60]))
    feat = feat[:, :nfeat].astype(np.float32)
    R = np.asarray(se3.exp_so3(np.array([0.01, -0.012, 0.008], np.float32)))
    t = np.array([0.02, -0.01, 0.015], np.float32)
    yp = (base[20:20 + n] @ R.T + t).astype(np.float32)
    x = pad_cloud(base[:n], feat[:n], capacity=cap)
    y = pad_cloud(yp, feat[20:20 + n], capacity=cap)
    return x, y


def _xla_reference(p, x, y, ell):
    A = gram_mod.se_gram(
        x.positions, x.features, x.mask, y.positions, y.features, y.mask,
        ell, sigma=p.sigma, c_ell=p.c_ell, c_sigma=p.c_sigma,
        sp_thres=p.sp_thres, c_sp_thres=p.c_sp_thres,
    )
    om, v = flow_mod.flow(A, x.positions, y.positions, c=p.c, d=p.d)
    wsq = flow_mod.weighted_sqdist_sum(A, x.positions, y.positions)
    return A, om, v, wsq, flow_mod.nnz(A)


@pytest.mark.parametrize("cap", [256, 512])
def test_fused_flow_matches_xla(rng, cap):
    x, y = _pair(rng, n=cap - 40, cap=cap)
    ell = 0.1
    A, om_ref, v_ref, wsq_ref, nnz_ref = _xla_reference(P, x, y, ell)
    om, v, wsq, nnz, sA = fused_flow(
        x.positions, x.features, x.mask,
        y.positions, y.features, y.mask, ell, p=P, interpret=True,
    )
    # tile-order fp32 accumulation differs from XLA's reduction order
    scale = max(float(np.linalg.norm(np.asarray(om_ref))), 1e-8)
    np.testing.assert_allclose(np.asarray(om), np.asarray(om_ref), rtol=1e-3, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(wsq), float(wsq_ref), rtol=1e-3)
    assert int(nnz) == int(nnz_ref)
    np.testing.assert_allclose(float(sA), float(np.sum(np.asarray(A))), rtol=1e-4)


def test_fused_step_matches_xla(rng):
    x, y = _pair(rng)
    ell = 0.1
    A, om, v, _, _ = _xla_reference(P, x, y, ell)
    B_r, C_r, D_r, E_r = step_coefficients(
        A, x.positions, y.positions, om, v, ell
    )
    B, C, D, E = fused_step_coeffs(
        x.positions, x.features, x.mask,
        y.positions, y.features, y.mask, ell, om, v, p=P, interpret=True,
    )
    for got, ref in [(B, B_r), (C, C_r), (D, D_r), (E, E_r)]:
        np.testing.assert_allclose(float(got), float(ref), rtol=2e-3, atol=1e-6)


def test_fused_flow_masks_padding(rng):
    """Padding rows contribute nothing."""
    x, y = _pair(rng, n=100, cap=256)
    om1, v1, *_ = fused_flow(
        x.positions, x.features, x.mask,
        y.positions, y.features, y.mask, 0.1, p=P, interpret=True,
    )
    # poison the padded region; results must be unchanged
    import jax.numpy as jnp
    xp2 = np.asarray(x.positions).copy()
    xp2[100:] = 7.7
    om2, v2, *_ = fused_flow(
        jnp.asarray(xp2), x.features, x.mask,
        y.positions, y.features, y.mask, 0.1, p=P, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(om1), np.asarray(om2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_capacity_validation(rng):
    x, y = _pair(rng, n=100, cap=256)
    with pytest.raises(ValueError):
        fused_flow(
            x.positions[:100], x.features[:100], x.mask[:100],
            y.positions, y.features, y.mask, 0.1, p=P, interpret=True,
        )


def test_align_pallas_backend_matches_xla(rng):
    """Full align loop with backend='pallas' vs backend='xla'."""
    from cvo_rgbd_tpu import align_jit

    x, y = _pair(rng)
    ref = align_jit(CvoParams(max_iter=40), x, y)
    got = align_jit(CvoParams(max_iter=40, backend="pallas"), x, y)
    np.testing.assert_allclose(
        np.asarray(got.tf), np.asarray(ref.tf), atol=5e-5
    )
    assert abs(int(got.iterations) - int(ref.iterations)) <= 1


def test_align_pallas_linear_mode_matches_xla(rng):
    """MATLAB-protocol (linear CI) params on the pallas backend: the
    cached CI tile + position-kernel gate must reproduce matlab_gram."""
    import dataclasses

    from cvo_rgbd_tpu import MATLAB_PARAMS, align_jit

    x, y = _pair(rng, nfeat=3)
    ref = align_jit(MATLAB_PARAMS, x, y)
    got = align_jit(dataclasses.replace(MATLAB_PARAMS, backend="pallas"),
                    x, y)
    np.testing.assert_allclose(
        np.asarray(got.tf), np.asarray(ref.tf), atol=5e-5
    )
    assert abs(int(got.iterations) - int(ref.iterations)) <= 1


def test_align_pallas_adaptive_matches_xla(rng):
    from cvo_rgbd_tpu import align_jit

    x, y = _pair(rng)
    ref = align_jit(AcvoParams(max_iter=30), x, y)
    got = align_jit(AcvoParams(max_iter=30, backend="pallas"), x, y)
    np.testing.assert_allclose(
        np.asarray(got.tf), np.asarray(ref.tf), atol=5e-5
    )
    assert abs(int(got.iterations) - int(ref.iterations)) <= 1


def test_color_gram_cache_equivalence(rng):
    """fused_flow/fused_step with a color_gram cache must reproduce the
    recompute-every-call results bit-for-bit (same exp, same gates)."""
    import jax.numpy as jnp

    from cvo_rgbd_tpu.ops import color_gram

    p = CvoParams()
    x, y = _pair(rng, cap=256)
    ell = jnp.asarray(0.1, jnp.float32)
    ck = color_gram(x.positions, x.features, x.mask,
                    y.positions, y.features, y.mask, p=p)
    ref = fused_flow(x.positions, x.features, x.mask,
                     y.positions, y.features, y.mask, ell, p=p)
    got = fused_flow(x.positions, x.features, x.mask,
                     y.positions, y.features, y.mask, ell, ck, p=p)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    omega, v = ref[0], ref[1]
    ref_s = fused_step_coeffs(x.positions, x.features, x.mask,
                              y.positions, y.features, y.mask, ell,
                              omega, v, p=p)
    got_s = fused_step_coeffs(x.positions, x.features, x.mask,
                              y.positions, y.features, y.mask, ell,
                              omega, v, ck, p=p)
    for a, b in zip(ref_s, got_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_moments_flow_matches_xla(rng):
    """Single-pass moments -> difference-form flow epilogue vs the XLA
    reference."""
    import jax.numpy as jnp

    from cvo_rgbd_tpu.core.moments import (
        flow_from_moments, monomial_features_padded,
    )
    from cvo_rgbd_tpu.ops import fused_moments

    x, y = _pair(rng)
    ell = 0.1
    A, om_ref, v_ref, wsq_ref, nnz_ref = _xla_reference(P, x, y, ell)

    w = x.mask.astype(jnp.float32)
    c0 = jnp.sum(x.positions * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
    x_c = x.positions - c0
    phi = monomial_features_padded(x_c)
    Mom, nnz = fused_moments(
        x_c, x.features, x.mask, y.positions - c0, y.features, y.mask,
        phi, ell, p=P, interpret=True,
    )
    scale = max(float(np.linalg.norm(np.asarray(om_ref))), 1e-8)
    om, v, wsq, sA = flow_from_moments(Mom, y.positions, c0, c=P.c, d=P.d)
    np.testing.assert_allclose(
        np.asarray(om), np.asarray(om_ref), rtol=1e-3, atol=1e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_ref), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(float(wsq), float(wsq_ref), rtol=1e-3)
    assert int(nnz) == int(nnz_ref)
    np.testing.assert_allclose(
        float(sA), float(np.sum(np.asarray(A))), rtol=1e-4
    )


def test_fused_moments_step_matches_direct(rng):
    """B..E from the moment contraction vs the direct step coefficients."""
    import jax.numpy as jnp

    from cvo_rgbd_tpu.core.moments import (
        monomial_features_padded, step_from_moments,
    )
    from cvo_rgbd_tpu.ops import fused_moments

    x, y = _pair(rng)
    ell = 0.1
    A, om, v, _, _ = _xla_reference(P, x, y, ell)
    B_r, C_r, D_r, E_r = step_coefficients(
        A, x.positions, y.positions, om, v, ell
    )

    w = x.mask.astype(jnp.float32)
    c0 = jnp.sum(x.positions * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
    x_c = x.positions - c0
    Mom, _ = fused_moments(
        x_c, x.features, x.mask, y.positions - c0, y.features, y.mask,
        monomial_features_padded(x_c), ell, p=P, interpret=True,
    )
    B, C, D, E = step_from_moments(Mom, y.positions, c0, om, v, ell)
    for got, ref in [(B, B_r), (C, C_r), (D, D_r), (E, E_r)]:
        np.testing.assert_allclose(float(got), float(ref), rtol=5e-3,
                                   atol=1e-6)


def test_fused_wsq_matches_xla(rng):
    from cvo_rgbd_tpu.ops import fused_wsq

    x, y = _pair(rng)
    ell = 0.1
    A, _, _, wsq_ref, nnz_ref = _xla_reference(P, x, y, ell)
    wsq, nnz = fused_wsq(
        x.positions, x.features, x.mask,
        y.positions, y.features, y.mask, ell, p=P, interpret=True,
    )
    np.testing.assert_allclose(float(wsq), float(wsq_ref), rtol=1e-3)
    assert int(nnz) == int(nnz_ref)


def test_fused_wsq_symmetric_matches_full(rng):
    """Upper-triangle self-sweep == full sweep on a self-pair."""
    from cvo_rgbd_tpu.ops import fused_wsq

    x, _ = _pair(rng)
    ell = 0.1
    full = fused_wsq(
        x.positions, x.features, x.mask,
        x.positions, x.features, x.mask, ell, p=P, interpret=True,
    )
    sym = fused_wsq(
        x.positions, x.features, x.mask,
        x.positions, x.features, x.mask, ell, p=P, symmetric=True,
        interpret=True,
    )
    np.testing.assert_allclose(float(sym[0]), float(full[0]), rtol=1e-5)
    assert int(sym[1]) == int(full[1])


# ---------------------------------------------------------------------------
# Exact AABB tile skipping (VERDICT r4 item 5 generalization): pruned
# tile pairs would contribute exactly zero, so the skip changes no
# computed bit — tile_skip=True must be BITWISE equal to False.
# ---------------------------------------------------------------------------

def _scattered_pair(rng, n=700, cap=1024):
    """Clusters far apart relative to the gate radius, so the AABB
    prune has real work to do at small ell."""
    centers = rng.uniform(-1.5, 1.5, (8, 3)).astype(np.float32)
    pts = np.concatenate([
        c + 0.08 * rng.standard_normal((n // 8, 3)).astype(np.float32)
        for c in centers
    ])
    feat = (rng.random((pts.shape[0], 5)) *
            np.array([255, 255, 255, 60, 60])).astype(np.float32)
    x = pad_cloud(pts, feat, capacity=cap)
    d = 0.01 * rng.standard_normal(pts.shape).astype(np.float32)
    y = pad_cloud(pts + d, feat, capacity=cap)
    return x, y


def test_tile_skip_bounds_are_conservative(rng):
    """Every gated-in pair lies in a tile the prune keeps."""
    from cvo_rgbd_tpu.ops.pallas_gram import aabb_min_d2, block_bounds

    x, y = _scattered_pair(rng)
    tile = 256
    lo_x, hi_x = block_bounds(x.positions, x.mask, tile)
    lo_y, hi_y = block_bounds(y.positions, y.mask, tile)
    md = np.asarray(aabb_min_d2(lo_x, hi_x, lo_y, hi_y))
    d2 = np.sum(
        (np.asarray(x.positions)[:, None, :]
         - np.asarray(y.positions)[None, :, :]) ** 2, axis=-1,
    )
    valid = (np.asarray(x.mask)[:, None] > 0) & (np.asarray(y.mask)[None] > 0)
    d2 = np.where(valid, d2, np.inf)
    blk = d2.reshape(d2.shape[0] // tile, tile,
                     d2.shape[1] // tile, tile).min(axis=(1, 3))
    assert (md <= blk + 1e-6).all()
    # and the prune is non-trivial on this geometry at ell=0.05
    thres = -2 * 0.05 ** 2 * np.log(P.sp_thres / P.sigma ** 2)
    assert (md > thres).mean() > 0.3, (md > thres).mean()


@pytest.mark.parametrize(
    "base", [CvoParams(max_iter=60), AcvoParams(max_iter=60)]
)
def test_align_tile_skip_bitwise_equal(rng, base):
    import dataclasses

    from cvo_rgbd_tpu import align_jit

    x, y = _scattered_pair(rng)
    p_on = dataclasses.replace(base, backend="pallas", tile_skip=True)
    p_off = dataclasses.replace(base, backend="pallas", tile_skip=False)
    a = align_jit(p_on, x, y)
    b = align_jit(p_off, x, y)
    assert np.array_equal(np.asarray(a.tf), np.asarray(b.tf))
    assert int(a.iterations) == int(b.iterations)
    assert np.array_equal(np.asarray(a.ell), np.asarray(b.ell))


def test_acvo_cheb_self_mode_matches_exact(rng):
    """self_mode="cheb" (per-align Chebyshev tables replacing the
    per-iteration self-kernel sweeps — they are functions of ell alone
    by rigid invariance) converges to the same pose as exact sweeps
    within the documented drift."""
    import dataclasses

    from cvo_rgbd_tpu import align_jit

    x, y = _pair(rng, nfeat=5, n=400, cap=512)
    p_ex = AcvoParams(backend="pallas", max_iter=200)
    p_ch = dataclasses.replace(p_ex, self_mode="cheb")
    a = align_jit(p_ex, x, y)
    b = align_jit(p_ch, x, y)
    assert bool(a.converged) and bool(b.converged)
    np.testing.assert_allclose(np.asarray(b.tf), np.asarray(a.tf),
                               atol=5e-4)
