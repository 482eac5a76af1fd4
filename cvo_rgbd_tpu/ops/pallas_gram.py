"""Pallas TPU kernels: fused Gram + flow / line-search reductions.

The XLA path materializes the [N, M] Gram matrix in HBM and re-reads
it for the flow and step reductions.  These kernels evaluate the
kernel tile-by-tile in VMEM and accumulate the *reductions only* —
the Gram matrix never exists in memory (SURVEY.md section 7 step 3):

- `fused_flow`: one pass producing omega, v (cvo.cpp:164-210) plus the
  A-weighted squared-distance sum and nnz used by adaptive CVO
  (adaptive_cvo.cpp:222-271).
- `fused_step_coeffs`: second pass (after omega/v are known) producing
  the quartic line-search coefficients B, C, D, E (cvo.cpp:213-289).

Mosaic-portability notes (all hit on real v5e hardware):
- every coordinate/feature/mask is its own ref: x-planes as [N,1]
  arrays blocked (TI, 1) (columns), y-planes as [1,N] arrays blocked
  (1, TJ) (rows).  Any column slice of a packed (N, k) block, row
  slice of a (k, N) block, or 1-D->column reshape is an "Offset
  change"/relayout Mosaic rejects; (TI,1)x(1,TJ) broadcasts need none;
- no rank-1 dot_general, no 3x3 matmuls: derivative fields use the
  recursion xi^{k+1}z = omega x (xi^k z) on (1,TJ) rows;
- accumulators update as one vectorized (8, 128) add (scalar stores to
  VMEM are not lowerable).

Both passes recompute the A tile from the clouds — exp is cheap, HBM
is not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvo_rgbd_tpu.core.numerics import exp_neg

# preferred row/col tile sizes; capacities that are multiples of 128 but
# not 256 fall back to 128-tiles (pad_cloud guarantees 128-alignment)
def _tile(n):
    if n % 256 == 0:
        return 256
    if n % 128 == 0:
        return 128
    raise ValueError(f"cloud capacity {n} must be a multiple of 128")


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


NPLANES = 3 + 5 + 1  # planes per cloud: x,y,z, f0..f4, mask


def _acc_update(vals):
    """(8,128) tensor with vals in row 0 — single vectorized add."""
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    upd = jnp.zeros((8, 128), jnp.float32)
    for idx, val in enumerate(vals):
        upd = upd + jnp.where((row == 0) & (col == idx), val, 0.0)
    return upd


def _read_planes(refs):
    """9 refs -> ((x0,x1,x2), (f0..f4), mask), each (T,1) or (1,T)."""
    vals = [r[:, :] for r in refs]
    return tuple(vals[0:3]), tuple(vals[3:8]), vals[8]


def _pair_tile(xrefs, yrefs, scal, ck_ref=None, linear=False,
               fast_exp=False):
    """A tile + d2 tile from (TI,1) x-columns and (1,TJ) y-rows.

    With `ck_ref`, the (gated, masked) color kernel is READ from a
    cached [N,M] tile instead of recomputed — it is loop-invariant
    across align iterations (features never transform, c_ell is fixed;
    cvo.cpp:143-153), and at reference scale the 5-feature distance +
    exp is ~40% of the per-pair VPU work.  `color_gram` below builds
    the cache with zeros exactly where the color gate or the validity
    masks fail, so `a > sp_thres` reproduces the full reference gate.

    `linear` is MATLAB mode (rkhs_se3_registration.m:125-127): ck_ref
    holds the masked linear CI tile (inherently loop-invariant — the
    MATLAB class precomputes it once per pair), the gate is on the
    position kernel alone, and A = CI .* K.

    `fast_exp` (params.exp_mode="fast"): hardware exp instead of the
    libm-grade exp_neg — ~30% cheaper tile pass, converges at the
    MATLAB stops but NOT at the C++ 5e-5 set (core/numerics.py).
    """
    _exp = (lambda z: jnp.exp(-z)) if fast_exp else exp_neg
    (ell, s2, cs2, inv_2l2, inv_2cl2, d2_thres, d2_c_thres, sp_thres) = scal
    (x0, x1, x2), xf, xm = _read_planes(xrefs)
    (y0, y1, y2), yf, ym = _read_planes(yrefs)

    def psq(a, b):
        d = a - b          # (TI,1) - (1,TJ) -> (TI,TJ)
        return d * d

    d2 = psq(x0, y0) + psq(x1, y1) + psq(x2, y2)
    k = s2 * _exp(d2 * inv_2l2)

    if linear:
        gate = k >= sp_thres
        return jnp.where(gate, ck_ref[:, :] * k, 0.0), d2

    if ck_ref is not None:
        a = k * ck_ref[:, :]
        gate = (d2 < d2_thres) & (a > sp_thres)
        return jnp.where(gate, a, 0.0), d2

    d2c = psq(xf[0], yf[0])
    for c in range(1, 5):
        d2c = d2c + psq(xf[c], yf[c])
    ck = cs2 * _exp(d2c * inv_2cl2)
    a = k * ck
    gate = (
        (d2 < d2_thres)
        & (d2c < d2_c_thres)
        & (a > sp_thres)
        & (xm > 0)
        & (ym > 0)
    )
    return jnp.where(gate, a, 0.0), d2


def _unpack_scal(s_ref):
    return tuple(s_ref[0, i] for i in range(8))


def _make_flow_kernel(use_ck, linear=False, fast_exp=False):
    def kernel(s_ref, *refs):
        return _flow_body(s_ref, refs, use_ck, linear, fast_exp)

    return kernel


def _flow_body(s_ref, refs, use_ck, linear=False, fast_exp=False):
    """refs: 9 x-planes, 9 y-planes, [ck,] acc.  Accumulator row 0: 0-2
    omega*c, 3-5 v*d, 6 sum A|x-y|^2, 7 nnz, 8 sum A."""
    xrefs, yrefs = refs[:9], refs[9:18]
    ck_ref = refs[18] if use_ck else None
    acc_ref = refs[19] if use_ck else refs[18]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    scal = _unpack_scal(s_ref)
    A, d2 = _pair_tile(xrefs, yrefs, scal, ck_ref, linear, fast_exp)
    (x0, x1, x2), _, _ = _read_planes(xrefs)   # (TI,1)
    (y0, y1, y2), _, _ = _read_planes(yrefs)   # (1,TJ)

    # difference-form flow residuals (see core/flow.py: the factored
    # col@y - row@x form's fp32 cancellation noise blocks the C++
    # eps=5e-5 stop at reference scale); r cancels per row before any
    # big reduction.  omega = sum x_i x r_i exactly (x x x = 0).
    row = jnp.sum(A, axis=1, keepdims=True)        # (TI,1)
    r0 = jnp.sum(A * y0, axis=1, keepdims=True) - row * x0
    r1 = jnp.sum(A * y1, axis=1, keepdims=True) - row * x1
    r2 = jnp.sum(A * y2, axis=1, keepdims=True) - row * x2

    om0 = jnp.sum(x1 * r2 - x2 * r1)
    om1 = jnp.sum(x2 * r0 - x0 * r2)
    om2 = jnp.sum(x0 * r1 - x1 * r0)
    v0 = jnp.sum(r0)
    v1 = jnp.sum(r1)
    v2 = jnp.sum(r2)

    wsq = jnp.sum(A * d2)
    nnz = jnp.sum((A > 0).astype(jnp.float32))
    sA = jnp.sum(A)

    acc_ref[:, :] += _acc_update([om0, om1, om2, v0, v1, v2, wsq, nnz, sA])


def _make_step_kernel(use_ck, linear=False, fast_exp=False):
    def kernel(s_ref, wv_ref, *refs):
        return _step_body(s_ref, wv_ref, refs, use_ck, linear, fast_exp)

    return kernel


def _step_body(s_ref, wv_ref, refs, use_ck, linear=False,
               fast_exp=False):
    """refs: 9 x-planes, 9 y-planes, [ck,] acc.  Accumulator row 0: 0 B,
    1 C, 2 D, 3 E (cvo.cpp:249-289)."""
    xrefs, yrefs = refs[:9], refs[9:18]
    ck_ref = refs[18] if use_ck else None
    acc_ref = refs[19] if use_ck else refs[18]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    scal = _unpack_scal(s_ref)
    ell = scal[0]
    w0, w1, w2 = wv_ref[0, 0], wv_ref[0, 1], wv_ref[0, 2]
    v0, v1, v2 = wv_ref[0, 3], wv_ref[0, 4], wv_ref[0, 5]

    A, _ = _pair_tile(xrefs, yrefs, scal, ck_ref, linear, fast_exp)
    (x0, x1, x2), _, _ = _read_planes(xrefs)   # (TI,1)
    (y0, y1, y2), _, _ = _read_planes(yrefs)   # (1,TJ)

    # xi^{k+1}z = omega x (xi^k z) (cvo.cpp:226-238), column arithmetic
    def wcross(a0, a1, a2):
        return (w1 * a2 - w2 * a1, w2 * a0 - w0 * a2, w0 * a1 - w1 * a0)

    xiz = wcross(y0, y1, y2)
    xiz = (xiz[0] + v0, xiz[1] + v1, xiz[2] + v2)
    xi2z = wcross(*xiz)
    xi3z = wcross(*xi2z)
    xi4z = wcross(*xi3z)

    def vdot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    normxiz2 = vdot(xiz, xiz)            # (1,TJ)
    xiz_dot_xi2z = -vdot(xiz, xi2z)
    epsil_const = vdot(xi2z, xi2z) + 2.0 * vdot(xiz, xi3z)

    def dotfield(wf):
        # wf components are (1,TJ) rows; x columns broadcast against them
        s = x0 * wf[0] + x1 * wf[1] + x2 * wf[2]
        wy = wf[0] * y0 + wf[1] * y1 + wf[2] * y2
        return s - wy

    tc = 1.0 / (2.0 * ell * ell)
    beta = -2.0 * tc * dotfield(xiz)
    gamma = -tc * (normxiz2 + 2.0 * dotfield(xi2z))
    delta = 2.0 * tc * (xiz_dot_xi2z - dotfield(xi3z))
    epsil = -tc * (epsil_const + 2.0 * dotfield(xi4z))

    beta2 = beta * beta
    bg = beta * gamma
    acc_ref[:, :] += _acc_update([
        jnp.sum(A * beta),
        jnp.sum(A * (gamma + 0.5 * beta2)),
        jnp.sum(A * (delta + bg + beta2 * beta / 6.0)),
        jnp.sum(
            A * (epsil + beta * delta + 0.5 * beta2 * gamma
                 + 0.5 * gamma * gamma + beta2 * beta2 / 24.0)
        ),
    ])


def _scal_vector(ell, p):
    s2 = p.sigma * p.sigma
    cs2 = p.c_sigma * p.c_sigma
    ell = jnp.asarray(ell, jnp.float32)
    d2_thres = -2.0 * ell * ell * jnp.log(p.sp_thres / s2)
    d2_c_thres = jnp.asarray(
        -2.0 * p.c_ell * p.c_ell * jnp.log(p.c_sp_thres / cs2), jnp.float32
    )
    return jnp.stack([
        ell,
        jnp.asarray(s2, jnp.float32),
        jnp.asarray(cs2, jnp.float32),
        1.0 / (2.0 * ell * ell),
        jnp.asarray(1.0 / (2.0 * p.c_ell * p.c_ell), jnp.float32),
        d2_thres,
        d2_c_thres,
        jnp.asarray(p.sp_thres, jnp.float32),
    ]).reshape(1, 8)


def _pad_feat(feat):
    """Zero-pad features to the 5-plane layout (linear-mode clouds
    carry 3 color features; the padded planes are never read when a
    cached color tile is in use, but the ref count is fixed)."""
    k = feat.shape[1]
    if k == 5:
        return feat
    return jnp.concatenate(
        [feat, jnp.zeros((feat.shape[0], 5 - k), feat.dtype)], axis=1
    )


def _pack_x(pos, feat, mask):
    """x-side planes: nine [N,1] column arrays."""
    feat = _pad_feat(feat)
    cols = [pos[:, k:k+1] for k in range(3)]
    cols += [feat[:, k:k+1] for k in range(5)]
    cols.append(mask.reshape(-1, 1))
    return cols


def _pack_y(pos, feat, mask):
    """y-side planes: nine [1,N] row arrays."""
    feat = _pad_feat(feat)
    rows = [pos[:, k].reshape(1, -1) for k in range(3)]
    rows += [feat[:, k].reshape(1, -1) for k in range(5)]
    rows.append(mask.reshape(1, -1))
    return rows


def _specs(n, m):
    ti, tj = _tile(n), _tile(m)
    smem = pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    xspec = [
        pl.BlockSpec((ti, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    ] * NPLANES
    yspec = [
        pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    ] * NPLANES
    out = pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    return (n // ti, m // tj), smem, xspec, yspec, out


def _check(n, m):
    _tile(n), _tile(m)


# ---------------------------------------------------------------------------
# Exact tile-level sparsity skipping (the kd-tree radius pruning of
# cvo.cpp:102, 119-125 reborn at MXU-tile granularity)
# ---------------------------------------------------------------------------

def block_bounds(pos, mask, tile):
    """Per-tile AABBs of the valid points: [nb,3] lo and hi.

    Invalid slots are excluded via +/-inf sentinels; an all-invalid
    tile gets lo=+inf / hi=-inf, which makes every pairwise lower
    bound +inf — i.e. padding tiles are skipped outright (their Gram
    entries are exactly 0 through the mask gate anyway)."""
    n = pos.shape[0]
    nb = n // tile
    p = pos.reshape(nb, tile, 3)
    valid = (mask.reshape(nb, tile) > 0)[..., None]
    lo = jnp.min(jnp.where(valid, p, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(valid, p, -jnp.inf), axis=1)
    return lo, hi


def aabb_min_d2(lo_x, hi_x, lo_y, hi_y):
    """[nbx, nby] lower bounds on the pairwise squared distance between
    any point of x-tile i and any point of y-tile j.

    The bound is exact-conservative: min_d2[i, j] > d2_thres implies
    EVERY pair in the tile fails the position gate (d2 < d2_thres,
    cvo.cpp:119-125), so the tile's Gram block is exactly zero and the
    kernels may skip it without changing a single computed bit."""
    gap1 = lo_y[None, :, :] - hi_x[:, None, :]
    gap2 = lo_x[:, None, :] - hi_y[None, :, :]
    gap = jnp.maximum(jnp.maximum(gap1, gap2), 0.0)
    return jnp.sum(gap * gap, axis=-1)


def _min_d2_spec(nbi, nbj):
    return pl.BlockSpec((nbi, nbj), lambda *_: (0, 0),
                        memory_space=pltpu.SMEM)


def _color_kernel(s_ref, *refs):
    """Cached color kernel tile: cs2*exp(-d2c/2cl^2) with zeros where
    the color gate (cvo.cpp:148) or the validity masks fail."""
    xrefs, yrefs, out_ref = refs[:9], refs[9:18], refs[18]
    scal = _unpack_scal(s_ref)
    (_, _, cs2, _, inv_2cl2, _, d2_c_thres, _) = scal
    _, xf, xm = _read_planes(xrefs)
    _, yf, ym = _read_planes(yrefs)
    d2c = (xf[0] - yf[0]) * (xf[0] - yf[0])
    for c in range(1, 5):
        d = xf[c] - yf[c]
        d2c = d2c + d * d
    ck = cs2 * exp_neg(d2c * inv_2cl2)
    gate = (d2c < d2_c_thres) & (xm > 0) & (ym > 0)
    out_ref[:, :] = jnp.where(gate, ck, 0.0)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def color_gram(xp, xf, xm, yp, yf, ym, *, p, interpret=None):
    """[N,M] masked color-kernel cache for `fused_flow(..., ck=...)` /
    `fused_step_coeffs(..., ck=...)`.

    Loop-invariant across align iterations: features never transform
    and c_ell is fixed, so evaluating this once per pair removes the
    5-feature distance + exp (~40% of per-pair VPU work) from every
    iteration of both passes.
    """
    interpret = _auto_interpret(interpret)
    n, m = xp.shape[0], yp.shape[0]
    _check(n, m)
    ti, tj = _tile(n), _tile(m)
    smem = pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    xspec = [pl.BlockSpec((ti, 1), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)] * NPLANES
    yspec = [pl.BlockSpec((1, tj), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)] * NPLANES
    out = pl.BlockSpec((ti, tj), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _color_kernel,
        grid=(n // ti, m // tj),
        in_specs=[smem] + xspec + yspec,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(_scal_vector(jnp.asarray(p.ell_init, jnp.float32), p),
      *_pack_x(xp, xf, xm), *_pack_y(yp, yf, ym))


def _ck_spec(n, m):
    ti, tj = _tile(n), _tile(m)
    return pl.BlockSpec((ti, tj), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_flow(xp, xf, xm, yp, yf, ym, ell, ck=None, *, p, interpret=None):
    """Fused gram+flow: returns (omega, v, wsq_sum, nnz, sum_A).

    Pass `ck` (from `color_gram`) to read the loop-invariant color
    kernel instead of recomputing it per call.  In linear color mode
    (p.color_mode == "linear") `ck` is REQUIRED and holds the masked
    CI tile from `linear_ci_cache`."""
    interpret = _auto_interpret(interpret)
    linear = p.color_mode == "linear"
    fast_exp = getattr(p, "exp_mode", "precise") == "fast"
    if linear and ck is None:
        raise ValueError("linear color mode requires the ci cache")
    n, m = xp.shape[0], yp.shape[0]
    _check(n, m)
    grid, smem, xspec, yspec, out = _specs(n, m)
    use_ck = ck is not None
    extra_spec = [_ck_spec(n, m)] if use_ck else []
    extra = (ck,) if use_ck else ()
    acc = pl.pallas_call(
        _make_flow_kernel(use_ck, linear, fast_exp),
        grid=grid,
        in_specs=[smem] + xspec + yspec + extra_spec,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(_scal_vector(ell, p), *_pack_x(xp, xf, xm), *_pack_y(yp, yf, ym),
      *extra)
    omega = acc[0, 0:3] / p.c
    v = acc[0, 3:6] / p.d
    return omega, v, acc[0, 6], acc[0, 7], acc[0, 8]


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_step_coeffs(xp, xf, xm, yp, yf, ym, ell, omega, v, ck=None, *, p,
                      interpret=None):
    """Fused gram+line-search coefficients: returns (B, C, D, E)."""
    interpret = _auto_interpret(interpret)
    n, m = xp.shape[0], yp.shape[0]
    _check(n, m)
    grid, smem, xspec, yspec, out = _specs(n, m)
    wv = jnp.zeros((1, 8), jnp.float32)
    wv = wv.at[0, 0:3].set(omega).at[0, 3:6].set(v)
    wv_spec = pl.BlockSpec((1, 8), lambda i, j: (0, 0),
                           memory_space=pltpu.SMEM)
    use_ck = ck is not None
    linear = p.color_mode == "linear"
    fast_exp = getattr(p, "exp_mode", "precise") == "fast"
    if linear and ck is None:
        raise ValueError("linear color mode requires the ci cache")
    extra_spec = [_ck_spec(n, m)] if use_ck else []
    extra = (ck,) if use_ck else ()
    acc = pl.pallas_call(
        _make_step_kernel(use_ck, linear, fast_exp),
        grid=grid,
        in_specs=[smem, wv_spec] + xspec + yspec + extra_spec,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(_scal_vector(ell, p), wv, *_pack_x(xp, xf, xm), *_pack_y(yp, yf, ym),
      *extra)
    return acc[0, 0], acc[0, 1], acc[0, 2], acc[0, 3]
