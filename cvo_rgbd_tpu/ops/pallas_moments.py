"""Single-pass Pallas moment kernel: ONE Gram-tile sweep per iteration.

The two-pass kernels in pallas_gram.py evaluate the masked Gram tile
twice per align iteration (flow, then line-search coefficients — the
reference's two nnz(A) traversals, cvo.cpp:164-308).  This kernel
replaces both with a single sweep accumulating the omega-independent
moment matrix

    Mom = A^T Phi(x')          [M, 35 monomials, lane-padded to 128]

(one [TI,TJ]x[TI,128] MXU contraction per tile) plus the nnz count.
Everything the iteration needs — omega, v, the adaptive weighted
squared-distance sum, and B..E — is then an O(M) epilogue
(core/moments.py).  A is evaluated exactly as in pallas_gram (same
gates, same cached color kernel), so the reductions match the two-pass
backend up to fp32 summation order.

`fused_wsq` is the lean companion for the adaptive self-kernels
(Axx/Ayy, adaptive_cvo.cpp:156-160): those only feed the dl reduction,
which needs just sum A*d2 and nnz — no moments, no flow.

Mosaic notes (inherited from pallas_gram.py): planes as (TI,1)/(1,TJ)
arrays, vectorized (8,128) accumulator updates, and the moment
contraction as a full-rank dot_general (contract dim 0 with dim 0 —
no narrow-block relayouts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvo_rgbd_tpu.ops.pallas_gram import (
    NPLANES,
    _acc_update,
    _auto_interpret,
    _check,
    _min_d2_spec,
    _pack_x,
    _pack_y,
    _pair_tile,
    _scal_vector,
    _tile,
    _unpack_scal,
)

MOM_WIDTH = 128  # lane-aligned moment width (35 real columns)

# Conservative margin on the tile-skip comparison: the AABB bound is
# computed from (possibly differently-rounded) coordinates than the
# in-kernel d2, so a boundary-hair pair could gate IN while the bound
# says OUT.  d2 fp32 noise is ~3e-8 m^2 at scene scale; 1e-5 m^2 of
# slack skips essentially nothing extra and makes the skip exact.
SKIP_MARGIN = 1e-5


def _make_moments_kernel(use_ck, ti, linear=False, fast_exp=False,
                         use_skip=False):
    def kernel(s_ref, *refs):
        return _moments_body(s_ref, refs, use_ck, ti, linear, fast_exp,
                             use_skip)

    return kernel


def _moments_body(s_ref, refs, use_ck, ti, linear=False,
                  fast_exp=False, use_skip=False):
    """refs: 9 x-planes, 9 y-planes, phi, [ck,] [min_d2,] mom_out,
    acc_out.

    Grid is (j, i) with i innermost so the [TJ, 128] moment block stays
    VMEM-resident while the row tiles of its column sweep by.  Phi is
    passed as ONE whole-array block ([N,128] = 1.6 MB at reference
    scale): loaded into VMEM once for the whole sweep instead of
    re-fetched from HBM for every j-tile; the kernel row-slices it.

    Flow comes from Mom via the difference-form epilogue
    (core/moments.py flow_from_moments: r_j = S0_j y'_j - S1'_j per
    moment column) — verified on-chip to converge at the C++ shipped
    stops identically to an in-kernel per-row residual accumulation
    (8/8 pairs, ~60 iterations both ways) once every SE(3) matmul is
    precision-pinned; the Mom-based epilogue is ~15% cheaper per
    iteration, so it is the production path (docs/PERF.md round-4
    study).

    `use_skip`: an SMEM [nbi, nbj] matrix of AABB lower bounds on the
    tile-pair squared distance gates the whole tile body — tiles whose
    bound exceeds the position-gate radius d2_thres contribute exactly
    zero (every entry fails d2 < d2_thres, cvo.cpp:119-125), so
    skipping them changes no computed bit.  This is the reference's
    kd-tree radius pruning at MXU-tile granularity; at the converged
    length-scales (ell 0.03-0.06 -> 2-4 cm gate radius) most tiles of
    a room-scale cloud skip.

    Accumulator row 0: col 0 nnz."""
    xrefs, yrefs = refs[:9], refs[9:18]
    phi_ref = refs[18]
    idx = 19
    ck_ref = None
    md_ref = None
    if use_ck:
        ck_ref = refs[idx]
        idx += 1
    if use_skip:
        md_ref = refs[idx]
        idx += 1
    mom_ref, acc_ref = refs[idx], refs[idx + 1]
    j = pl.program_id(0)
    i = pl.program_id(1)

    scal = _unpack_scal(s_ref)

    @pl.when(i == 0)
    def _():
        mom_ref[:, :] = jnp.zeros_like(mom_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def work():
        A, _ = _pair_tile(xrefs, yrefs, scal, ck_ref, linear, fast_exp)
        phi_tile = phi_ref[pl.ds(i * ti, ti), :]
        contrib = jax.lax.dot_general(
            A,
            phi_tile,
            (((0,), (0,)), ((), ())),          # A^T @ Phi -> [TJ, 128]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        mom_ref[:, :] += contrib
        nnz = jnp.sum((A > 0).astype(jnp.float32))
        acc_ref[:, :] += _acc_update([nnz])

    if use_skip:
        d2_thres = scal[5]

        @pl.when(md_ref[i, j] <= d2_thres + SKIP_MARGIN)
        def _():
            work()
    else:
        work()


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_moments(xp, xf, xm, yp, yf, ym, phi, ell, ck=None, min_d2=None,
                  *, p, interpret=None):
    """One-sweep moment accumulation: returns (Mom [M, 128], nnz).

    `xp`/`yp` are the CENTERED positions (x - c0, y - c0 — the pair
    distances are shift-invariant so A is unchanged); `phi` is
    monomial_features_padded(x - c0) [N, 128], computed once per pair
    (the fixed cloud never transforms).  `ck` as in fused_flow.

    `min_d2` [nbi, nbj] (from ops.pallas_gram.block_bounds +
    aabb_min_d2, in the SAME coordinate shift as xp/yp): exact
    tile-level skip of pairs the position gate excludes wholesale."""
    interpret = _auto_interpret(interpret)
    linear = p.color_mode == "linear"
    fast_exp = getattr(p, "exp_mode", "precise") == "fast"
    if linear and ck is None:
        raise ValueError("linear color mode requires the ci cache")
    n, m = xp.shape[0], yp.shape[0]
    _check(n, m)
    ti, tj = _tile(n), _tile(m)
    grid = (m // tj, n // ti)

    smem = pl.BlockSpec((1, 8), lambda j, i: (0, 0), memory_space=pltpu.SMEM)
    xspec = [
        pl.BlockSpec((ti, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    ] * NPLANES
    yspec = [
        pl.BlockSpec((1, tj), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    ] * NPLANES
    phi_spec = pl.BlockSpec((n, MOM_WIDTH), lambda j, i: (0, 0),
                            memory_space=pltpu.VMEM)
    use_ck = ck is not None
    use_skip = min_d2 is not None
    extra_specs = []
    extra = ()
    if use_ck:
        extra_specs.append(
            pl.BlockSpec((ti, tj), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM)
        )
        extra += (ck,)
    if use_skip:
        extra_specs.append(_min_d2_spec(n // ti, m // tj))
        extra += (min_d2,)
    mom_spec = pl.BlockSpec((tj, MOM_WIDTH), lambda j, i: (j, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((8, 128), lambda j, i: (0, 0),
                            memory_space=pltpu.VMEM)

    mom, acc = pl.pallas_call(
        _make_moments_kernel(use_ck, ti, linear, fast_exp, use_skip),
        grid=grid,
        in_specs=[smem] + xspec + yspec + [phi_spec] + extra_specs,
        out_specs=[mom_spec, acc_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, MOM_WIDTH), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(_scal_vector(ell, p), *_pack_x(xp, xf, xm), *_pack_y(yp, yf, ym),
      phi, *extra)
    return mom, acc[0, 0]


def _make_wsq_kernel(use_ck, linear=False, symmetric=False,
                     fast_exp=False, use_skip=False):
    def kernel(s_ref, *refs):
        return _wsq_body(s_ref, refs, use_ck, linear, symmetric, fast_exp,
                         use_skip)

    return kernel


def _wsq_body(s_ref, refs, use_ck, linear=False, symmetric=False,
              fast_exp=False, use_skip=False):
    """Accumulator row 0: 0 sum A*d2, 1 nnz.

    `symmetric` (the Axx/Ayy self-sweeps): A is exactly symmetric —
    the tile at (j, i) is the transpose of (i, j) bit-for-bit (same
    planes both sides, same ck cache) — so only upper-triangle tiles
    are evaluated, off-diagonal ones weighted 2x.  Halves the VPU work
    of each adaptive self-kernel sweep.

    `use_skip`: AABB tile pruning as in _moments_body (self-kernel
    distances are rigid-invariant, so the caller computes the bound
    matrix ONCE per align from the untransformed cloud)."""
    xrefs, yrefs = refs[:9], refs[9:18]
    idx = 18
    ck_ref = None
    md_ref = None
    if use_ck:
        ck_ref = refs[idx]
        idx += 1
    if use_skip:
        md_ref = refs[idx]
        idx += 1
    acc_ref = refs[idx]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    scal = _unpack_scal(s_ref)

    def tile_update(weight):
        A, d2 = _pair_tile(xrefs, yrefs, scal, ck_ref, linear, fast_exp)
        wsq = jnp.sum(A * d2)
        nnz = jnp.sum((A > 0).astype(jnp.float32))
        acc_ref[:, :] += _acc_update([weight * wsq, weight * nnz])

    def guarded(weight):
        if use_skip:
            @pl.when(md_ref[i, j] <= scal[5] + SKIP_MARGIN)
            def _():
                tile_update(weight)
        else:
            tile_update(weight)

    if symmetric:
        @pl.when(j >= i)
        def _():
            guarded(jnp.where(j > i, 2.0, 1.0))
    else:
        guarded(1.0)


@functools.partial(jax.jit, static_argnames=("p", "interpret", "symmetric"))
def fused_wsq(xp, xf, xm, yp, yf, ym, ell, ck=None, min_d2=None, *, p,
              symmetric=False, interpret=None):
    """Lean self-kernel sweep: returns (sum A*d2, nnz) — the only
    quantities the adaptive dl reduction needs from Axx/Ayy
    (adaptive_cvo.cpp:222-271).  Pass symmetric=True when x and y ARE
    the same cloud (upper-triangle evaluation, exact).  `min_d2`
    [nbi, nbj] enables exact AABB tile pruning (rigid-invariant for
    self-pairs: compute once per align from the untransformed cloud)."""
    interpret = _auto_interpret(interpret)
    linear = p.color_mode == "linear"
    fast_exp = getattr(p, "exp_mode", "precise") == "fast"
    if linear and ck is None:
        raise ValueError("linear color mode requires the ci cache")
    n, m = xp.shape[0], yp.shape[0]
    _check(n, m)
    if symmetric and n != m:
        raise ValueError("symmetric sweep requires a self-pair (n == m)")
    ti, tj = _tile(n), _tile(m)
    grid = (n // ti, m // tj)
    smem = pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    xspec = [
        pl.BlockSpec((ti, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    ] * NPLANES
    yspec = [
        pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    ] * NPLANES
    use_ck = ck is not None
    use_skip = min_d2 is not None
    extra_specs = []
    extra = ()
    if use_ck:
        extra_specs.append(
            pl.BlockSpec((ti, tj), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        )
        extra += (ck,)
    if use_skip:
        extra_specs.append(_min_d2_spec(n // ti, m // tj))
        extra += (min_d2,)
    out = pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        _make_wsq_kernel(use_ck, linear, symmetric, fast_exp, use_skip),
        grid=grid,
        in_specs=[smem] + xspec + yspec + extra_specs,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(_scal_vector(ell, p), *_pack_x(xp, xf, xm), *_pack_y(yp, yf, ym),
      *extra)
    return acc[0, 0], acc[0, 1]
