"""Sharded registration: shard_map + collectives over the device mesh.

The reference's mutex-guarded accumulations are semantically
all-reduces (SURVEY.md section 2.6): omega/v (cvo.cpp:201-204), B..E
(cvo.cpp:283-288), dl (adaptive_cvo.cpp:234-263).  Here they become
`lax.psum` over a mesh axis:

- `align_sharded` — "Gram tensor parallelism": fixed-cloud rows shard
  over axis `sp`; each device computes its row-block of the Gram matrix
  and partial reductions; one psum per quantity per iteration.  The
  while_loop state stays replicated because every device sees the same
  psum results.
- `align_ring` — point-cloud "sequence parallelism" (the ring-attention
  analog, SURVEY.md section 5): both clouds shard; cloud blocks rotate
  around the ring via `ppermute` so no device ever holds the whole
  moving cloud.  XLA path: two sweeps per iteration (flow needs omega
  before the line-search sweep), plus a third for the adaptive Axx/Ayy
  partials.  Pallas path: ONE sweep — the visiting block carries its
  moment matrix around the ring and both reductions become epilogues.
- `align_batched` — batch DP: vmap the single-pair align over a batch
  of frame pairs, sharded over axis `dp` (multi-sequence odometry).

Local per-device compute in the sharded/ring paths runs the same
single-pass Pallas moment kernel as the single-chip product when
`p.backend` selects it (VERDICT r4 item 1); the XLA dense-block path
remains the default-params fallback and the only yy_quirk/adaptive-
linear implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map as _shard_map_new

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        try:
            return _shard_map_new(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=check_rep,
            )
        except TypeError:
            return _shard_map_new(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from cvo_rgbd_tpu import se3
from cvo_rgbd_tpu.core import flow as flow_mod
from cvo_rgbd_tpu.core import gram as gram_mod
from cvo_rgbd_tpu.core.cloud import PointCloud, transform_cloud
from cvo_rgbd_tpu.core.registration import AlignResult, AlignState, _schedule_ell
from cvo_rgbd_tpu.core.step_factored import step_coefficients_factored
from cvo_rgbd_tpu.core.cubic import cubic_roots, min_positive_root
from cvo_rgbd_tpu.params import AcvoParams


def _se_gram(p, xp, xf, xm, yp, yf, ym, ell):
    """Per-(row-shard, block) Gram evaluation, dispatching on the
    params' color mode exactly like core.registration._gram.  The
    linear-mode CI block is recomputed per call — loop-invariant work,
    but tiny (one [n,m] matmul) next to the kernel itself."""
    fast = getattr(p, "exp_mode", "precise") == "fast"
    if p.color_mode == "linear":
        ci = gram_mod.linear_color_gram(xf, yf, p.color_scale)
        return gram_mod.matlab_gram(
            xp, xm, yp, ym, ci, ell, sigma=p.sigma, sp_thres=p.sp_thres,
            fast_exp=fast,
        )
    return gram_mod.se_gram(
        xp, xf, xm, yp, yf, ym, ell,
        sigma=p.sigma, c_ell=p.c_ell, c_sigma=p.c_sigma,
        sp_thres=p.sp_thres, c_sp_thres=p.c_sp_thres, fast_exp=fast,
    )


def _step_from_coeffs(p, B, C, D, E):
    roots, valid = cubic_roots(4.0 * E, 3.0 * D, 2.0 * C, B)
    return min_positive_root(roots, valid, p.min_step, p.max_step)


def _finish(final) -> AlignResult:
    return AlignResult(
        tf=final.tf, R=final.R, T=final.T,
        iterations=final.k - 1, converged=final.converged,
        ell=final.ell, omega=final.omega, v=final.v,
    )


def _init_state(p, adaptive):
    return AlignState(
        k=jnp.zeros((), jnp.int32),
        R=jnp.eye(3, dtype=jnp.float32),
        T=jnp.zeros(3, jnp.float32),
        ell=jnp.asarray(p.ell_init, jnp.float32),
        ell_max=jnp.asarray(p.ell_max_init if adaptive else 1e9, jnp.float32),
        tf=jnp.eye(4, dtype=jnp.float32),
        converged=jnp.zeros((), bool),
        omega=jnp.zeros(3, jnp.float32),
        v=jnp.zeros(3, jnp.float32),
    )


def _integrate(p, state, omega, v, step, adaptive, dl):
    """Shared tail of the loop body: stops, exp update, ell update."""
    stop1 = (jnp.linalg.norm(omega) < p.eps) & (jnp.linalg.norm(v) < p.eps)
    dR, dT = se3.exp_sek3(omega, v, step)
    # pinned (see core/registration.py / se3.py: bf16-default 3x3
    # matmuls stall contraction above the 5e-5 stop on TPU)
    _hi = jax.lax.Precision.HIGHEST
    R_new = jnp.where(stop1, state.R, jnp.matmul(state.R, dR, precision=_hi))
    T_new = jnp.where(
        stop1, state.T,
        jnp.matmul(state.R, dT[..., None], precision=_hi)[..., 0] + state.T,
    )
    stop2 = se3.dist_se3(dR, dT) < p.eps_2
    converged = stop1 | stop2
    if adaptive:
        ell_new = state.ell + p.dl_step * dl
        hit = ell_new >= state.ell_max
        ell_max_new = jnp.where(hit, state.ell_max * p.ell_shrink, state.ell_max)
        ell_new = jnp.where(hit, state.ell_max * p.ell_shrink, ell_new)
        ell_new = jnp.maximum(ell_new, p.ell_min)
    else:
        ell_new = _schedule_ell(state.ell, state.k, p.ell_sched)
        ell_max_new = state.ell_max
    ell_new = jnp.where(converged, state.ell, ell_new)
    new_state = AlignState(
        k=state.k + 1, R=R_new, T=T_new, ell=ell_new,
        ell_max=ell_max_new, tf=state.tf, converged=converged,
        omega=omega, v=v,
    )
    # freeze once converged (vmap lanes keep running; see registration)
    return AlignState(
        *(jnp.where(state.converged, old, new)
          for old, new in zip(state, new_state))
    )


# ---------------------------------------------------------------------------
# Row-sharded align (Gram tensor parallelism)
# ---------------------------------------------------------------------------

def _sharded_pallas_eligible(p, adaptive, n_local, m):
    """The Pallas moment path engages when the params ask for it and the
    per-device row block is tileable.  Exclusions mirror
    core.registration.align's fused->pallas->xla fallback chain:
    yy_quirk emulation and adaptive linear mode are XLA-only, and the
    kernels tile in 128-lane blocks."""
    if getattr(p, "backend", "xla") not in ("pallas", "fused"):
        return False
    if adaptive and (p.yy_quirk or p.color_mode == "linear"):
        return False
    return not (n_local % 128 or m % 128)


def _maybe_kd_sort(p, adaptive, fixed, moving, nsp, both=False):
    """Globally kd-sort the clouds before shard_map when the Pallas
    moment path will engage: sharded row blocks become contiguous kd
    cells, so the per-device AABB tile pruning actually prunes (see
    core/cloud.kd_sort).  Unconditional on tile_skip — the single-chip
    pallas align sorts unconditionally too, keeping the paths on the
    same point order.  `both=True` (the ring) requires the moving
    capacity to shard too."""
    n_local = fixed.capacity // nsp
    m_for_check = moving.capacity // nsp if both else moving.capacity
    if not _sharded_pallas_eligible(p, adaptive, n_local, m_for_check):
        return fixed, moving
    from cvo_rgbd_tpu.core.cloud import kd_sort

    return kd_sort(fixed), kd_sort(moving)


def _make_sharded_inner(p, axis, adaptive, nsp):
    """Per-shard align body: x arrays are row-shards, y replicated
    within `axis` groups.  Used by align_sharded and train_step_2d.

    With `p.backend` in ("pallas", "fused") each device runs the SAME
    single-pass moment kernel as the single-chip product
    (ops/pallas_moments.py) on its local [N/sp, M] row block: one tile
    sweep accumulates the local moment matrix Mom_l = A_l^T Phi(x'_l),
    the flow/step reductions are O(M) epilogues on Mom_l
    (core/moments.py — they are LINEAR in Mom, so per-shard epilogues
    psum exactly like the reference's mutex-guarded partials,
    cvo.cpp:201-204), and the iteration keeps the two packed psums of
    the XLA path.  Per-device per-iteration cost therefore matches the
    single-chip Pallas floor instead of the ~3x dense-XLA block path
    (VERDICT r4 item 1)."""

    use_pallas_cfg = _sharded_pallas_eligible(p, adaptive, 128, 128)
    if use_pallas_cfg:
        from cvo_rgbd_tpu.core.moments import (
            flow_from_moments,
            monomial_features_padded,
            step_from_moments,
        )
        from cvo_rgbd_tpu.ops import color_gram, fused_moments, fused_wsq

    def inner(xp, xf, xm, yp0, yf, ym):
        n_local, m = xp.shape[0], yp0.shape[0]
        use_pallas = use_pallas_cfg and _sharded_pallas_eligible(
            p, adaptive, n_local, m
        )
        linear = p.color_mode == "linear"
        # x_full needed only for the adaptive Axx columns; the fixed
        # cloud never moves, so gather once outside the loop.
        if adaptive:
            xp_full = jax.lax.all_gather(xp, axis, tiled=True)
            xf_full = jax.lax.all_gather(xf, axis, tiled=True)
            xm_full = jax.lax.all_gather(xm, axis, tiled=True)
            num_fixed = jnp.sum(xm_full)

        if use_pallas:
            # Loop-invariant per-align precomputation (the sharded
            # analog of registration.build_moments_pre /
            # build_ck_caches).  c0 is the GLOBAL masked centroid of
            # the fixed cloud — every shard centers identically, so
            # the psum'd moments match the single-chip ones.
            w = xm.astype(jnp.float32)
            s_g, n_g = jax.lax.psum(
                (jnp.sum(xp * w[:, None], axis=0), jnp.sum(w)), axis
            )
            c0 = s_g / jnp.maximum(n_g, 1.0)
            x_c = xp - c0
            phi = monomial_features_padded(x_c)
            use_skip = getattr(p, "tile_skip", True)
            md_xx = md_yy = None
            if use_skip:
                # AABB tile pruning (ops/pallas_gram): the caller
                # kd-sorted the clouds globally, so local row blocks
                # are compact kd cells.  x bounds + the self-pair
                # prune matrices are loop-invariant.
                from cvo_rgbd_tpu.ops.pallas_gram import (
                    _tile, aabb_min_d2, block_bounds,
                )

                lo_xl, hi_xl = block_bounds(xp, xm, _tile(n_local))
                if adaptive:
                    lo_xf, hi_xf = block_bounds(
                        xp_full, xm_full, _tile(xp_full.shape[0])
                    )
                    md_xx = aabb_min_d2(lo_xl, hi_xl, lo_xf, hi_xf)
                    lo_y0, hi_y0 = block_bounds(yp0, ym, _tile(m))
                    md_yy = aabb_min_d2(lo_y0, hi_y0, lo_y0, hi_y0)
            ck_xy = ck_xx = ck_yy = None
            if linear:
                # the pre-masked CI tile IS the cache (see
                # registration.prepare_ci): local x rows vs full y
                ci = gram_mod.linear_color_gram(xf, yf, p.color_scale)
                ck_xy = jnp.where(
                    (xm[:, None] > 0) & (ym[None, :] > 0), ci, 0.0
                )
            elif getattr(p, "ck_cache", True):
                ck_xy = color_gram(xp, xf, xm, yp0, yf, ym, p=p)
                if adaptive:
                    ck_xx = color_gram(
                        xp, xf, xm, xp_full, xf_full, xm_full, p=p
                    )
                    ck_yy = color_gram(yp0, yf, ym, yp0, yf, ym, p=p)

        def pallas_body(state):
            tf_R, tf_T = se3.se3_inv(state.R, state.T)
            tf = se3.make_se3(tf_R, tf_T)
            yp = transform_cloud(tf_R, tf_T, yp0)

            md_xy = None
            if use_skip:
                lo_y, hi_y = block_bounds(yp, ym, _tile(m))
                md_xy = aabb_min_d2(lo_xl, hi_xl, lo_y, hi_y)
            Mom_l, nnz_l = fused_moments(
                x_c, xf, xm, yp - c0, yf, ym, phi, state.ell, ck_xy,
                md_xy, p=p,
            )
            om_l, v_l, wsq_l, _ = flow_from_moments(
                Mom_l, yp, c0, c=p.c, d=p.d
            )
            if adaptive:
                # self-kernels only feed dl (lean sweeps).  Axx spans
                # local rows x the full fixed cloud — symmetric
                # upper-triangle evaluation only applies at sp=1 where
                # the block IS the full self-pair.  Ayy is replicated
                # (full y x y), exactly like the XLA path's s_yy.
                wsq_xx_l, nnz_xx_l = fused_wsq(
                    xp, xf, xm, xp_full, xf_full, xm_full,
                    state.ell, ck_xx, md_xx, p=p, symmetric=(nsp == 1),
                )
                wsq_yy, nnz_yy = fused_wsq(
                    yp, yf, ym, yp, yf, ym, state.ell, ck_yy, md_yy,
                    p=p, symmetric=True,
                )
                omega, v, s_xy, s_xx, nnz_xx, nnz_xy = jax.lax.psum(
                    (om_l, v_l, wsq_l, wsq_xx_l, nnz_xx_l, nnz_l), axis
                )
                numer = (wsq_yy - 2.0 * s_xy + s_xx) / state.ell ** 3
                denom = nnz_xx + nnz_yy - 2.0 * nnz_xy
                dl = numer / jnp.where(denom == 0, 1.0, denom)
            else:
                omega, v = jax.lax.psum((om_l, v_l), axis)
                dl = jnp.zeros((), jnp.float32)

            Bl, Cl, Dl, El = step_from_moments(
                Mom_l, yp, c0, omega, v, state.ell
            )
            B, C, D, E = jax.lax.psum((Bl, Cl, Dl, El), axis)
            step = _step_from_coeffs(p, B, C, D, E)

            new = _integrate(p, state, omega, v, step, adaptive, dl)
            return new._replace(tf=tf)

        def body(state):
            tf_R, tf_T = se3.se3_inv(state.R, state.T)
            tf = se3.make_se3(tf_R, tf_T)
            yp = transform_cloud(tf_R, tf_T, yp0)

            # PACKED collectives: the iteration has exactly two data
            # dependencies on cross-shard sums (flow before the
            # omega-dependent line search), so all partial reductions
            # ride TWO psum calls instead of up to eleven.  Small
            # psums are pure latency on real ICI (~2 us/call, see the
            # comms model in docs/PERF.md), so packing them is the
            # single biggest lever on sp-sharded per-iteration time.
            A = _se_gram(p, xp, xf, xm, yp, yf, ym, state.ell)
            om_l, v_l = flow_mod.flow(A, xp, yp, c=p.c, d=p.d)

            if adaptive:
                Axx = _se_gram(p, xp, xf, xm, xp_full, xf_full, xm_full, state.ell)
                Ayy = _se_gram(p, yp, yf, ym, yp, yf, ym, state.ell)
                pack_l = (
                    om_l, v_l,
                    flow_mod.weighted_sqdist_sum(A, xp, yp),
                    flow_mod.weighted_sqdist_sum(Axx, xp, xp_full),
                    flow_mod.nnz(Axx),
                    flow_mod.nnz(A),
                )
                omega, v, s_xy, s_xx, nnz_xx, nnz_xy = jax.lax.psum(
                    pack_l, axis)
                ell3 = state.ell ** 3
                if p.yy_quirk:
                    m = yp.shape[-2]
                    keep = (jnp.arange(m) >= num_fixed).astype(Ayy.dtype)
                    Ayy_eff = Ayy * keep[:, None]
                else:
                    Ayy_eff = Ayy
                s_yy = flow_mod.weighted_sqdist_sum(Ayy_eff, yp, yp)  # replicated
                numer = (s_yy - 2.0 * s_xy + s_xx) / ell3
                denom = nnz_xx + flow_mod.nnz(Ayy) - 2 * nnz_xy
                denom = jnp.where(denom == 0, 1, denom).astype(numer.dtype)
                dl = numer / denom
            else:
                omega, v = jax.lax.psum((om_l, v_l), axis)
                dl = jnp.zeros((), jnp.float32)

            # moment-factored on the local block (one MXU matmul per
            # device, no [N/sp, M] field materialization); the
            # per-shard A-weighted centering is exact, so the psum'd
            # coefficients match the unsharded ones
            Bl, Cl, Dl, El = step_coefficients_factored(
                A, xp, yp, omega, v, state.ell
            )
            B, C, D, E = jax.lax.psum((Bl, Cl, Dl, El), axis)
            step = _step_from_coeffs(p, B, C, D, E)

            new = _integrate(p, state, omega, v, step, adaptive, dl)
            return new._replace(tf=tf)

        final = jax.lax.while_loop(
            lambda s: (s.k < p.max_iter) & ~s.converged,
            pallas_body if use_pallas else body,
            _init_state(p, adaptive),
        )
        return _finish(final)

    return inner


def align_sharded(p, mesh, fixed: PointCloud, moving: PointCloud,
                  axis: str = "sp") -> AlignResult:
    """Fixed-cloud rows sharded over `axis`; moving cloud replicated.

    Call under jit:  jax.jit(align_sharded, static_argnums=(0, 4))
    (or via functools.partial).  Capacity of `fixed` must divide by the
    axis size.
    """
    adaptive = isinstance(p, AcvoParams)
    nsp = mesh.shape[axis]
    if fixed.capacity % nsp:
        raise ValueError(
            f"fixed capacity {fixed.capacity} not divisible by {axis}={nsp}"
        )
    fixed, moving = _maybe_kd_sort(p, adaptive, fixed, moving, nsp)
    inner = _make_sharded_inner(p, axis, adaptive, nsp)
    spec_x = (P(axis, None), P(axis, None), P(axis))
    spec_y = (P(None, None), P(None, None), P(None))
    out = jax.tree_util.tree_map(lambda _: P(), _finish(_init_state(p, adaptive)))
    fn = shard_map(
        inner, mesh=mesh,
        in_specs=spec_x + spec_y,
        out_specs=out,
        check_rep=False,
    )
    return fn(fixed.positions, fixed.features, fixed.mask,
              moving.positions, moving.features, moving.mask)


def train_step_2d(p, mesh, fixed_b: PointCloud, moving_b: PointCloud,
                  dp: str = "dp", sp: str = "sp") -> AlignResult:
    """The full production step over a 2-D mesh: frame-pair batch
    sharded over `dp` (data parallelism), fixed-cloud points sharded
    over `sp` (Gram tensor parallelism with psum collectives).

    fixed_b/moving_b hold a leading batch axis; batch size must divide
    by mesh[dp], point capacity by mesh[sp].  Returns a batched
    AlignResult.
    """
    adaptive = isinstance(p, AcvoParams)
    ndp, nsp = mesh.shape[dp], mesh.shape[sp]
    B = fixed_b.positions.shape[0]
    if B % ndp or fixed_b.capacity % nsp:
        raise ValueError(
            f"batch {B} must divide {dp}={ndp}; capacity "
            f"{fixed_b.capacity} must divide {sp}={nsp}"
        )
    if _sharded_pallas_eligible(
        p, adaptive, fixed_b.capacity // nsp, moving_b.capacity
    ):
        # unconditional on tile_skip, like every other pallas path
        # (_maybe_kd_sort / registration.py): sorting only when the
        # skip is on would reassociate the fp32 reductions and break
        # the skip-on/off bitwise A-B comparisons (CLAUDE.md).
        from cvo_rgbd_tpu.core.cloud import kd_sort

        fixed_b = jax.vmap(kd_sort)(fixed_b)
        moving_b = jax.vmap(kd_sort)(moving_b)
    inner = _make_sharded_inner(p, sp, adaptive, nsp)

    def batched_inner(xp, xf, xm, yp, yf, ym):
        # local shapes: [B/ndp, N/nsp, ...] for x, [B/ndp, M, ...] for y
        def one(_, args):
            return None, inner(*args)

        _, res = jax.lax.scan(one, None, (xp, xf, xm, yp, yf, ym))
        return res

    spec_x = (P(dp, sp, None), P(dp, sp, None), P(dp, sp))
    spec_y = (P(dp, None, None), P(dp, None, None), P(dp, None))
    proto = _finish(_init_state(p, adaptive))
    out = jax.tree_util.tree_map(
        lambda a: P(dp, *([None] * jnp.ndim(a))), proto
    )
    fn = shard_map(
        batched_inner, mesh=mesh,
        in_specs=spec_x + spec_y, out_specs=out, check_rep=False,
    )
    return fn(fixed_b.positions, fixed_b.features, fixed_b.mask,
              moving_b.positions, moving_b.features, moving_b.mask)


# ---------------------------------------------------------------------------
# Ring-streamed align (point-cloud sequence parallelism)
# ---------------------------------------------------------------------------

def align_ring(p, mesh, fixed: PointCloud, moving: PointCloud,
               axis: str = "sp") -> AlignResult:
    """Both clouds sharded over `axis`; cloud blocks ride the ring.

    Per iteration (XLA block path): sweep 1 rotates moving blocks to
    accumulate the flow partials (plus, for adaptive params, the Axy
    weighted-distance/nnz partials); for adaptive params sweep 1b
    rotates fixed *and* moving blocks together against the resident
    row-shards for the Axx/Ayy self-kernel partials of dl
    (adaptive_cvo.cpp:222-271); sweep 2 (after omega/v are known)
    rotates moving blocks again for the line-search coefficients.
    Peak per-device Gram block is [N/sp, M/sp] — no device ever holds
    a whole cloud or a whole Gram matrix.

    With `p.backend` in ("pallas", "fused") and 128-divisible blocks,
    the iteration collapses to ONE sweep: the visiting y block carries
    its moment block Mom_b = A[:, b]^T Phi(x') around the ring — each
    device adds its resident rows' contribution (ops/pallas_moments.py
    fused_moments) and, for adaptive params, the Axx/Ayy wsq partials
    (fused_wsq) in the same hop.  After a full cycle every block is
    home with its complete moments, and flow AND line-search
    coefficients are O(M/sp) epilogues (core/moments.py) + two packed
    psums — the omega-dependent second Gram sweep disappears
    entirely (the reference's second nnz(A) traversal,
    cvo.cpp:213-308).  Color kernels are recomputed in-kernel
    (no [N/sp, M] cache: ring mode exists for clouds where that
    allocation is the problem).
    """
    adaptive = isinstance(p, AcvoParams)
    nsp = mesh.shape[axis]
    if fixed.capacity % nsp or moving.capacity % nsp:
        raise ValueError("cloud capacities must divide the ring size")

    fixed, moving = _maybe_kd_sort(p, adaptive, fixed, moving, nsp,
                                   both=True)
    use_pallas_cfg = _sharded_pallas_eligible(
        p, adaptive, fixed.capacity // nsp, moving.capacity // nsp
    )
    if use_pallas_cfg:
        from cvo_rgbd_tpu.core.moments import (
            flow_from_moments,
            monomial_features_padded,
            step_from_moments,
        )
        from cvo_rgbd_tpu.ops import fused_moments, fused_wsq

    def inner(xp, xf, xm, yp0_blk, yf_blk, ym_blk):
        linear = p.color_mode == "linear"
        m_local = yp0_blk.shape[0]
        if adaptive:
            # total valid fixed points + this shard's global row base in
            # the moving cloud (P(axis) shards are contiguous), for the
            # yy_quirk row gate (adaptive_cvo.cpp:190/256)
            num_fixed = jax.lax.psum(jnp.sum(xm), axis)
            blk_m = yp0_blk.shape[0]
            y_row_base = jax.lax.axis_index(axis) * blk_m

        def ring_sweep(carry_init, payload, blk_fn):
            """Rotate `payload` blocks through all devices."""
            perm = [(i, (i + 1) % nsp) for i in range(nsp)]

            def step_fn(i, val):
                carry, blk = val
                carry = blk_fn(carry, blk)
                blk = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(a, axis, perm), blk
                )
                return carry, blk

            return jax.lax.fori_loop(
                0, nsp, step_fn, (carry_init, payload)
            )[0]

        y_payload = (yp0_blk, yf_blk, ym_blk)

        if use_pallas_cfg:
            # loop-invariant precomputation (see _make_sharded_inner):
            # global fixed-cloud centroid + centered monomial features
            # of the resident rows
            w = xm.astype(jnp.float32)
            s_g, n_g = jax.lax.psum(
                (jnp.sum(xp * w[:, None], axis=0), jnp.sum(w)), axis
            )
            c0 = s_g / jnp.maximum(n_g, 1.0)
            x_c = xp - c0
            phi = monomial_features_padded(x_c)
            use_skip = getattr(p, "tile_skip", True)
            if use_skip:
                from cvo_rgbd_tpu.ops.pallas_gram import (
                    _tile, aabb_min_d2, block_bounds,
                )

                t_loc = _tile(xp.shape[0])
                t_blk = _tile(m_local)
                lo_xl, hi_xl = block_bounds(xp, xm, t_loc)
                if adaptive:
                    # yy prune is rigid-invariant: resident home-block
                    # bounds from the untransformed y block
                    lo_yh, hi_yh = block_bounds(yp0_blk, ym_blk, t_blk)

        def ring_sweep_carrying(carry_init, payload, blk_fn):
            """Like ring_sweep, but blk_fn also UPDATES the payload —
            after the full cycle each device's payload is its home
            block again, with whatever blk_fn accumulated riding it."""
            perm = [(i, (i + 1) % nsp) for i in range(nsp)]

            def step_fn(i, val):
                carry, blk = val
                carry, blk = blk_fn(carry, blk)
                blk = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(a, axis, perm), blk
                )
                return carry, blk

            return jax.lax.fori_loop(
                0, nsp, step_fn, (carry_init, payload)
            )

        def pallas_body(state):
            tf_R, tf_T = se3.se3_inv(state.R, state.T)
            tf = se3.make_se3(tf_R, tf_T)
            yp_home = transform_cloud(tf_R, tf_T, yp0_blk)

            mom0 = jnp.zeros((m_local, 35), jnp.float32)

            def blk_fn(carry, blk):
                if adaptive:
                    xpb, xfb, xmb, ypb0, yfb, ymb, mom = blk
                else:
                    ypb0, yfb, ymb, mom = blk
                ypb = transform_cloud(tf_R, tf_T, ypb0)
                ck = None
                if linear:
                    # per-hop CI tile: resident x rows vs visiting
                    # block (rkhs_se3_registration.m:108) — one small
                    # matmul, no [N/sp, M] cache
                    ci = gram_mod.linear_color_gram(
                        xf, yfb, p.color_scale
                    )
                    ck = jnp.where(
                        (xm[:, None] > 0) & (ymb[None, :] > 0), ci, 0.0
                    )
                md = md_xx_b = md_yy_b = None
                if use_skip:
                    # visiting-block tile bounds: O(blk) reduce per hop
                    lo_yb, hi_yb = block_bounds(ypb, ymb, t_blk)
                    md = aabb_min_d2(lo_xl, hi_xl, lo_yb, hi_yb)
                    if adaptive:
                        lo_xb, hi_xb = block_bounds(xpb, xmb, t_loc)
                        md_xx_b = aabb_min_d2(lo_xl, hi_xl, lo_xb, hi_xb)
                        lo_y0b, hi_y0b = block_bounds(ypb0, ymb, t_blk)
                        md_yy_b = aabb_min_d2(lo_yh, hi_yh, lo_y0b,
                                              hi_y0b)
                contrib, nnz = fused_moments(
                    x_c, xf, xm, ypb - c0, yfb, ymb, phi, state.ell,
                    ck, md, p=p,
                )
                mom = mom + contrib[:, :35]
                if adaptive:
                    sxx_c, nxx_c = fused_wsq(
                        xp, xf, xm, xpb, xfb, xmb, state.ell, None,
                        md_xx_b, p=p,
                    )
                    syy_c, nyy_c = fused_wsq(
                        yp_home, yf_blk, ym_blk, ypb, yfb, ymb,
                        state.ell, None, md_yy_b, p=p,
                    )
                    # carry order (sxx, syy, nxx, nyy, nxy) matches the
                    # psum unpack below and the XLA ring body's tuple —
                    # a (sxx, nxx, syy, ...) swap here silently feeds dl
                    # a pair COUNT as its yy distance sum and slams ell
                    # to the floor on iteration 1 (caught by on-chip
                    # ell-trajectory comparison, round 5).
                    carry = (
                        carry[0] + sxx_c, carry[1] + syy_c,
                        carry[2] + nxx_c, carry[3] + nyy_c,
                        carry[4] + nnz,
                    )
                    return carry, (xpb, xfb, xmb, ypb0, yfb, ymb, mom)
                return carry, (ypb0, yfb, ymb, mom)

            if adaptive:
                carry0 = tuple(jnp.zeros((), jnp.float32) for _ in range(5))
                payload0 = (xp, xf, xm) + y_payload + (mom0,)
            else:
                carry0 = ()
                payload0 = y_payload + (mom0,)
            carry, payload = ring_sweep_carrying(carry0, payload0, blk_fn)
            mom_home = payload[-1]

            om_l, v_l, wsq_l, _ = flow_from_moments(
                mom_home, yp_home, c0, c=p.c, d=p.d
            )
            if adaptive:
                omega, v, sxy_g, sxx_g, syy_g, nxx_g, nyy_g, nxy_g = (
                    jax.lax.psum((om_l, v_l, wsq_l) + carry, axis)
                )
                numer = (syy_g - 2.0 * sxy_g + sxx_g) / state.ell ** 3
                denom = nxx_g + nyy_g - 2.0 * nxy_g
                dl = numer / jnp.where(denom == 0, 1.0, denom)
            else:
                omega, v = jax.lax.psum((om_l, v_l), axis)
                dl = jnp.zeros((), jnp.float32)

            Bl, Cl, Dl, El = step_from_moments(
                mom_home, yp_home, c0, omega, v, state.ell
            )
            B, C, D, E = jax.lax.psum((Bl, Cl, Dl, El), axis)
            step = _step_from_coeffs(p, B, C, D, E)

            new = _integrate(p, state, omega, v, step, adaptive, dl)
            return new._replace(tf=tf)

        def body(state):
            tf_R, tf_T = se3.se3_inv(state.R, state.T)
            tf = se3.make_se3(tf_R, tf_T)

            # sweep 1: flow partials (+ Axy dl partials when adaptive)
            def flow_blk(carry, blk):
                om, vv, sxy, nxy = carry
                ypb = transform_cloud(tf_R, tf_T, blk[0])
                A = _se_gram(p, xp, xf, xm, ypb, blk[1], blk[2], state.ell)
                o_l, v_l = flow_mod.flow(A, xp, ypb, c=p.c, d=p.d)
                if adaptive:
                    sxy = sxy + flow_mod.weighted_sqdist_sum(A, xp, ypb)
                    nxy = nxy + flow_mod.nnz(A)
                return (om + o_l, vv + v_l, sxy, nxy)

            om, vv, sxy, nxy = ring_sweep(
                (jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                 jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
                y_payload, flow_blk,
            )
            # packed collectives (see _make_sharded_inner): omega/v are
            # first needed by the omega-dependent sweep 2, so the
            # adaptive path defers them into ONE psum with the dl
            # partials after sweep 1b — two psum calls per iteration
            # total in either variant.

            if adaptive:
                # sweep 1b: self-kernel partials.  Rows stay resident
                # (x row-shard; transformed y block), columns rotate.
                yp_rows = transform_cloud(tf_R, tf_T, yp0_blk)

                def adapt_blk(carry, blk):
                    sxx, nxx, syy, nyy = carry
                    xpb, xfb, xmb, ypb0, yfb, ymb = blk
                    Axx = _se_gram(p, xp, xf, xm, xpb, xfb, xmb, state.ell)
                    ypb = transform_cloud(tf_R, tf_T, ypb0)
                    Ayy = _se_gram(
                        p, yp_rows, yf_blk, ym_blk, ypb, yfb, ymb, state.ell
                    )
                    sxx = sxx + flow_mod.weighted_sqdist_sum(Axx, xp, xpb)
                    nxx = nxx + flow_mod.nnz(Axx)
                    nyy = nyy + flow_mod.nnz(Ayy)
                    if p.yy_quirk:
                        rows = y_row_base + jnp.arange(blk_m)
                        Ayy_eff = Ayy * (rows >= num_fixed).astype(
                            Ayy.dtype
                        )[:, None]
                    else:
                        Ayy_eff = Ayy
                    syy = syy + flow_mod.weighted_sqdist_sum(
                        Ayy_eff, yp_rows, ypb
                    )
                    return (sxx, nxx, syy, nyy)

                sxx, nxx, syy, nyy = ring_sweep(
                    (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                     jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
                    (xp, xf, xm) + y_payload, adapt_blk,
                )
                omega, v, sxy_g, sxx_g, syy_g, nxx_g, nyy_g, nxy_g = (
                    jax.lax.psum(
                        (om, vv, sxy, sxx, syy, nxx, nyy, nxy), axis
                    )
                )
                numer = (syy_g - 2.0 * sxy_g + sxx_g) / state.ell ** 3
                denom = nxx_g + nyy_g - 2 * nxy_g
                denom = jnp.where(denom == 0, 1, denom).astype(numer.dtype)
                dl = numer / denom
            else:
                omega, v = jax.lax.psum((om, vv), axis)
                dl = jnp.zeros((), jnp.float32)

            # sweep 2: line-search coefficients
            def step_blk(carry, blk):
                B, C, D, E = carry
                ypb = transform_cloud(tf_R, tf_T, blk[0])
                A = _se_gram(p, xp, xf, xm, ypb, blk[1], blk[2], state.ell)
                Bl, Cl, Dl, El = step_coefficients_factored(
                    A, xp, ypb, omega, v, state.ell
                )
                return (B + Bl, C + Cl, D + Dl, E + El)

            zeros = tuple(jnp.zeros((), jnp.float32) for _ in range(4))
            B, C, D, E = ring_sweep(zeros, y_payload, step_blk)
            B, C, D, E = (jax.lax.psum(t, axis) for t in (B, C, D, E))
            step = _step_from_coeffs(p, B, C, D, E)

            new = _integrate(p, state, omega, v, step, adaptive, dl)
            return new._replace(tf=tf)

        final = jax.lax.while_loop(
            lambda s: (s.k < p.max_iter) & ~s.converged,
            pallas_body if use_pallas_cfg else body,
            _init_state(p, adaptive),
        )
        return _finish(final)

    spec = (P(axis, None), P(axis, None), P(axis))
    out = jax.tree_util.tree_map(
        lambda _: P(), _finish(_init_state(p, adaptive))
    )
    fn = shard_map(
        inner, mesh=mesh, in_specs=spec + spec, out_specs=out, check_rep=False
    )
    return fn(fixed.positions, fixed.features, fixed.mask,
              moving.positions, moving.features, moving.mask)


# ---------------------------------------------------------------------------
# Batch data parallelism over frame pairs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _compiled_align_batched(p):
    from cvo_rgbd_tpu.core.registration import align

    return jax.jit(jax.vmap(functools.partial(align, p)))


def align_batched(p, fixed_batch: PointCloud, moving_batch: PointCloud,
                  mesh=None, dp_axis: str = "dp",
                  R0=None, T0=None, ell0=None):
    """vmap align over leading batch axis; shard the batch over `dp`.

    Returns a batched AlignResult.  The vmapped while_loop runs until
    the slowest pair in the batch converges (standard vmap semantics).
    Compiled once per (params, batch/cloud shape) — rebuilding the
    vmapped closure per call would defeat jit's cache and pay a full
    recompile every invocation.

    `R0` [B,3,3] / `T0` [B,3] / `ell0` [B] warm-start each lane (the
    reference's across-pair R/T/ell persistence — see
    core.registration.align); all three must be given together or not
    at all (one compiled signature each way).
    """
    fn = _compiled_align_batched(p)
    warm = (R0, T0, ell0)
    if any(w is not None for w in warm):
        if any(w is None for w in warm):
            raise ValueError("pass R0, T0 and ell0 together")
    if mesh is not None:
        sharding = NamedSharding(mesh, P(dp_axis))
        fixed_batch = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*( (dp_axis,) + (None,) * (a.ndim - 1) )))
            ),
            fixed_batch,
        )
        moving_batch = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*( (dp_axis,) + (None,) * (a.ndim - 1) )))
            ),
            moving_batch,
        )
        del sharding
    if any(w is not None for w in warm):
        return fn(fixed_batch, moving_batch, *warm)
    return fn(fixed_batch, moving_batch)
