"""Whole-align Pallas mega-kernel: the entire CVO gradient flow
(cvo.cpp:361-420) as ONE TPU kernel.

Motivation (docs/PERF.md): a `lax.while_loop` align iteration costs
~1.1 ms on the dev chip although its heavy compute is ~110 us, and the
overhead is independent of the body width (batch 16 pays the same
per-iteration cost as batch 1) — i.e. it is loop/dispatch bookkeeping,
not data.  This kernel removes the XLA loop entirely: both clouds stay
resident in VMEM, `lax.while_loop` runs *inside* the kernel over
scalar (SREG) carries, and each iteration evaluates the Gram tile,
the flow reductions, the line-search coefficients, the closed-form
cubic, the SE(3) exponential update and the stopping rules without
ever leaving the core.

Per-iteration loop-invariants are hoisted out of the while body and
live in VMEM across iterations:
- linear color mode: the MATLAB CI tile (rkhs_se3_registration.m:40-53)
  as sum of three (N,1)x(1,M) broadcast products — no matmul needed;
- se color mode: the feature kernel ck and its gate (features do not
  transform, cvo.cpp:143-153).

Mosaic-portability rules (same as ops/pallas_gram.py, all verified on
v5e hardware): per-coordinate (N,1)/(1,M) planes, no rank-1 dots, no
3x3 matmuls (the SE(3) algebra is unrolled scalar arithmetic), no
scalar VMEM stores (the result tile is assembled with one vectorized
store).  Scalar transcendentals (sqrt/sin/cos/acos/exp/log on SREGs)
are used directly; `_SCALAR_TRANSCENDENTALS = False` reroutes them
through (8, 128) VPU tiles if a backend rejects them.

Scope: CVO (both color modes) and adaptive CVO (se mode, correct-math
dl — yy_quirk falls back), one (N x M) Gram tile — the clouds must fit
VMEM (N*M <= ~1M pairs; the adaptive variant also holds the (N,N) and
(M,M) self-kernel tiles).  Adaptive key fact: the Axx/Ayy *distance*
matrices are rigid-transform-invariant, so they are computed once and
live in VMEM across iterations — each iteration's self-kernels are
just an exp of a rescaled cached tile (the reference recomputes the
whole kd-tree pass three times per iteration, adaptive_cvo.cpp:156-160).
Larger clouds and quirk/linear-adaptive combinations fall back to the
standard backends in core.registration.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvo_rgbd_tpu.core.numerics import exp_neg

from cvo_rgbd_tpu.core.step_factored import M_INDEX, Poly
from cvo_rgbd_tpu.ops.pallas_gram import _auto_interpret

_BIG = 1e30
_TOL2 = 1e-12  # TOLERANCE^2 (LieGroup.cpp:18)

# Scalar transcendentals lower to Mosaic SREG/VPU ops directly; flip to
# False to evaluate them on an (8,128) tile and reduce back (fallback
# for backends that reject scalar math calls).
_SCALAR_TRANSCENDENTALS = True


def _t1(fn, x):
    """Transcendental on a traced scalar."""
    if _SCALAR_TRANSCENDENTALS:
        return fn(x)
    tile = jnp.full((8, 128), x, jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return jnp.sum(jnp.where((row == 0) & (col == 0), fn(tile), 0.0))


def _sqrt(x):
    return _t1(jnp.sqrt, x)


def _sin(x):
    return _t1(jnp.sin, x)


def _cos(x):
    return _t1(jnp.cos, x)


def _acos(x):
    """arccos without lax.acos (no Mosaic lowering exists): the
    Abramowitz-Stegun 4.4.45 polynomial (|err| <= 6.7e-5 rad) refined by
    two Newton steps on cos(t) = x — accuracy beyond fp32 eps using only
    sqrt/sin/cos, all of which Mosaic lowers."""
    xc = jnp.clip(x, -1.0, 1.0)
    ax = jnp.abs(xc)
    t = _sqrt(1.0 - ax) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 - 0.0187293 * ax))
    )
    t = jnp.where(xc < 0, math.pi - t, t)
    for _ in range(2):
        s = _sin(t)
        safe = jnp.abs(s) >= 1e-6
        s_safe = jnp.where(safe, s, 1.0)
        t = jnp.where(safe, t + (_cos(t) - xc) / s_safe, t)
    return t


def _cbrt(x):
    """Scalar cube root, sign-correct, cbrt(0) = 0."""
    ax = jnp.abs(x)
    r = _t1(lambda a: jnp.exp(jnp.log(jnp.maximum(a, 1e-38)) / 3.0), ax)
    return jnp.where(ax < 1e-38, 0.0, jnp.sign(x) * r)


# ---------------------------------------------------------------------------
# scalar 3-vector / 3x3 helpers (tuples of traced scalars — no arrays,
# so nothing for Mosaic to relayout)
# ---------------------------------------------------------------------------

def _mat3_mul(a, b):
    """Row-major 9-tuples: a @ b."""
    return tuple(
        a[3 * i + 0] * b[0 + j] + a[3 * i + 1] * b[3 + j] + a[3 * i + 2] * b[6 + j]
        for i in range(3) for j in range(3)
    )


def _mat3_vec(a, v):
    return tuple(
        a[3 * i] * v[0] + a[3 * i + 1] * v[1] + a[3 * i + 2] * v[2]
        for i in range(3)
    )


def _mat3_t(a):
    return (a[0], a[3], a[6], a[1], a[4], a[7], a[2], a[5], a[8])


_EYE3 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _lerp9(cond, a, b):
    return tuple(jnp.where(cond, ai, bi) for ai, bi in zip(a, b))


def _rod_mats(w, th2, c1, c2):
    """I + c1*skew(w) + c2*(w w^T - th2 I), as a row-major 9-tuple.
    (skew(w)^2 = w w^T - |w|^2 I, so this covers Rodrigues/Jl/Jl_inv.)"""
    w0, w1, w2 = w

    def entry(i, j):
        sk = (
            (0.0, -w2, w1),
            (w2, 0.0, -w0),
            (-w1, w0, 0.0),
        )[i][j]
        ww = (w0, w1, w2)[i] * (w0, w1, w2)[j] - (th2 if i == j else 0.0)
        return (1.0 if i == j else 0.0) + c1 * sk + c2 * ww

    return tuple(entry(i, j) for i in range(3) for j in range(3))


def _exp_sek3_scalar(om, v, dt):
    """(dR 9-tuple, dT 3-tuple) — se3.exp_sek3 transcribed to scalars,
    including the reference small-angle quirk Jl = I
    (LieGroup.cpp:168-170)."""
    th2 = om[0] * om[0] + om[1] * om[1] + om[2] * om[2]
    small = th2 < _TOL2
    th2_s = jnp.where(small, 1.0, th2)
    th = _sqrt(th2_s)
    st = _sin(dt * th)
    ct = _cos(dt * th)
    st_over = st / th
    one_m_ct = (1.0 - ct) / th2_s
    dR = _rod_mats(om, th2_s, st_over, one_m_ct)
    jl_c2 = (dt * th - st) / (th2_s * th)
    Jl = _rod_mats(om, th2_s, one_m_ct, jl_c2)
    # _rod_mats builds I + c1*skew + c2*(ww^T - th2 I); Jl needs dt*I:
    Jl = tuple(
        jl + (dt - 1.0 if i % 4 == 0 else 0.0) for i, jl in enumerate(Jl)
    )
    dR = _lerp9(small, _EYE3, dR)
    Jl = _lerp9(small, _EYE3, Jl)  # reference quirk: I, not dt*I
    return dR, _mat3_vec(Jl, v)


def _dist_se3_scalar(dR, dT):
    """se3.dist_se3 on scalar tuples: sqrt(2|w|^2 + |u|^2),
    w = log_so3(dR), u = Jl^{-1}(w) dT (cvo.cpp:71-81)."""
    tr = dR[0] + dR[4] + dR[8]
    cos_th = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    th = _acos(cos_th)
    small = th < 1e-6
    th_s = jnp.where(small, 1.0, th)
    f = th_s / (2.0 * _sin(th_s))
    f = jnp.where(small, 0.5 + th * th / 12.0, f)
    w = (
        f * (dR[7] - dR[5]),
        f * (dR[2] - dR[6]),
        f * (dR[3] - dR[1]),
    )
    wth2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    wsmall = wth2 < _TOL2
    wth2_s = jnp.where(wsmall, 1.0, wth2)
    wth = _sqrt(wth2_s)
    c = 1.0 / wth2_s - (1.0 + _cos(wth)) / (2.0 * wth * _sin(wth))
    c = jnp.where(wsmall, 1.0 / 12.0 + wth2 / 720.0, c)
    # Jl_inv = I - 0.5 skew(w) + c (w w^T - th2 I); th2_s == th2 on the
    # non-small branch, and on the small branch the true th2 ~ 0:
    Jli = _lerp9(wsmall, _rod_mats(w, 0.0, -0.5, c), _rod_mats(w, wth2_s, -0.5, c))
    u = _mat3_vec(Jli, dT)
    return _sqrt(2.0 * wth2 + u[0] * u[0] + u[1] * u[1] + u[2] * u[2])


def _poly_eval(a, b, c, d, t):
    return ((a * t + b) * t + c) * t + d


def _cubic_min_positive(a, b, c, d, min_step, max_step):
    """Scalar transcription of core.cubic.cubic_roots +
    min_positive_root: min positive real root of a t^3+b t^2+c t+d,
    else min_step, clamped to max_step (cvo.cpp:298-307)."""
    aa, ab, ac, ad = jnp.abs(a), jnp.abs(b), jnp.abs(c), jnp.abs(d)
    coef_scale = jnp.maximum(jnp.maximum(aa, ab), jnp.maximum(ac, ad))
    tiny = 1e-12 * jnp.maximum(coef_scale, 1e-30)  # see core.cubic
    is_cubic = aa > tiny
    is_quad = ~is_cubic & (ab > tiny)
    is_lin = ~is_cubic & ~is_quad & (ac > tiny)

    # --- cubic branch, Fujiwara-rescaled (t = tau u) ---
    a_s = jnp.where(is_cubic, a, 1.0)
    tau = jnp.maximum(
        jnp.maximum(jnp.abs(b / a_s), _sqrt(jnp.abs(c / a_s))),
        _cbrt(jnp.abs(d / a_s)),
    )
    tau = jnp.maximum(tau, 1e-20)
    p = b / (a_s * tau)
    q = c / (a_s * tau * tau)
    r = d / (a_s * tau * tau * tau)
    ps = q - p * p / 3.0
    qs = 2.0 * p * p * p / 27.0 - p * q / 3.0 + r
    delta = (qs * 0.5) ** 2 + (ps / 3.0) ** 3

    sq = _sqrt(jnp.maximum(delta, 0.0))
    s_single = _cbrt(-qs * 0.5 + sq) + _cbrt(-qs * 0.5 - sq)

    ps_neg = jnp.minimum(ps, -1e-30)
    m_ = 2.0 * _sqrt(-ps_neg / 3.0)
    denom = ps_neg * m_
    denom = jnp.where(jnp.abs(denom) < 1e-30, -1e-30, denom)
    acos_arg = jnp.clip(3.0 * qs / denom, -1.0, 1.0)
    phi = _acos(acos_arg)
    two_pi = 2.0 * math.pi
    u0 = m_ * _cos(phi / 3.0) - p / 3.0
    u1 = m_ * _cos((phi - two_pi) / 3.0) - p / 3.0
    u2 = m_ * _cos((phi - 2.0 * two_pi) / 3.0) - p / 3.0
    u_dom = jnp.where(jnp.abs(u0) >= jnp.abs(u1), u0, u1)
    u_dom = jnp.where(jnp.abs(u_dom) >= jnp.abs(u2), u_dom, u2)
    three = delta <= 0
    t1 = tau * jnp.where(three, u_dom, s_single - p / 3.0)

    # backward deflation by the dominant root (core.cubic:91-103)
    t1_s = jnp.where(jnp.abs(t1) < 1e-20, 1.0, t1)
    c2_back = -d / t1_s
    b2_back = (c2_back - c) / t1_s
    b2_fwd = b + a * t1
    c2_fwd = c + t1 * b2_fwd
    use_back = jnp.abs(t1) >= 1e-20
    b2 = jnp.where(use_back, b2_back, b2_fwd)
    c2 = jnp.where(use_back, c2_back, c2_fwd)
    ddisc = b2 * b2 - 4.0 * a_s * c2
    dsq = _sqrt(jnp.maximum(ddisc, 0.0))
    sgn = jnp.sign(b2 + (b2 == 0))
    dtmp = -0.5 * (b2 + sgn * dsq)
    cub1 = t1
    cub2 = dtmp / a_s
    cub3 = jnp.where(jnp.abs(dtmp) > 1e-30, c2 / dtmp, 0.0)
    cubv1 = jnp.asarray(True)
    cubv2 = ddisc >= 0
    cubv3 = (ddisc >= 0) & (jnp.abs(dtmp) > 1e-30)

    # --- quadratic branch ---
    b_s = jnp.where(is_quad, b, 1.0)
    qdisc = c * c - 4.0 * b_s * d
    qsq = _sqrt(jnp.maximum(qdisc, 0.0))
    qsgn = jnp.sign(c + (c == 0))
    qtmp = -0.5 * (c + qsgn * qsq)
    qu1 = qtmp / b_s
    qu2 = jnp.where(jnp.abs(qtmp) > 1e-30, d / qtmp, 0.0)
    quv1 = qdisc >= 0
    quv2 = (qdisc >= 0) & (jnp.abs(qtmp) > 1e-30)

    # --- linear branch ---
    c_s = jnp.where(is_lin, c, 1.0)
    li1 = -d / c_s

    def pick(cub, cubv, qu, quv, li, liv):
        root = jnp.where(
            is_cubic, cub, jnp.where(is_quad, qu, jnp.where(is_lin, li, 0.0))
        )
        valid = (
            (is_cubic & cubv) | (is_quad & quv) | (is_lin & liv)
        )
        return root, valid

    r1, v1 = pick(cub1, cubv1, qu1, quv1, li1, jnp.asarray(True))
    r2, v2 = pick(cub2, cubv2, qu2, quv2, 0.0, jnp.asarray(False))
    r3, v3 = pick(cub3, cubv3, 0.0, jnp.asarray(False), 0.0, jnp.asarray(False))

    def polish_validate(t, valid):
        t0 = t
        for _ in range(3):
            pv = _poly_eval(a, b, c, d, t)
            dp = (3.0 * a * t + 2.0 * b) * t + c
            dp = jnp.where(jnp.abs(dp) < 1e-30, 1e-30, dp)
            t = t - pv / dp
        near = jnp.abs(t - t0) <= 0.25 * (jnp.abs(t0) + 1.0)
        ok = jnp.isfinite(t) & near
        t = jnp.where(ok, t, t0)
        res = jnp.abs(_poly_eval(a, b, c, d, t))
        term = jnp.maximum(
            jnp.maximum(jnp.abs(a * t * t * t), jnp.abs(b * t * t)),
            jnp.maximum(jnp.abs(c * t), jnp.abs(d)),
        )
        valid = valid & (res <= 1e-3 * jnp.maximum(term, 1e-30))
        return t, valid

    r1, v1 = polish_validate(r1, v1)
    r2, v2 = polish_validate(r2, v2)
    r3, v3 = polish_validate(r3, v3)

    def cand(t, valid):
        ok = valid & (t > 0) & (jnp.abs(t) < _BIG)
        return jnp.where(ok, t, _BIG)

    best = jnp.minimum(jnp.minimum(cand(r1, v1), cand(r2, v2)), cand(r3, v3))
    step = jnp.where(best < 0.5 * _BIG, best, min_step)
    return jnp.minimum(step, max_step)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _out_tile(vals):
    """Assemble the (8,128) result tile with vals in row 0 — one store."""
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for idx, val in enumerate(vals):
        out = out + jnp.where((row == 0) & (col == idx), val, 0.0)
    return out


def _make_kernel(p, nfeat, adaptive=False):
    """Kernel closure; every hyperparameter is baked in as a Python
    constant (p is a frozen dataclass — jit-static)."""
    # exp choice is static per params (see core/numerics.py /
    # params.exp_mode): precise for the C++ stops, hardware for speed
    _exp = ((lambda z: jnp.exp(-z))
            if getattr(p, "exp_mode", "precise") == "fast" else exp_neg)
    linear = p.color_mode == "linear"
    s2 = float(p.sigma) ** 2
    cs2 = float(p.c_sigma) ** 2
    # d2_thres = -2 l^2 log(sp/s2) (cvo.cpp:102): ell-dependent via l^2
    thres_c = -2.0 * math.log(float(p.sp_thres) / s2)
    if not linear:
        inv2cl2 = 1.0 / (2.0 * float(p.c_ell) ** 2)
        d2_c_thres = -2.0 * float(p.c_ell) ** 2 * math.log(
            float(p.c_sp_thres) / cs2
        )
    eps2 = float(p.eps) ** 2
    eps_2 = float(p.eps_2)
    max_iter = int(p.max_iter)
    min_step = float(p.min_step)
    max_step = float(p.max_step)
    inv_c = 1.0 / float(p.c)
    inv_d = 1.0 / float(p.d)
    color_scale = float(p.color_scale) if linear else 0.0
    sp_thres = float(p.sp_thres)
    if adaptive:
        dl_step = float(p.dl_step)
        ell_min = float(p.ell_min)
        ell_shrink = float(p.ell_shrink)
        ell_max_init = float(p.ell_max_init)
    else:
        sched = tuple(p.ell_sched)

    def kernel(init_ref, *refs):
        nplanes = 3 + nfeat + 1
        xrefs = refs[:nplanes]
        yrefs = refs[nplanes:2 * nplanes]
        if adaptive:
            # transposed orientations for the self-kernel tiles:
            # x as (1,N) rows, y as (M,1) columns
            xtr = refs[2 * nplanes:3 * nplanes]
            ytr = refs[3 * nplanes:4 * nplanes]
            phi_ref = refs[4 * nplanes]
            acc_ref = refs[4 * nplanes + 1]
        else:
            phi_ref = refs[2 * nplanes]
            acc_ref = refs[2 * nplanes + 1]

        x0, x1, x2 = (xrefs[i][:, :] for i in range(3))       # (N,1)
        xf = tuple(xrefs[3 + i][:, :] for i in range(nfeat))
        xm = xrefs[3 + nfeat][:, :]
        y0, y1, y2 = (yrefs[i][:, :] for i in range(3))       # (1,M)
        yf = tuple(yrefs[3 + i][:, :] for i in range(nfeat))
        ym = yrefs[3 + nfeat][:, :]

        bmask = (xm > 0) & (ym > 0)                           # (N,M)

        # ---- loop-invariant color tile ----
        if linear:
            ci = color_scale * (xf[0] * yf[0] + xf[1] * yf[1] + xf[2] * yf[2])
            ck = None
        else:
            d2c = (xf[0] - yf[0]) ** 2
            for f in range(1, nfeat):
                d2c = d2c + (xf[f] - yf[f]) ** 2
            ck = cs2 * _exp(d2c * inv2cl2)
            bmask = bmask & (d2c < d2_c_thres)
            ci = None

        # ---- loop-invariant self-kernel tiles (adaptive) ----
        # The Axx/Ayy position distances are rigid-transform-invariant
        # (|Ry_i+T - (Ry_j+T)| = |y_i - y_j|), so d2xx/d2yy and the
        # feature kernels are computed ONCE; per iteration only the
        # ell-dependent exp remains (adaptive_cvo.cpp:156-160 redoes
        # the whole kd-tree kernel pass for all three matrices).
        if adaptive:
            xr = tuple(xtr[i][:, :] for i in range(3))        # (1,N)
            xfr = tuple(xtr[3 + i][:, :] for i in range(nfeat))
            xmr = xtr[3 + nfeat][:, :]
            yc = tuple(ytr[i][:, :] for i in range(3))        # (M,1)
            yfc = tuple(ytr[3 + i][:, :] for i in range(nfeat))
            ymc = ytr[3 + nfeat][:, :]

            d2xx = (x0 - xr[0]) ** 2 + (x1 - xr[1]) ** 2 + (x2 - xr[2]) ** 2
            d2yy = (yc[0] - y0) ** 2 + (yc[1] - y1) ** 2 + (yc[2] - y2) ** 2
            d2c_xx = (xf[0] - xfr[0]) ** 2
            d2c_yy = (yfc[0] - yf[0]) ** 2
            for f in range(1, nfeat):
                d2c_xx = d2c_xx + (xf[f] - xfr[f]) ** 2
                d2c_yy = d2c_yy + (yfc[f] - yf[f]) ** 2
            ck_xx = cs2 * _exp(d2c_xx * inv2cl2)
            ck_yy = cs2 * _exp(d2c_yy * inv2cl2)
            bmask_xx = (xm > 0) & (xmr > 0) & (d2c_xx < d2_c_thres)
            bmask_yy = (ymc > 0) & (ym > 0) & (d2c_yy < d2_c_thres)

        R0 = tuple(init_ref[0, i] for i in range(9))
        T0 = tuple(init_ref[0, 9 + i] for i in range(3))
        c0 = tuple(init_ref[0, 12 + i] for i in range(3))  # phi center
        ell0 = init_ref[0, 15]          # length-scale seed (cvo carries
                                        # ell across pairs, cvo.cpp:408)

        def body(carry):
            (k, conv, R, T, tf, ell, ell_max, _om, _v) = carry

            # update_tf (cvo.cpp:83-87): tf = [R', -R'T], row-major [3,4]
            Rt = _mat3_t(R)
            tT = _mat3_vec(Rt, T)
            tf_new = (
                Rt[0], Rt[1], Rt[2], -tT[0],
                Rt[3], Rt[4], Rt[5], -tT[1],
                Rt[6], Rt[7], Rt[8], -tT[2],
            )

            # transform_pcd (cvo.cpp:310-315) on (1,M) rows
            ty0 = Rt[0] * y0 + Rt[1] * y1 + Rt[2] * y2 - tT[0]
            ty1 = Rt[3] * y0 + Rt[4] * y1 + Rt[5] * y2 - tT[1]
            ty2 = Rt[6] * y0 + Rt[7] * y1 + Rt[8] * y2 - tT[2]

            # se_kernel (cvo.cpp:99-161 / rkhs_se3_registration.m:125-127)
            d2 = (x0 - ty0) ** 2 + (x1 - ty1) ** 2 + (x2 - ty2) ** 2
            inv2l2 = 1.0 / (2.0 * ell * ell)
            kmat = s2 * _exp(d2 * inv2l2)
            if linear:
                gate = (kmat >= sp_thres) & bmask
                A = jnp.where(gate, ci * kmat, 0.0)
            else:
                a = kmat * ck
                gate = (d2 < thres_c * ell * ell) & (a > sp_thres) & bmask
                A = jnp.where(gate, a, 0.0)

            # length-scale gradient dl (adaptive_cvo.cpp:222-271):
            # dl = [S_yy - 2 S_xy + S_xx]/ell^3 / (nnz_xx + nnz_yy - 2 nnz_xy)
            # with S_pq = sum A_pq |p_i - q_j|^2, over the cached
            # transform-invariant self-distance tiles
            if adaptive:
                d2t = thres_c * ell * ell
                a_xx = s2 * _exp(d2xx * inv2l2) * ck_xx
                gate_xx = (d2xx < d2t) & (a_xx > sp_thres) & bmask_xx
                Axx = jnp.where(gate_xx, a_xx, 0.0)
                a_yy = s2 * _exp(d2yy * inv2l2) * ck_yy
                gate_yy = (d2yy < d2t) & (a_yy > sp_thres) & bmask_yy
                Ayy = jnp.where(gate_yy, a_yy, 0.0)
                s_xy = jnp.sum(A * d2)
                s_xx = jnp.sum(Axx * d2xx)
                s_yy = jnp.sum(Ayy * d2yy)
                n_xy = jnp.sum(jnp.where(gate, 1.0, 0.0))
                n_xx = jnp.sum(jnp.where(gate_xx, 1.0, 0.0))
                n_yy = jnp.sum(jnp.where(gate_yy, 1.0, 0.0))
                denom = n_xx + n_yy - 2.0 * n_xy
                denom = jnp.where(denom == 0.0, 1.0, denom)
                dl = (s_yy - 2.0 * s_xy + s_xx) / (ell * ell * ell) / denom

            # compute_flow (cvo.cpp:164-210), DIFFERENCE form: per-i
            #   r_i = (A y)_i - (A 1)_i x_i = sum_j A_ij (y_j - x_i)
            # cancels inside each row before the big reduction — the
            # naive col@y - row@x form subtracts two large sums whose
            # fp32 noise floor (~1e-5 at reference scale) sits above
            # the C++ stop threshold eps=5e-5 (see core/flow.py; the
            # reference's accumulators are double, cvo.cpp:171-204).
            # omega = sum_i x_i x r_i exactly (x x x = 0).
            rowA = jnp.sum(A, axis=1, keepdims=True)
            r0 = jnp.sum(A * ty0, axis=1, keepdims=True) - rowA * x0  # (N,1)
            r1 = jnp.sum(A * ty1, axis=1, keepdims=True) - rowA * x1
            r2 = jnp.sum(A * ty2, axis=1, keepdims=True) - rowA * x2
            om = (
                jnp.sum(x1 * r2 - x2 * r1) * inv_c,
                jnp.sum(x2 * r0 - x0 * r2) * inv_c,
                jnp.sum(x0 * r1 - x1 * r0) * inv_c,
            )
            vv = (
                jnp.sum(r0) * inv_d,
                jnp.sum(r1) * inv_d,
                jnp.sum(r2) * inv_d,
            )

            # compute_step_size (cvo.cpp:213-308): derivative fields by
            # the cross recursion on (1,M) rows
            w0, w1, w2 = om

            def wcross(a0, a1, a2):
                return (w1 * a2 - w2 * a1, w2 * a0 - w0 * a2, w0 * a1 - w1 * a0)

            xiz = wcross(ty0, ty1, ty2)
            xiz = (xiz[0] + vv[0], xiz[1] + vv[1], xiz[2] + vv[2])
            xi2z = wcross(*xiz)
            xi3z = wcross(*xi2z)
            xi4z = wcross(*xi3z)

            def vdot(A_, B_):
                return A_[0] * B_[0] + A_[1] * B_[1] + A_[2] * B_[2]

            normxiz2 = vdot(xiz, xiz)
            xiz_dot_xi2z = -vdot(xiz, xi2z)
            epsil_const = vdot(xi2z, xi2z) + 2.0 * vdot(xiz, xi3z)

            # ---- line-search coefficients via the moment contraction
            # (core/moments.py brought in-kernel): every per-pair field
            # beta..epsil is affine in the centered fixed point x', so
            # B..E contract the per-j coefficient polynomials against
            # MomT = Phi(x')^T A — ONE MXU op replacing the ~10 (N,M)
            # elementwise field/reduction passes of the direct form.
            momT = jax.lax.dot_general(
                phi_ref[:, :], A, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                 # [128, M]

            tc = inv2l2
            tyc = (ty0 - c0[0], ty1 - c0[1], ty2 - c0[2])
            b_a = 2.0 * tc * vdot(xiz, tyc)
            g_a = -tc * normxiz2 + 2.0 * tc * vdot(xi2z, tyc)
            d_a = 2.0 * tc * xiz_dot_xi2z + 2.0 * tc * vdot(xi3z, tyc)
            e_a = -tc * epsil_const + 2.0 * tc * vdot(xi4z, tyc)

            def aff(a_row, field):
                return Poly({
                    (0, 0, 0): a_row,
                    (1, 0, 0): -2.0 * tc * field[0],
                    (0, 1, 0): -2.0 * tc * field[1],
                    (0, 0, 1): -2.0 * tc * field[2],
                })

            beta_p = aff(b_a, xiz)
            gamma_p = aff(g_a, xi2z)
            delta_p = aff(d_a, xi3z)
            epsil_p = aff(e_a, xi4z)
            beta2_p = beta_p * beta_p
            beta3_p = beta2_p * beta_p
            beta4_p = beta3_p * beta_p
            P_B = beta_p
            P_C = gamma_p + 0.5 * beta2_p
            P_D = delta_p + gamma_p * beta_p + (1.0 / 6.0) * beta3_p
            P_E = (
                epsil_p
                + delta_p * beta_p
                + 0.5 * (gamma_p * beta_p) * beta_p
                + 0.5 * (gamma_p * gamma_p)
                + (1.0 / 24.0) * beta4_p
            )

            def contract(poly):
                s = jnp.float32(0.0)
                for e, crow in poly.terms.items():
                    i = M_INDEX[e]
                    s = s + jnp.sum(crow * momT[i:i + 1, :])
                return s

            B = contract(P_B)
            C = contract(P_C)
            D = contract(P_D)
            E = contract(P_E)
            step = _cubic_min_positive(
                4.0 * E, 3.0 * D, 2.0 * C, B, min_step, max_step
            )

            # stop 1 BEFORE the update (cvo.cpp:380)
            om_n2 = om[0] * om[0] + om[1] * om[1] + om[2] * om[2]
            v_n2 = vv[0] * vv[0] + vv[1] * vv[1] + vv[2] * vv[2]
            stop1 = (om_n2 < eps2) & (v_n2 < eps2)

            dR, dT = _exp_sek3_scalar(om, vv, step)
            RdT = _mat3_vec(R, dT)
            R_upd = _mat3_mul(R, dR)
            R_new = _lerp9(stop1, R, R_upd)
            T_new = tuple(
                jnp.where(stop1, T[i], RdT[i] + T[i]) for i in range(3)
            )

            # stop 2 AFTER the update (cvo.cpp:402)
            stop2 = _dist_se3_scalar(dR, dT) < eps_2
            converged = stop1 | stop2

            if adaptive:
                # ell gradient step + shrinking ceiling + floor
                # (adaptive_cvo.cpp:537-545)
                ell_new = ell + dl_step * dl
                hit = ell_new >= ell_max
                ell_max_new = jnp.where(hit, ell_max * ell_shrink, ell_max)
                ell_new = jnp.where(hit, ell_max * ell_shrink, ell_new)
                ell_new = jnp.maximum(ell_new, ell_min)
                ell_new = jnp.where(converged, ell, ell_new)
            else:
                # ell schedule (cvo.cpp:408-410), frozen when converged
                ell_new = ell
                for thresh, val in sched:
                    ell_new = jnp.where(k > thresh, jnp.float32(val), ell_new)
                ell_new = jnp.where(converged, ell, ell_new)
                ell_max_new = ell_max

            return (
                k + 1,
                converged.astype(jnp.int32),
                R_new,
                T_new,
                tf_new,
                ell_new,
                ell_max_new,
                om,
                vv,
            )

        def cond(carry):
            k, conv = carry[0], carry[1]
            return (k < max_iter) & (conv == 0)

        def f32(v):
            return jnp.asarray(v, jnp.float32)

        zero3 = (f32(0.0),) * 3
        tf_eye = tuple(
            f32(v) for v in (1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)
        )
        init = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            tuple(f32(v) for v in R0),
            tuple(f32(v) for v in T0),
            tf_eye,
            f32(ell0),
            f32(ell_max_init if adaptive else 1e9),
            zero3,
            zero3,
        )
        (k, conv, R, T, tf, ell, _ell_max, om, vv) = jax.lax.while_loop(
            cond, body, init
        )

        acc_ref[:, :] = _out_tile(
            list(tf)                      # 0..11  inverse transform [R'| -R'T]
            + list(R) + list(T)           # 12..23 internal R,T
            + [k.astype(jnp.float32), conv.astype(jnp.float32), ell]  # 24..26
            + list(om) + list(vv)         # 27..32
        )

    return kernel


def _make_tiled_kernel(p, nfeat, adaptive, n, m, ti, tj):
    """Reference-scale whole-align kernel (VERDICT r4 item 4): same
    while_loop-on-scalar-carries structure as `_make_kernel`, but the
    Gram is never materialized — each iteration sweeps (ti, tj) tiles
    formed on the fly from the resident coordinate planes, accumulating
    the moment matrix momT = Phi(x')^T A into a [128, m] VMEM scratch
    (static j-tile lane slices, fori over i with dynamic sublane
    slices).  Flow and the line-search coefficients are per-tile
    epilogues on momT (the production Mom epilogue of
    core/moments.py, proven at the C++ stops in round 4).

    Exact AABB tile pruning is built in: x-tile (and, for adaptive,
    y0-tile) bounds arrive as SMEM inputs computed once per align;
    transformed-y tile bounds are reduced in-kernel per iteration
    (scalars), and `pl.when` skips tile pairs wholly outside the
    position-gate radius — the kd-tree pruning of cvo.cpp:119-125.

    VMEM budget at N=M=3072: momT scratch 1.5 MB + phi 1.5 MB + tile
    temporaries ~2 MB — far below the resident kernel's ~10 (N, M)
    field requirement that capped it at ~1M pairs.
    """
    from cvo_rgbd_tpu.ops.pallas_moments import SKIP_MARGIN

    _exp = ((lambda z: jnp.exp(-z))
            if getattr(p, "exp_mode", "precise") == "fast" else exp_neg)
    linear = p.color_mode == "linear"
    s2 = float(p.sigma) ** 2
    cs2 = float(p.c_sigma) ** 2
    thres_c = -2.0 * math.log(float(p.sp_thres) / s2)
    if not linear:
        inv2cl2 = 1.0 / (2.0 * float(p.c_ell) ** 2)
        d2_c_thres = -2.0 * float(p.c_ell) ** 2 * math.log(
            float(p.c_sp_thres) / cs2
        )
    eps2 = float(p.eps) ** 2
    eps_2 = float(p.eps_2)
    max_iter = int(p.max_iter)
    min_step = float(p.min_step)
    max_step = float(p.max_step)
    inv_c = 1.0 / float(p.c)
    inv_d = 1.0 / float(p.d)
    color_scale = float(p.color_scale) if linear else 0.0
    sp_thres = float(p.sp_thres)
    use_skip = bool(getattr(p, "tile_skip", True))
    if adaptive:
        dl_step = float(p.dl_step)
        ell_min = float(p.ell_min)
        ell_shrink = float(p.ell_shrink)
        ell_max_init = float(p.ell_max_init)
    else:
        sched = tuple(p.ell_sched)
    nbi, nbj = n // ti, m // tj
    nplanes = 3 + nfeat + 1

    _I000 = M_INDEX[(0, 0, 0)]
    _I100 = M_INDEX[(1, 0, 0)]
    _I010 = M_INDEX[(0, 1, 0)]
    _I001 = M_INDEX[(0, 0, 1)]
    _I200 = M_INDEX[(2, 0, 0)]
    _I020 = M_INDEX[(0, 2, 0)]
    _I002 = M_INDEX[(0, 0, 2)]

    def _acc_read(acc, idx):
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        return jnp.sum(jnp.where((row == 0) & (col == idx), acc, 0.0))

    # scalar-vector layout: [R0(9), T0(3), c0(3), ell0(1)] then the
    # x-tile bounds (nbi * [lo0..2, hi0..2]) and y0-tile bounds
    # (nbj * 6) — one SMEM row, every read at a STATIC offset (the
    # construct set the resident kernel already proved on-chip).
    XB_OFF = 16
    YB_OFF = XB_OFF + nbi * 6

    def kernel(init_ref, *refs):
        # operands: x planes (N,1), y planes (1,M), y planes 2D
        # (nbj, tj) [+ adaptive: xtr 2D (nbi, ti), ytr (M,1)], phi.
        # The 2D copies exist because Mosaic rejects broadcasts against
        # lane-OFFSET slices of (1, M) rows (bisected on-chip,
        # scripts/tpu_construct_probe2.py case j): every tile row must
        # start at lane 0, which a (n_tiles, tile) layout guarantees.
        xrefs = refs[:nplanes]
        yrefs = refs[nplanes:2 * nplanes]
        y2d = refs[2 * nplanes:3 * nplanes]
        if adaptive:
            xtr2d = refs[3 * nplanes:4 * nplanes]
            ytr = refs[4 * nplanes:5 * nplanes]
            rest = refs[5 * nplanes:]
        else:
            rest = refs[3 * nplanes:]
        phi_ref, acc_ref, momT_s, acc_s = rest

        y0, y1, y2 = (yrefs[i][:, :] for i in range(3))       # (1,M)
        yf = tuple(yrefs[3 + i][:, :] for i in range(nfeat))
        ym = yrefs[3 + nfeat][:, :]
        # 2D tile copies: (nbj, tj), row jj = tile jj at lane 0
        y2_0, y2_1, y2_2 = (y2d[i][:, :] for i in range(3))
        y2f = tuple(y2d[3 + i][:, :] for i in range(nfeat))
        y2m = y2d[3 + nfeat][:, :]

        R0 = tuple(init_ref[0, i] for i in range(9))
        T0 = tuple(init_ref[0, 9 + i] for i in range(3))
        c0 = tuple(init_ref[0, 12 + i] for i in range(3))
        ell0 = init_ref[0, 15]

        def x_tile(i):
            """Dynamic sublane slices of the x planes + phi at tile i."""
            sl = pl.ds(i * ti, ti)
            pos = tuple(xrefs[k][sl, :] for k in range(3))      # (TI,1)
            feat = tuple(xrefs[3 + k][sl, :] for k in range(nfeat))
            mask = xrefs[3 + nfeat][sl, :]
            return pos, feat, mask, phi_ref[sl, :]

        def pair_tile(xp, xf_, xm_, typ, tyf, tym, inv2l2, ell):
            """A tile from (TI,1) x-columns and (1,TJ) y-rows."""
            d2 = ((xp[0] - typ[0]) ** 2 + (xp[1] - typ[1]) ** 2
                  + (xp[2] - typ[2]) ** 2)
            kmat = s2 * _exp(d2 * inv2l2)
            bm = (xm_ > 0) & (tym > 0)
            if linear:
                ci = color_scale * (
                    xf_[0] * tyf[0] + xf_[1] * tyf[1] + xf_[2] * tyf[2]
                )
                gate = (kmat >= sp_thres) & bm
                return jnp.where(gate, ci * kmat, 0.0), d2, gate
            d2c = (xf_[0] - tyf[0]) ** 2
            for f in range(1, nfeat):
                d2c = d2c + (xf_[f] - tyf[f]) ** 2
            ck = cs2 * _exp(d2c * inv2cl2)
            a = kmat * ck
            gate = ((d2 < thres_c * ell * ell) & (d2c < d2_c_thres)
                    & (a > sp_thres) & bm)
            return jnp.where(gate, a, 0.0), d2, gate

        def bound_ok(i, lo_y, hi_y, d2t, off):
            """Scalar AABB lower bound (packed bounds at STATIC row i,
            SMEM offset `off`) vs the gate radius; True = the tile may
            contain live pairs."""
            if not use_skip:
                return jnp.asarray(True)
            md = jnp.float32(0.0)
            for k in range(3):
                lo_x = init_ref[0, off + 6 * i + k]
                hi_x = init_ref[0, off + 6 * i + 3 + k]
                gap = jnp.maximum(
                    jnp.maximum(lo_y[k] - hi_x, lo_x - hi_y[k]), 0.0
                )
                md = md + gap * gap
            return md <= d2t + SKIP_MARGIN

        def body(carry):
            (k, conv, R, T, tf, ell, ell_max, _om, _v) = carry

            Rt = _mat3_t(R)
            tT = _mat3_vec(Rt, T)
            tf_new = (
                Rt[0], Rt[1], Rt[2], -tT[0],
                Rt[3], Rt[4], Rt[5], -tT[1],
                Rt[6], Rt[7], Rt[8], -tT[2],
            )
            ty0 = Rt[0] * y0 + Rt[1] * y1 + Rt[2] * y2 - tT[0]   # (1,M)
            ty1 = Rt[3] * y0 + Rt[4] * y1 + Rt[5] * y2 - tT[1]
            ty2 = Rt[6] * y0 + Rt[7] * y1 + Rt[8] * y2 - tT[2]

            inv2l2 = 1.0 / (2.0 * ell * ell)
            d2t = thres_c * ell * ell

            momT_s[:, :] = jnp.zeros((128, m), jnp.float32)
            acc_s[:, :] = jnp.zeros((8, 128), jnp.float32)

            # transformed 2D y copies — row jj is tile jj at lane 0
            t2_0 = Rt[0] * y2_0 + Rt[1] * y2_1 + Rt[2] * y2_2 - tT[0]
            t2_1 = Rt[3] * y2_0 + Rt[4] * y2_1 + Rt[5] * y2_2 - tT[1]
            t2_2 = Rt[6] * y2_0 + Rt[7] * y2_1 + Rt[8] * y2_2 - tT[2]

            # ---- PASS A: moment accumulation, tile grid ----
            ty_tiles = []
            ybounds = []
            for jj in range(nbj):
                rsl = slice(jj, jj + 1)
                typ = (t2_0[rsl, :], t2_1[rsl, :], t2_2[rsl, :])
                tyf = tuple(f[rsl, :] for f in y2f)
                tym = y2m[rsl, :]
                ty_tiles.append((typ, tyf, tym))
                if use_skip:
                    valid = tym > 0
                    lo = tuple(
                        jnp.min(jnp.where(valid, c, _BIG)) for c in typ
                    )
                    hi = tuple(
                        jnp.max(jnp.where(valid, c, -_BIG)) for c in typ
                    )
                    ybounds.append((lo, hi))
                else:
                    ybounds.append((None, None))

                # STATIC i loop: unrolled tile pairs keep every slice
                # offset and SMEM read static (the proven construct
                # set); the skip guard is the only pl.when
                for i in range(nbi):
                    def work(i=i, typ=typ, tyf=tyf, tym=tym, jj=jj):
                        xp, xf_, xm_, phi_t = x_tile(i)
                        A, _d2, gate = pair_tile(
                            xp, xf_, xm_, typ, tyf, tym, inv2l2, ell
                        )
                        contrib = jax.lax.dot_general(
                            phi_t, A, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )                                    # [128, TJ]
                        momT_s[:, jj * tj:(jj + 1) * tj] += contrib
                        acc_s[:, :] += _out_tile(
                            [jnp.sum(jnp.where(gate, 1.0, 0.0))]
                        )

                    if use_skip:
                        pl.when(bound_ok(
                            i, ybounds[jj][0], ybounds[jj][1], d2t,
                            XB_OFF,
                        ))(work)
                    else:
                        work()

            # ---- flow epilogue from momT, full (1, M) width (the
            # core/moments.py math; rows of the scratch are static
            # sublane slices) ----
            tyc_f = (ty0 - c0[0], ty1 - c0[1], ty2 - c0[2])
            S0 = momT_s[_I000:_I000 + 1, :]
            S1x = momT_s[_I100:_I100 + 1, :]
            S1y = momT_s[_I010:_I010 + 1, :]
            S1z = momT_s[_I001:_I001 + 1, :]
            r0 = S0 * tyc_f[0] - S1x
            r1 = S0 * tyc_f[1] - S1y
            r2 = S0 * tyc_f[2] - S1z
            rs0, rs1, rs2 = jnp.sum(r0), jnp.sum(r1), jnp.sum(r2)
            om = (
                (jnp.sum(S1y * tyc_f[2] - S1z * tyc_f[1])
                 + c0[1] * rs2 - c0[2] * rs1) * inv_c,
                (jnp.sum(S1z * tyc_f[0] - S1x * tyc_f[2])
                 + c0[2] * rs0 - c0[0] * rs2) * inv_c,
                (jnp.sum(S1x * tyc_f[1] - S1y * tyc_f[0])
                 + c0[0] * rs1 - c0[1] * rs0) * inv_c,
            )
            vv = (rs0 * inv_d, rs1 * inv_d, rs2 * inv_d)
            if adaptive:
                S2tr = (momT_s[_I200:_I200 + 1, :]
                        + momT_s[_I020:_I020 + 1, :]
                        + momT_s[_I002:_I002 + 1, :])
                wsq_xy = jnp.sum(
                    S2tr
                    - 2.0 * (S1x * tyc_f[0] + S1y * tyc_f[1]
                             + S1z * tyc_f[2])
                    + S0 * (tyc_f[0] ** 2 + tyc_f[1] ** 2 + tyc_f[2] ** 2)
                )

            # ---- adaptive dl: lean self sweeps over x-x and y-y ----
            if adaptive:
                n_xy = _acc_read(acc_s[:, :], 0)
                acc_s[:, :] = jnp.zeros((8, 128), jnp.float32)
                # Axx: x row tiles (TI,1) vs the 2D transposed-x copy
                # (row jj = tile jj at lane 0)
                x2r = tuple(xtr2d[c][:, :] for c in range(nplanes))
                for jj in range(nbi):
                    rsl = slice(jj, jj + 1)
                    cxp = tuple(x2r[c][rsl, :] for c in range(3))
                    cxf = tuple(x2r[3 + c][rsl, :] for c in range(nfeat))
                    cxm = x2r[3 + nfeat][rsl, :]
                    if use_skip:
                        lo = tuple(
                            init_ref[0, XB_OFF + 6 * jj + c]
                            for c in range(3)
                        )
                        hi = tuple(
                            init_ref[0, XB_OFF + 6 * jj + 3 + c]
                            for c in range(3)
                        )
                    else:
                        lo = hi = None

                    # symmetric: upper triangle only, off-diag 2x —
                    # static loop bounds make the triangle free
                    for i in range(jj + 1):
                        def work(i=i, jj=jj, cxp=cxp, cxf=cxf, cxm=cxm):
                            xp, xf_, xm_, _phi = x_tile(i)
                            Axx, d2, gate = pair_tile(
                                xp, xf_, xm_, cxp, cxf, cxm, inv2l2, ell
                            )
                            wgt = 2.0 if i < jj else 1.0
                            acc_s[:, :] += _out_tile([
                                wgt * jnp.sum(Axx * d2),
                                wgt * jnp.sum(jnp.where(gate, 1.0, 0.0)),
                            ])

                        if use_skip:
                            pl.when(bound_ok(i, lo, hi, d2t, XB_OFF))(work)
                        else:
                            work()
                s_xx = _acc_read(acc_s[:, :], 0)
                n_xx = _acc_read(acc_s[:, :], 1)

                acc_s[:, :] = jnp.zeros((8, 128), jnp.float32)
                # Ayy: transformed y column tiles vs transformed y rows.
                # Self-distances are rigid-invariant, so y0 bounds
                # (yb_ref) prune exactly.  Tiles come off the ytr REFS
                # (dynamic sublane ref slices lower; lax.dynamic_slice
                # on computed values does NOT) and are transformed
                # per tile — 9 FMAs per coordinate row.

                def y_tile(i):
                    sl = pl.ds(i * tj, tj)
                    p0 = ytr[0][sl, :]
                    p1 = ytr[1][sl, :]
                    p2 = ytr[2][sl, :]
                    pos = (
                        Rt[0] * p0 + Rt[1] * p1 + Rt[2] * p2 - tT[0],
                        Rt[3] * p0 + Rt[4] * p1 + Rt[5] * p2 - tT[1],
                        Rt[6] * p0 + Rt[7] * p1 + Rt[8] * p2 - tT[2],
                    )
                    feat = tuple(
                        ytr[3 + c][sl, :] for c in range(nfeat)
                    )
                    return pos, feat, ytr[3 + nfeat][sl, :]

                for jj in range(nbj):
                    (typ, tyf, tym) = ty_tiles[jj]
                    if use_skip:
                        # y0 bounds prune the rigid-invariant self
                        # distances exactly
                        lo = tuple(
                            init_ref[0, YB_OFF + 6 * jj + c]
                            for c in range(3)
                        )
                        hi = tuple(
                            init_ref[0, YB_OFF + 6 * jj + 3 + c]
                            for c in range(3)
                        )
                    else:
                        lo = hi = None

                    for i in range(jj + 1):
                        def work(i=i, jj=jj, typ=typ, tyf=tyf, tym=tym):
                            ypc, yfc_, ymc_ = y_tile(i)
                            Ayy, d2, gate = pair_tile(
                                ypc, yfc_, ymc_, typ, tyf, tym, inv2l2,
                                ell,
                            )
                            wgt = 2.0 if i < jj else 1.0
                            acc_s[:, :] += _out_tile([
                                wgt * jnp.sum(Ayy * d2),
                                wgt * jnp.sum(jnp.where(gate, 1.0, 0.0)),
                            ])

                        if use_skip:
                            pl.when(bound_ok(i, lo, hi, d2t, YB_OFF))(work)
                        else:
                            work()
                s_yy = _acc_read(acc_s[:, :], 0)
                n_yy = _acc_read(acc_s[:, :], 1)

                denom = n_xx + n_yy - 2.0 * n_xy
                denom = jnp.where(denom == 0.0, 1.0, denom)
                dl = ((s_yy - 2.0 * wsq_xy + s_xx)
                      / (ell * ell * ell) / denom)

            # ---- line-search coefficients from momT, full (1, M)
            # width (identical to the resident kernel's PASS B, with
            # momT read from the scratch rows) ----
            w0, w1, w2 = om

            def wcross(a0, a1, a2):
                return (w1 * a2 - w2 * a1, w2 * a0 - w0 * a2,
                        w0 * a1 - w1 * a0)

            tc = inv2l2
            xiz = wcross(ty0, ty1, ty2)
            xiz = (xiz[0] + vv[0], xiz[1] + vv[1], xiz[2] + vv[2])
            xi2z = wcross(*xiz)
            xi3z = wcross(*xi2z)
            xi4z = wcross(*xi3z)

            def vdot(A_, B_):
                return A_[0] * B_[0] + A_[1] * B_[1] + A_[2] * B_[2]

            normxiz2 = vdot(xiz, xiz)
            xiz_dot_xi2z = -vdot(xiz, xi2z)
            epsil_const = vdot(xi2z, xi2z) + 2.0 * vdot(xiz, xi3z)
            b_a = 2.0 * tc * vdot(xiz, tyc_f)
            g_a = -tc * normxiz2 + 2.0 * tc * vdot(xi2z, tyc_f)
            d_a = 2.0 * tc * xiz_dot_xi2z + 2.0 * tc * vdot(xi3z, tyc_f)
            e_a = -tc * epsil_const + 2.0 * tc * vdot(xi4z, tyc_f)

            def aff(a_row, field):
                return Poly({
                    (0, 0, 0): a_row,
                    (1, 0, 0): -2.0 * tc * field[0],
                    (0, 1, 0): -2.0 * tc * field[1],
                    (0, 0, 1): -2.0 * tc * field[2],
                })

            beta_p = aff(b_a, xiz)
            gamma_p = aff(g_a, xi2z)
            delta_p = aff(d_a, xi3z)
            epsil_p = aff(e_a, xi4z)
            beta2_p = beta_p * beta_p
            beta3_p = beta2_p * beta_p
            beta4_p = beta3_p * beta_p
            P_B = beta_p
            P_C = gamma_p + 0.5 * beta2_p
            P_D = delta_p + gamma_p * beta_p + (1.0 / 6.0) * beta3_p
            P_E = (
                epsil_p
                + delta_p * beta_p
                + 0.5 * (gamma_p * beta_p) * beta_p
                + 0.5 * (gamma_p * gamma_p)
                + (1.0 / 24.0) * beta4_p
            )

            def contract(poly):
                s = jnp.float32(0.0)
                for e, crow in poly.terms.items():
                    i = M_INDEX[e]
                    s = s + jnp.sum(crow * momT_s[i:i + 1, :])
                return s

            B = contract(P_B)
            C = contract(P_C)
            D = contract(P_D)
            E = contract(P_E)

            step = _cubic_min_positive(
                4.0 * E, 3.0 * D, 2.0 * C, B, min_step, max_step
            )

            om_n2 = om[0] * om[0] + om[1] * om[1] + om[2] * om[2]
            v_n2 = vv[0] * vv[0] + vv[1] * vv[1] + vv[2] * vv[2]
            stop1 = (om_n2 < eps2) & (v_n2 < eps2)

            dR, dT = _exp_sek3_scalar(om, vv, step)
            RdT = _mat3_vec(R, dT)
            R_upd = _mat3_mul(R, dR)
            R_new = _lerp9(stop1, R, R_upd)
            T_new = tuple(
                jnp.where(stop1, T[i], RdT[i] + T[i]) for i in range(3)
            )
            stop2 = _dist_se3_scalar(dR, dT) < eps_2
            converged = stop1 | stop2

            if adaptive:
                ell_new = ell + dl_step * dl
                hit = ell_new >= ell_max
                ell_max_new = jnp.where(hit, ell_max * ell_shrink, ell_max)
                ell_new = jnp.where(hit, ell_max * ell_shrink, ell_new)
                ell_new = jnp.maximum(ell_new, ell_min)
                ell_new = jnp.where(converged, ell, ell_new)
            else:
                ell_new = ell
                for thresh, val in sched:
                    ell_new = jnp.where(k > thresh, jnp.float32(val), ell_new)
                ell_new = jnp.where(converged, ell, ell_new)
                ell_max_new = ell_max

            return (
                k + 1,
                converged.astype(jnp.int32),
                R_new,
                T_new,
                tf_new,
                ell_new,
                ell_max_new,
                om,
                vv,
            )

        def cond(carry):
            k, conv = carry[0], carry[1]
            return (k < max_iter) & (conv == 0)

        def f32(v):
            return jnp.asarray(v, jnp.float32)

        zero3 = (f32(0.0),) * 3
        tf_eye = tuple(
            f32(v) for v in (1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)
        )
        init = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            tuple(f32(v) for v in R0),
            tuple(f32(v) for v in T0),
            tf_eye,
            f32(ell0),
            f32(ell_max_init if adaptive else 1e9),
            zero3,
            zero3,
        )
        (k, conv, R, T, tf, ell, _ell_max, om, vv) = jax.lax.while_loop(
            cond, body, init
        )

        acc_ref[:, :] = _out_tile(
            list(tf)
            + list(R) + list(T)
            + [k.astype(jnp.float32), conv.astype(jnp.float32), ell]
            + list(om) + list(vv)
        )

    return kernel


def _fused_mode(p, fixed, moving):
    """None (ineligible), "resident" (whole clouds as VMEM field tiles,
    the original mega-kernel) or "tiled" (reference-scale grid sweep,
    _make_tiled_kernel).  Small problems keep the resident kernel (one
    tile, no loop machinery); anything larger that is 128-aligned runs
    tiled — N=M=3072 (the cvo.cpp:99-161 workload) included."""
    from cvo_rgbd_tpu.params import AcvoParams

    n, m = fixed.positions.shape[0], moving.positions.shape[0]
    adaptive = isinstance(p, AcvoParams)
    if adaptive and (p.yy_quirk or p.color_mode != "se"):
        return None
    if p.color_mode == "linear" and fixed.features.shape[1] != 3:
        return None
    if adaptive:
        if n % 128 == 0 and m % 128 == 0 and (
            n * m + n * n + m * m
        ) <= (3 << 20):
            return "resident"
    elif n % 8 == 0 and m % 128 == 0 and n * m <= (1 << 20):
        return "resident"
    # tiled: VMEM residency allows ~16k/side, but the cap is set by
    # what the kernel GENERATOR has been validated to: the tile loops
    # are statically unrolled (nbi*nbj Pass-A bodies + two triangle
    # sweeps) and the scalar prefetch row grows as 16+6*(nbi+nbj).
    # N=M=3072 (24x24 bodies at 128-sublane tiles, SMEM row 160 — the
    # largest shape exercised on-chip, docs/PERF.md) is the reference
    # workload; 4096 keeps one octave of headroom while bounding the
    # unroll at ~2x the measured compile.  Larger clouds fall back to
    # the per-iteration pallas backend, which handles any 128-multiple
    # without unroll growth.
    if n % 128 == 0 and m % 128 == 0 and n <= 4096 and m <= 4096:
        return "tiled"
    return None


def fused_eligible(p, fixed, moving) -> bool:
    """True when `align_fused` can run this problem (see _fused_mode).
    `core.registration.align` uses this to fall back to the standard
    backends otherwise."""
    return _fused_mode(p, fixed, moving) is not None


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def align_fused(p, fixed, moving, R0=None, T0=None, ell0=None, *,
                interpret=None):
    """Single-kernel align; drop-in for core.registration.align on
    VMEM-resident clouds (cvo and acvo — see `fused_eligible`).

    Returns the same AlignResult contract (tf from the top of the last
    executed iteration, iterations = k-1, cvo.cpp:413-415).  `R0`/`T0`
    seed the internal R, T state and `ell0` the length-scale (see
    core.registration.align's warm-start note).
    """
    from cvo_rgbd_tpu.core.registration import AlignResult

    def _pack_x(pos, feat, mask):
        cols = [pos[:, k:k + 1] for k in range(3)]
        cols += [feat[:, k:k + 1] for k in range(feat.shape[1])]
        cols.append(mask.reshape(-1, 1))
        return cols

    def _pack_y(pos, feat, mask):
        rows = [pos[:, k].reshape(1, -1) for k in range(3)]
        rows += [feat[:, k].reshape(1, -1) for k in range(feat.shape[1])]
        rows.append(mask.reshape(1, -1))
        return rows

    from cvo_rgbd_tpu.params import AcvoParams

    adaptive = isinstance(p, AcvoParams)
    mode = _fused_mode(p, fixed, moving)
    if mode is None:
        raise ValueError(
            "problem not eligible for the fused kernel (capacity "
            "alignment, VMEM pair budget, color/feature layout, or "
            "yy_quirk) — use backend='pallas' or 'xla'"
        )
    interpret = _auto_interpret(interpret)
    nfeat = int(fixed.features.shape[1])

    R0 = (jnp.eye(3, dtype=jnp.float32) if R0 is None
          else jnp.asarray(R0, jnp.float32))
    T0 = jnp.zeros(3, jnp.float32) if T0 is None else jnp.asarray(T0, jnp.float32)

    # center for the moment basis: masked centroid of the fixed cloud
    # (bounds the degree-4 monomial cancellation, core/step_factored.py)
    from cvo_rgbd_tpu.core.moments import monomial_features_padded

    w = fixed.mask.astype(jnp.float32)
    c0 = jnp.sum(fixed.positions * w[:, None], axis=0) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    phi = monomial_features_padded(fixed.positions - c0)       # [N,128]

    ell0 = jnp.asarray(p.ell_init if ell0 is None else ell0, jnp.float32)
    init = jnp.concatenate([R0.reshape(9), T0.reshape(3), c0,
                            ell0.reshape(1)])
    init = init.reshape(1, 16).astype(jnp.float32)

    nplanes = 3 + nfeat + 1
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if mode == "tiled":
        from cvo_rgbd_tpu.ops.pallas_gram import _tile, block_bounds

        n, m = fixed.positions.shape[0], moving.positions.shape[0]
        ti, tj = _tile(n), _tile(m)

        def _pack_2d(pos, feat, mask, t):
            """Nine (n_tiles, t) planes: row jj = tile jj at lane 0
            (Mosaic rejects broadcasts against lane-offset row slices
            — scripts/tpu_construct_probe2.py case j)."""
            nb = pos.shape[0] // t
            planes = [pos[:, k].reshape(nb, t) for k in range(3)]
            planes += [feat[:, k].reshape(nb, t) for k in range(feat.shape[1])]
            planes.append(mask.reshape(nb, t))
            return planes

        operands = (
            list(_pack_x(fixed.positions, fixed.features, fixed.mask))
            + list(_pack_y(moving.positions, moving.features, moving.mask))
            + _pack_2d(moving.positions, moving.features, moving.mask, tj)
        )
        if adaptive:
            operands += _pack_2d(
                fixed.positions, fixed.features, fixed.mask, ti
            )
            operands += list(
                _pack_x(moving.positions, moving.features, moving.mask)
            )
        operands.append(phi)

        def bounds6(cloud, t):
            lo, hi = block_bounds(cloud.positions, cloud.mask, t)
            # the kernel compares finite gaps; empty tiles must skip,
            # so replace the +/-inf sentinels with huge finite values
            # (inf - inf = nan would un-skip them)
            lo = jnp.nan_to_num(lo, posinf=1e30, neginf=-1e30)
            hi = jnp.nan_to_num(hi, posinf=1e30, neginf=-1e30)
            return jnp.concatenate([lo, hi], axis=1).reshape(-1)

        # bounds ride the SMEM scalar row after [R0,T0,c0,ell0]
        # (static offsets in-kernel); y0 bounds are exact for the
        # rigid-invariant self distances and shift-equal for xy
        init = jnp.concatenate([
            init.reshape(-1), bounds6(fixed, ti), bounds6(moving, tj),
        ])
        init = init.reshape(1, -1).astype(jnp.float32)
        acc = pl.pallas_call(
            _make_tiled_kernel(p, nfeat, adaptive, n, m, ti, tj),
            in_specs=[smem] + [vmem] * len(operands),
            out_specs=vmem,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((128, m), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(init, *operands)
    else:
        operands = (
            list(_pack_x(fixed.positions, fixed.features, fixed.mask))
            + list(_pack_y(moving.positions, moving.features, moving.mask))
        )
        if adaptive:
            # transposed orientations for the Axx/Ayy self tiles
            operands += list(
                _pack_y(fixed.positions, fixed.features, fixed.mask)
            )
            operands += list(
                _pack_x(moving.positions, moving.features, moving.mask)
            )
        operands.append(phi)
        acc = pl.pallas_call(
            _make_kernel(p, nfeat, adaptive),
            in_specs=[smem] + [vmem] * len(operands),
            out_specs=vmem,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            # the default 16 MB *scoped* vmem budget undercounts what
            # v5e actually has; the iteration body keeps ~10 (N,M)
            # temporaries live (A, d2, the 4 line-search fields,
            # dotfield scratch), plus for adaptive the cached
            # self-distance/color tiles
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(init, *operands)

    row0 = acc[0]
    tf = jnp.concatenate([
        row0[0:12].reshape(3, 4),
        jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
    ])
    return AlignResult(
        tf=tf,
        R=row0[12:21].reshape(3, 3),
        T=row0[21:24],
        iterations=row0[24].astype(jnp.int32) - 1,
        converged=row0[25] > 0,
        ell=row0[26],
        omega=row0[27:30],
        v=row0[30:33],
    )
