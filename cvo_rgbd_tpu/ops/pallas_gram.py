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

Both recompute the A tile from the clouds — exp is cheap, HBM is not.
Accumulation uses the standard constant-output-block pattern: the
(8, 128) accumulator block stays resident in VMEM across the whole
grid; slot layout is documented next to each kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# preferred row/col tile sizes; capacities that are multiples of 128 but
# not 256 fall back to 128-tiles (pad_cloud guarantees 128-alignment)
TILE_I = 256
TILE_J = 256


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

_HI = jax.lax.Precision.HIGHEST


def _gram_tile(xp, xm, yp, ym, d2c, scal):
    """A tile from position blocks + precomputed color distance tile.

    scal: (ell, s2, cs2, inv_2l2, inv_2cl2, d2_thres, d2_c_thres, sp_thres)
    """
    (ell, s2, cs2, inv_2l2, inv_2cl2, d2_thres, d2_c_thres, sp_thres) = scal
    x2 = jnp.sum(xp * xp, axis=-1)
    y2 = jnp.sum(yp * yp, axis=-1)
    xy = jax.lax.dot_general(
        xp, yp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )
    d2 = jnp.maximum(x2[:, None] + y2[None, :] - 2.0 * xy, 0.0)
    k = s2 * jnp.exp(-d2 * inv_2l2)
    ck = cs2 * jnp.exp(-d2c * inv_2cl2)
    a = k * ck
    gate = (
        (d2 < d2_thres)
        & (d2c < d2_c_thres)
        & (a > sp_thres)
        & (xm[:, None] > 0)
        & (ym[None, :] > 0)
    )
    return jnp.where(gate, a, 0.0), d2


def _color_d2_tile(xf, yf):
    xf2 = jnp.sum(xf * xf, axis=-1)
    yf2 = jnp.sum(yf * yf, axis=-1)
    xyf = jax.lax.dot_general(
        xf, yf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )
    return jnp.maximum(xf2[:, None] + yf2[None, :] - 2.0 * xyf, 0.0)


def _unpack_scal(s_ref):
    return tuple(s_ref[0, i] for i in range(8))



def _acc_update(vals):
    """Build an (8, 128) tensor with vals in row 0, cols 0..len-1.

    Mosaic cannot store scalars into VMEM refs; accumulation is done as
    one vectorized full-tile add instead.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    upd = jnp.zeros((8, 128), jnp.float32)
    for idx, val in enumerate(vals):
        upd = upd + jnp.where((row == 0) & (col == idx), val, 0.0)
    return upd


def _flow_kernel(s_ref, xp_ref, xf_ref, xm_ref, yp_ref, yf_ref, ym_ref,
                 acc_ref):
    """Accumulator slots (row 0): 0-2 omega*c, 3-5 v*d, 6 sum A|x-y|^2,
    7 nnz, 8 sum A."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    scal = _unpack_scal(s_ref)
    xp = xp_ref[:, :3]
    yp = yp_ref[:, :3]
    d2c = _color_d2_tile(xf_ref[:, :5], yf_ref[:, :5])
    A, d2 = _gram_tile(xp, xm_ref[0, :], yp, ym_ref[0, :], d2c, scal)

    Ay = jax.lax.dot_general(
        A, yp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # [TI, 3]
    row = jnp.sum(A, axis=1)
    col = jnp.sum(A, axis=0)

    cx = xp[:, 1] * Ay[:, 2] - xp[:, 2] * Ay[:, 1]
    cy = xp[:, 2] * Ay[:, 0] - xp[:, 0] * Ay[:, 2]
    cz = xp[:, 0] * Ay[:, 1] - xp[:, 1] * Ay[:, 0]
    omega_p = (jnp.sum(cx), jnp.sum(cy), jnp.sum(cz))
    # Mosaic cannot lower rank-1 dot_general; broadcast-sum on the VPU
    cy_sum = col[:, None] * yp
    rx_sum = row[:, None] * xp
    v_p = (
        jnp.sum(cy_sum[:, 0]) - jnp.sum(rx_sum[:, 0]),
        jnp.sum(cy_sum[:, 1]) - jnp.sum(rx_sum[:, 1]),
        jnp.sum(cy_sum[:, 2]) - jnp.sum(rx_sum[:, 2]),
    )
    wsq = jnp.sum(A * d2)
    nnz = jnp.sum((A > 0).astype(jnp.float32))
    sA = jnp.sum(A)

    acc_ref[:, :] += _acc_update([
        omega_p[0], omega_p[1], omega_p[2],
        v_p[0], v_p[1], v_p[2],
        wsq, nnz, sA,
    ])


def _step_kernel(s_ref, wv_ref, xp_ref, xf_ref, xm_ref, yp_ref, yf_ref,
                 ym_ref, acc_ref):
    """Accumulator slots (row 0): 0 B, 1 C, 2 D, 3 E."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    scal = _unpack_scal(s_ref)
    ell = scal[0]
    w0, w1, w2 = wv_ref[0, 0], wv_ref[0, 1], wv_ref[0, 2]
    v0, v1, v2 = wv_ref[0, 3], wv_ref[0, 4], wv_ref[0, 5]

    xp = xp_ref[:, :3]
    yp = yp_ref[:, :3]
    d2c = _color_d2_tile(xf_ref[:, :5], yf_ref[:, :5])
    A, _ = _gram_tile(xp, xm_ref[0, :], yp, ym_ref[0, :], d2c, scal)

    # Per-j derivative fields (cvo.cpp:226-238) via the recursion
    # xi^{k+1}z = omega x (xi^k z): pure VPU column arithmetic — no tiny
    # 3x3 matmuls, which Mosaic cannot lower.
    y0, y1, y2 = yp[:, 0], yp[:, 1], yp[:, 2]
    x0, x1, x2 = xp[:, 0], xp[:, 1], xp[:, 2]

    def wcross(a0, a1, a2):
        return (w1 * a2 - w2 * a1, w2 * a0 - w0 * a2, w0 * a1 - w1 * a0)

    xiz = wcross(y0, y1, y2)
    xiz = (xiz[0] + v0, xiz[1] + v1, xiz[2] + v2)
    xi2z = wcross(*xiz)
    xi3z = wcross(*xi2z)
    xi4z = wcross(*xi3z)

    def vdot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    normxiz2 = vdot(xiz, xiz)
    xiz_dot_xi2z = -vdot(xiz, xi2z)
    epsil_const = vdot(xi2z, xi2z) + 2.0 * vdot(xiz, xi3z)

    def dotfield(wf):
        # [TI,TJ] matrix of wf_j . (x_i - y_j) via three broadcasts
        s = (
            x0[:, None] * wf[0][None, :]
            + x1[:, None] * wf[1][None, :]
            + x2[:, None] * wf[2][None, :]
        )
        wy = wf[0] * y0 + wf[1] * y1 + wf[2] * y2
        return s - wy[None, :]

    tc = 1.0 / (2.0 * ell * ell)
    beta = -2.0 * tc * dotfield(xiz)
    gamma = -tc * (normxiz2[None, :] + 2.0 * dotfield(xi2z))
    delta = 2.0 * tc * (xiz_dot_xi2z[None, :] - dotfield(xi3z))
    epsil = -tc * (epsil_const[None, :] + 2.0 * dotfield(xi4z))

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


def _specs(n, m):
    ti, tj = _tile(n), _tile(m)
    gi = n // ti
    gj = m // tj
    smem = pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    xspec = [
        pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, 5), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    yspec = [
        pl.BlockSpec((tj, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tj, 5), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    out = pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    return (gi, gj), smem, xspec, yspec, out


def _check(n, m):
    _tile(n), _tile(m)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_flow(xp, xf, xm, yp, yf, ym, ell, *, p, interpret=None):
    """Fused gram+flow: returns (omega, v, wsq_sum, nnz, sum_A)."""
    interpret = _auto_interpret(interpret)
    n, m = xp.shape[0], yp.shape[0]
    _check(n, m)
    grid, smem, xspec, yspec, out = _specs(n, m)
    acc = pl.pallas_call(
        _flow_kernel,
        grid=grid,
        in_specs=[smem] + xspec + yspec,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(
        _scal_vector(ell, p),
        xp, xf, xm.reshape(1, -1), yp, yf, ym.reshape(1, -1),
    )
    omega = acc[0, 0:3] / p.c
    v = acc[0, 3:6] / p.d
    return omega, v, acc[0, 6], acc[0, 7], acc[0, 8]


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def fused_step_coeffs(xp, xf, xm, yp, yf, ym, ell, omega, v, *, p,
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
    acc = pl.pallas_call(
        _step_kernel,
        grid=grid,
        in_specs=[smem, wv_spec] + xspec + yspec,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(
        _scal_vector(ell, p),
        wv,
        xp, xf, xm.reshape(1, -1), yp, yf, ym.reshape(1, -1),
    )
    return acc[0, 0], acc[0, 1], acc[0, 2], acc[0, 3]
