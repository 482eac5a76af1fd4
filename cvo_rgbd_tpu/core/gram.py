"""Masked dense Gram (kernel) matrix — the heart of CVO, TPU-style.

The reference sparsifies the N x M squared-exponential kernel with a
kd-tree radius search plus threshold gates (cvo.cpp:99-161).  On TPU the
Gram matrix is evaluated *densely* on the MXU: the squared-distance
matrix is one rank-3 matmul (`|x|^2 + |y|^2 - 2 x.y`), and every gate of
the reference becomes a mask:

    d2      <  d2_thres    (the kd-tree radius test, cvo.cpp:119-125 —
                            identical by construction: the radius *is*
                            -2 l^2 log(sp_thres / s2), cvo.cpp:102)
    d2_col  <  d2_c_thres  (color gate, cvo.cpp:148)
    a       >  sp_thres    (final sparsity gate, cvo.cpp:152)
    valid_x, valid_y       (padding masks, no reference analog)

At the reference workload (N ~ M ~ 3000) this is ~9M pairs — trivial for
the MXU, and removes the entire nanoflann/triplet machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# bf16 MXU passes (the TPU default for fp32 matmuls) put a ~1e-3
# relative noise floor on the distance/reduction contractions, which
# breaks the Gram symmetry cancellations and leaves a mm-level pose
# bias.  All contractions here pin full-fp32 MXU precision.
_HI = jax.lax.Precision.HIGHEST


def pairwise_sqdist(x, y):
    """[N,d],[M,d] -> [N,M] squared distances via the MXU.

    Matches rkhs_se3_registration.m:68-69 (the MATLAB dense spec).
    """
    x2 = jnp.sum(x * x, axis=-1)
    y2 = jnp.sum(y * y, axis=-1)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32, precision=_HI)
    d2 = x2[..., :, None] + y2[..., None, :] - 2.0 * xy
    return jnp.maximum(d2, 0.0)


def se_gram(
    x_pos,
    x_feat,
    x_mask,
    y_pos,
    y_feat,
    y_mask,
    ell,
    *,
    sigma,
    c_ell,
    c_sigma,
    sp_thres,
    c_sp_thres,
):
    """Masked dense A = (s^2 e^{-d2/2l^2}) * (cs^2 e^{-d2c/2cl^2}).

    Reference: cvo::se_kernel (cvo.cpp:99-161) and the parameterized
    acvo::se_kernel (adaptive_cvo.cpp:92-151).  Returns the dense [N,M]
    coefficient matrix with gated-out entries exactly 0.
    """
    s2 = sigma * sigma
    cs2 = c_sigma * c_sigma
    d2_thres = -2.0 * ell * ell * jnp.log(sp_thres / s2)
    d2_c_thres = -2.0 * c_ell * c_ell * jnp.log(c_sp_thres / cs2)

    d2 = pairwise_sqdist(x_pos, y_pos)
    d2c = pairwise_sqdist(x_feat, y_feat)

    k = s2 * jnp.exp(-d2 / (2.0 * ell * ell))
    ck = cs2 * jnp.exp(-d2c / (2.0 * c_ell * c_ell))
    a = k * ck

    gate = (
        (d2 < d2_thres)
        & (d2c < d2_c_thres)
        & (a > sp_thres)
        & (x_mask[..., :, None] > 0)
        & (y_mask[..., None, :] > 0)
    )
    return jnp.where(gate, a, 0.0)


def linear_color_gram(x_feat, y_feat, color_scale):
    """MATLAB-mode color weights: CI = scale * Cx Cz' — a *linear* color
    kernel computed once per pair (rkhs_se3_registration.m:40-53),
    unlike the C++ squared-exponential color kernel (cvo.cpp:150)."""
    return color_scale * jnp.dot(
        x_feat, y_feat.T, preferred_element_type=jnp.float32, precision=_HI
    )


def matlab_gram(x_pos, x_mask, y_pos, y_mask, ci, ell, *, sigma, sp_thres):
    """MATLAB-mode A: K = se_kernel; K[K < sp] = 0; A = CI .* K
    (rkhs_se3_registration.m:125-127)."""
    s2 = sigma * sigma
    d2 = pairwise_sqdist(x_pos, y_pos)
    k = s2 * jnp.exp(-d2 / (2.0 * ell * ell))
    gate = (
        (k >= sp_thres)
        & (x_mask[..., :, None] > 0)
        & (y_mask[..., None, :] > 0)
    )
    return jnp.where(gate, ci * k, 0.0)
