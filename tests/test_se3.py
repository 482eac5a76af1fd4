"""Unit tests for cvo_rgbd_tpu.se3 against float64 scipy oracles.

Mirrors the verification the reference never had (SURVEY.md section 4):
round-trips, known values, Jacobian identities, vmap/jit safety.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm, logm
from scipy.spatial.transform import Rotation

from cvo_rgbd_tpu import se3


def _rand_w(rng, scale=1.0):
    return (rng.standard_normal(3) * scale).astype(np.float32)


def test_skew_unskew_roundtrip(rng):
    v = _rand_w(rng)
    m = se3.skew(v)
    np.testing.assert_allclose(np.asarray(m), -np.asarray(m).T, atol=1e-7)
    np.testing.assert_allclose(np.asarray(se3.unskew(m)), v, atol=1e-7)


@pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.1, 1.0, 2.5])
def test_exp_so3_matches_scipy(rng, scale):
    w = _rand_w(rng, scale)
    R = np.asarray(se3.exp_so3(w))
    R_ref = Rotation.from_rotvec(w.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-4, 0.1, 1.0, 2.5])
def test_log_so3_roundtrip(rng, scale):
    w = _rand_w(rng, scale)
    # log returns the principal value: w-roundtrip only for |w| < pi,
    # R-roundtrip always.
    if np.linalg.norm(w) < np.pi - 1e-3:
        w_back = np.asarray(se3.log_so3(se3.exp_so3(w)))
        np.testing.assert_allclose(w_back, w, atol=1e-4 * max(1.0, scale))
    R = np.asarray(se3.exp_so3(w))
    R_back = np.asarray(se3.exp_so3(se3.log_so3(R)))
    np.testing.assert_allclose(R_back, R, atol=1e-4)


def test_left_jacobian_identity(rng):
    """exp_se3 translation = Jl(w) @ u."""
    w = _rand_w(rng)
    u = _rand_w(rng)
    xi = np.concatenate([w, u])
    X = np.asarray(se3.exp_se3(xi))
    hat = np.zeros((4, 4))
    hat[:3, :3] = np.asarray(se3.skew(w))
    hat[:3, 3] = u
    X_ref = expm(hat.astype(np.float64))
    np.testing.assert_allclose(X, X_ref, atol=1e-5)


def test_left_jacobian_inv_is_inverse(rng):
    w = _rand_w(rng)
    J = np.asarray(se3.left_jacobian_so3(w))
    Ji = np.asarray(se3.left_jacobian_inv_so3(w))
    np.testing.assert_allclose(J @ Ji, np.eye(3), atol=1e-5)


def test_log_se3_roundtrip(rng):
    xi = np.concatenate([_rand_w(rng, 0.8), _rand_w(rng)])
    X = se3.exp_se3(xi)
    np.testing.assert_allclose(np.asarray(se3.log_se3(X)), xi, atol=1e-4)


def test_exp_sek3_matches_scaled_exp(rng):
    """For theta above tolerance, exp_sek3(w, v, dt) == expm(dt * hat([w;v]))."""
    w = _rand_w(rng)
    v = _rand_w(rng)
    dt = 0.37
    dR, dT = se3.exp_sek3(w, v, dt)
    hat = np.zeros((4, 4))
    hat[:3, :3] = np.asarray(se3.skew(w))
    hat[:3, 3] = v
    X_ref = expm(dt * hat.astype(np.float64))
    np.testing.assert_allclose(np.asarray(dR), X_ref[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dT), X_ref[:3, 3], atol=1e-5)


def test_exp_sek3_small_angle_reference_quirk():
    """theta < 1e-6 => Jl = I (LieGroup.cpp:168-170), so dT == v, not dt*v."""
    w = np.zeros(3, np.float32)
    v = np.array([1.0, 2.0, 3.0], np.float32)
    dR, dT = se3.exp_sek3(w, v, 0.25)
    np.testing.assert_allclose(np.asarray(dR), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(dT), v, atol=1e-7)


@pytest.mark.parametrize("scale", [1e-3, 0.5, 2.0])
def test_dist_se3_matches_logm(rng, scale):
    w = _rand_w(rng, scale)
    t = _rand_w(rng)
    R = np.asarray(se3.exp_so3(w)).astype(np.float64)
    X = np.eye(4)
    X[:3, :3] = R
    X[:3, 3] = t
    d_ref = np.linalg.norm(logm(X), "fro")
    d = float(se3.dist_se3(R.astype(np.float32), t))
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-5)


def test_se3_inv(rng):
    w = _rand_w(rng)
    t = _rand_w(rng)
    R = np.asarray(se3.exp_so3(w))
    Ri, ti = se3.se3_inv(R, t)
    X = np.asarray(se3.make_se3(R, t))
    Xi = np.asarray(se3.make_se3(Ri, ti))
    np.testing.assert_allclose(X @ Xi, np.eye(4), atol=1e-6)


def test_vmap_and_jit(rng):
    ws = rng.standard_normal((16, 3)).astype(np.float32)
    f = jax.jit(jax.vmap(se3.exp_so3))
    Rs = np.asarray(f(ws))
    for i in range(16):
        np.testing.assert_allclose(
            Rs[i], Rotation.from_rotvec(ws[i].astype(np.float64)).as_matrix(),
            atol=1e-5,
        )


def test_grad_finite_at_zero():
    g = jax.grad(lambda w: jnp.sum(se3.exp_so3(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda w: jnp.sum(se3.left_jacobian_so3(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_adjoint_se3(rng):
    xi = np.concatenate([_rand_w(rng, 0.5), _rand_w(rng)])
    X = np.asarray(se3.exp_se3(xi)).astype(np.float64)
    Adj = np.asarray(se3.adjoint_se3(X.astype(np.float32)))
    # Adjoint identity: X exp(hat(y)) X^-1 == exp(hat(Adj @ y))
    y = np.concatenate([_rand_w(rng, 0.3), _rand_w(rng, 0.3)]).astype(np.float64)

    def hat(z):
        h = np.zeros((4, 4))
        h[:3, :3] = np.asarray(se3.skew(z[:3].astype(np.float32)))
        h[:3, 3] = z[3:]
        return h

    lhs = X @ expm(hat(y)) @ np.linalg.inv(X)
    rhs = expm(hat(Adj.astype(np.float64) @ y))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def _hat64(z):
    w = z[:3]
    h = np.zeros((4, 4))
    h[:3, :3] = np.array([
        [0, -w[2], w[1]],
        [w[2], 0, -w[0]],
        [-w[1], w[0], 0],
    ])
    h[:3, 3] = z[3:]
    return h


def test_left_jacobian_se3_numeric(rng):
    """Jl(xi) column check: d/de log(exp(hat(xi+e_i)) exp(-hat(xi)))|_0 ~ Jl e_i."""
    xi = np.concatenate([_rand_w(rng, 0.4), _rand_w(rng, 0.4)]).astype(np.float64)
    J = np.asarray(se3.left_jacobian_se3(xi.astype(np.float32))).astype(np.float64)

    eps = 1e-6
    for i in range(6):
        e = np.zeros(6)
        e[i] = eps
        M = expm(_hat64(xi + e)) @ expm(-_hat64(xi))
        L = logm(M)
        col = np.concatenate(
            [[L[2, 1], L[0, 2], L[1, 0]], L[:3, 3]]
        )
        np.testing.assert_allclose(col / eps, J[:, i], atol=2e-3)
