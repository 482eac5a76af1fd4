"""NumPy float64 oracle: literal dense transcription of the reference math.

Transcribed from cvo.cpp:99-308 (se_kernel / compute_flow /
compute_step_size) and rkhs_se3_registration.m:55-197 — loop-based,
slow, and independent of the JAX implementation under test.
"""

import numpy as np


def se_kernel_oracle(xp, xf, yp, yf, ell, sigma, c_ell, c_sigma,
                     sp_thres, c_sp_thres):
    """Dense gated kernel matrix (cvo.cpp:99-161)."""
    s2 = sigma * sigma
    cs2 = c_sigma * c_sigma
    d2_thres = -2.0 * ell * ell * np.log(sp_thres / s2)
    d2_c_thres = -2.0 * c_ell * c_ell * np.log(c_sp_thres / cs2)
    n, m = xp.shape[0], yp.shape[0]
    A = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            d2 = np.sum((xp[i] - yp[j]) ** 2)
            if d2 < d2_thres:
                d2c = np.sum((xf[i] - yf[j]) ** 2)
                if d2c < d2_c_thres:
                    k = s2 * np.exp(-d2 / (2 * ell * ell))
                    ck = cs2 * np.exp(-d2c / (2 * c_ell * c_ell))
                    a = k * ck
                    if a > sp_thres:
                        A[i, j] = a
    return A


def flow_oracle(A, xp, yp, c, d):
    """omega, v (cvo.cpp:164-210)."""
    omega = np.zeros(3)
    v = np.zeros(3)
    n, m = A.shape
    for i in range(n):
        for j in range(m):
            if A[i, j] != 0:
                omega += A[i, j] * np.cross(xp[i], yp[j]) / c
                v += A[i, j] * (yp[j] - xp[i]) / d
    return omega, v


def step_coeffs_oracle(A, xp, yp, omega, v, ell):
    """B, C, D, E (cvo.cpp:213-289)."""
    def skew(w):
        return np.array([
            [0, -w[2], w[1]],
            [w[2], 0, -w[0]],
            [-w[1], w[0], 0],
        ])

    oh = skew(omega)
    m = yp.shape[0]
    xiz = np.cross(np.broadcast_to(omega, yp.shape), yp) + v
    xi2z = (oh @ oh @ yp.T + (oh @ v)[:, None]).T
    xi3z = (oh @ oh @ oh @ yp.T + (oh @ oh @ v)[:, None]).T
    xi4z = (oh @ oh @ oh @ oh @ yp.T + (oh @ oh @ oh @ v)[:, None]).T
    normxiz2 = np.sum(xiz**2, axis=1)
    xiz_dot_xi2z = -np.sum(xiz * xi2z, axis=1)
    epsil_const = np.sum(xi2z**2, axis=1) + 2 * np.sum(xiz * xi3z, axis=1)

    tc = 1.0 / (2 * ell * ell)
    B = C = D = E = 0.0
    n = xp.shape[0]
    for i in range(n):
        for j in range(m):
            a = A[i, j]
            if a == 0:
                continue
            dxy = xp[i] - yp[j]
            beta = -2 * tc * np.dot(xiz[j], dxy)
            gamma = -tc * (normxiz2[j] + 2 * np.dot(xi2z[j], dxy))
            delta = 2 * tc * (xiz_dot_xi2z[j] - np.dot(xi3z[j], dxy))
            epsil = -tc * (epsil_const[j] + 2 * np.dot(xi4z[j], dxy))
            B += a * beta
            C += a * (gamma + beta**2 / 2)
            D += a * (delta + beta * gamma + beta**3 / 6)
            E += a * (
                epsil + beta * delta + beta**2 * gamma / 2
                + gamma**2 / 2 + beta**4 / 24
            )
    return B, C, D, E


def adaptive_dl_oracle(A, Axx, Ayy, xp, yp, ell):
    """Correct-math dl (adaptive_cvo.cpp:222-271, without the yy quirk)."""
    ell3 = ell**3

    def wsum(M, a, b):
        s = 0.0
        for i in range(M.shape[0]):
            for j in range(M.shape[1]):
                if M[i, j] != 0:
                    s += M[i, j] * np.sum((a[i] - b[j]) ** 2)
        return s

    numer = (wsum(Ayy, yp, yp) - 2 * wsum(A, xp, yp) + wsum(Axx, xp, xp)) / ell3
    denom = np.count_nonzero(Axx) + np.count_nonzero(Ayy) - 2 * np.count_nonzero(A)
    return numer / max(denom, 1)


# ---------------------------------------------------------------------------
# Full float64 align-loop oracle (vectorized numpy, independent of JAX)
# Literal transcription of cvo::align (cvo.cpp:361-420) in dense form.
# ---------------------------------------------------------------------------

def se_gram_np(xp, xf, yp, yf, ell, p):
    s2 = p.sigma**2
    cs2 = p.c_sigma**2
    d2_thres = -2.0 * ell * ell * np.log(p.sp_thres / s2)
    d2_c_thres = -2.0 * p.c_ell**2 * 2 * np.log(p.c_sp_thres / cs2) / 2
    d2 = ((xp[:, None, :] - yp[None, :, :]) ** 2).sum(-1)
    d2c = ((xf[:, None, :] - yf[None, :, :]) ** 2).sum(-1)
    k = s2 * np.exp(-d2 / (2 * ell * ell))
    ck = cs2 * np.exp(-d2c / (2 * p.c_ell**2))
    a = k * ck
    gate = (d2 < d2_thres) & (d2c < d2_c_thres) & (a > p.sp_thres)
    return np.where(gate, a, 0.0)


def exp_sek3_np(w, v, dt):
    th = np.linalg.norm(w)
    I = np.eye(3)
    if th < 1e-6:
        return I, v.copy()
    A = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    A2 = A @ A
    st, ct = np.sin(dt * th), np.cos(dt * th)
    R = I + (st / th) * A + ((1 - ct) / th**2) * A2
    Jl = dt * I + ((1 - ct) / th**2) * A + ((dt * th - st) / th**3) * A2
    return R, Jl @ v


def align_oracle(xp, xf, yp, yf, p, max_iter=None, trace=False,
                 R0=None, T0=None, ell0=None, return_state=False):
    """Returns (tf [4,4], iters).  Dense float64, np.roots step solver.

    `R0`/`T0`/`ell0` seed the internal state exactly like
    core.registration.align (the reference's across-pair R/T/ell
    persistence, cvo.cpp:43-45, 398-399); `return_state=True` appends
    (R, T, ell) to the return so a chained odometry oracle can carry
    the warm state the way run_odometry does."""
    from scipy.linalg import logm

    xp = xp.astype(np.float64); xf = xf.astype(np.float64)
    yp0 = yp.astype(np.float64); yf = yf.astype(np.float64)
    R = np.eye(3) if R0 is None else np.asarray(R0, np.float64)
    T = np.zeros(3) if T0 is None else np.asarray(T0, np.float64)
    ell = p.ell_init if ell0 is None else float(ell0)
    max_iter = max_iter or p.max_iter
    tf = np.eye(4)
    rows = []
    for k in range(max_iter):
        Rt = R.T; Tt = -R.T @ T
        tf = np.eye(4); tf[:3, :3] = Rt; tf[:3, 3] = Tt
        yp = yp0 @ Rt.T + Tt
        A = se_gram_np(xp, xf, yp, yf, ell, p)
        Ay = A @ yp
        rowA = A.sum(1); colA = A.sum(0)
        omega = np.cross(xp, Ay).sum(0) / p.c
        v = (colA @ yp - rowA @ xp) / p.d
        # step size
        oh = np.array([[0,-omega[2],omega[1]],[omega[2],0,-omega[0]],[-omega[1],omega[0],0]])
        xiz = np.cross(np.broadcast_to(omega, yp.shape), yp) + v
        xi2z = yp @ (oh@oh).T + oh@v
        xi3z = yp @ (oh@oh@oh).T + oh@oh@v
        xi4z = yp @ (oh@oh@oh@oh).T + oh@oh@oh@v
        tc = 1/(2*ell*ell)
        def dot_field(wf):
            return xp @ wf.T - (wf*yp).sum(1)[None, :]
        beta = -2*tc*dot_field(xiz)
        gamma = -tc*((xiz**2).sum(1)[None,:] + 2*dot_field(xi2z))
        delta = 2*tc*((-(xiz*xi2z).sum(1))[None,:] - dot_field(xi3z))
        epsil = -tc*(((xi2z**2).sum(1)+2*(xiz*xi3z).sum(1))[None,:] + 2*dot_field(xi4z))
        B = (A*beta).sum()
        C = (A*(gamma+beta**2/2)).sum()
        D = (A*(delta+beta*gamma+beta**3/6)).sum()
        E = (A*(epsil+beta*delta+0.5*beta**2*gamma+0.5*gamma**2+beta**4/24)).sum()
        rts = np.roots([4*E, 3*D, 2*C, B])
        pos = [r.real for r in rts if r.real > 0 and abs(r.imag) < 1e-12]
        step = min(pos) if pos else p.min_step
        step = min(step, p.max_step)
        if trace:
            rows.append((k, np.linalg.norm(omega), np.linalg.norm(v), step, ell, int((A>0).sum())))
        if np.linalg.norm(omega) < p.eps and np.linalg.norm(v) < p.eps:
            break
        dR, dT = exp_sek3_np(omega, v, step)
        T = R @ dT + T
        R = R @ dR
        X = np.eye(4); X[:3,:3] = dR; X[:3,3] = dT
        if np.linalg.norm(logm(X)) < p.eps_2:
            break
        for thresh, val in p.ell_sched:
            if k > thresh:
                ell = val
    out = (tf, k, rows) if trace else (tf, k)
    return out + ((R, T, ell),) if return_state else out


def odometry_oracle(clouds, p, warm_start=True):
    """Chain align_oracle over a cloud sequence with the production
    driver's warm-start semantics (odometry.run_odometry: the
    reference's persistent R/T/ell members, cvo.cpp:43-45, 398-399) —
    the float64 cross-implementation of a full odometry run.

    `clouds`: list of (positions [N,3], features [N,F]) valid-point
    arrays.  Returns (accum_poses [n,4,4], iters list)."""
    accum = np.eye(4)
    poses = [accum.copy()]
    iters = []
    warm = (None, None, None)
    for (xp, xf), (yp, yf) in zip(clouds[:-1], clouds[1:]):
        tf, k, (R, T, ell) = align_oracle(
            xp, xf, yp, yf, p,
            R0=warm[0], T0=warm[1], ell0=warm[2], return_state=True,
        )
        if warm_start:
            warm = (R, T, ell)
        accum = accum @ tf
        poses.append(accum.copy())
        iters.append(k)
    return np.stack(poses), iters
