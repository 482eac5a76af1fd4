"""Fixed-iteration preconditioned conjugate gradients (jittable).

Shared by the sparse Schur BA solver (parallel/ba.py) and the sparse
pose-graph solver (core/posegraph.py).  The iteration count is static
(`lax.scan`) and a converged state freezes in place, so the loop is
jit/vmap/shard_map-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg(matvec, precond, b, iters, rtol2=1e-12):
    """Solve A x = b with preconditioned CG; returns x.

    `matvec`/`precond` operate on pytrees shaped like `b` (in practice
    [K,6] or [N,6] float32 arrays).  Stops updating once the squared
    relative residual drops below `rtol2`.
    """
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    rz = jnp.sum(r * z)
    p = z
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def body(carry, _):
        x, r, p, rz = carry
        done = jnp.sum(r * r) / b2 < rtol2
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x_new = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        rz_new = jnp.sum(r_new * z_new)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p_new = z_new + beta * p
        out = [
            jnp.where(done, old, new)
            for old, new in zip((x, r, p, rz), (x_new, r_new, p_new, rz_new))
        ]
        return tuple(out), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x
