"""Structured per-iteration diagnostics for convergence debugging.

The reference prints raw couts (cvo.cpp:380-405); the MATLAB prototype
prints an iteration table every 5 iterations
(rkhs_se3_registration.m:252-258).  `align_trace` runs a fixed number
of align iterations under `lax.scan` and returns the full per-iteration
record — exactly the quantities SURVEY.md section 5 names for
convergence debugging: |omega|, |v|, step, ell, and the se3 distance of
each update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cvo_rgbd_tpu import se3
from cvo_rgbd_tpu.core.registration import (
    AlignState,
    build_ck_caches,
    build_moments_pre,
    make_align_step,
    prepare_ci,
)
from cvo_rgbd_tpu.params import AcvoParams


class IterRecord(NamedTuple):
    omega_norm: jnp.ndarray
    v_norm: jnp.ndarray
    ell: jnp.ndarray
    dist: jnp.ndarray       # se3 distance of the applied update
    converged: jnp.ndarray


def align_trace(p, fixed, moving, n_iters: int):
    """Run exactly `n_iters` iterations, recording each one.

    Stopping rules still freeze the state (matching `align`); the scan
    just keeps emitting the frozen values afterwards.  Returns
    (final_state, IterRecord stacked over iterations).
    """
    adaptive = isinstance(p, AcvoParams)
    if getattr(p, "backend", "xla") == "fused":
        # the mega-kernel runs its loop inside one Pallas program and
        # cannot emit per-iteration records; trace the closest
        # per-iteration backend instead (documented, not silent)
        import dataclasses

        quirk = adaptive and p.yy_quirk
        lin_acvo = adaptive and p.color_mode == "linear"
        p = dataclasses.replace(
            p, backend="xla" if quirk or lin_acvo else "pallas"
        )
    if getattr(p, "backend", "xla") == "pallas":
        # mirror align(): the pallas backend kd-sorts unconditionally
        # (compact tiles for AABB pruning; CLAUDE.md bitwise rule).
        # Without this the trace runs on a different point order than
        # the align it documents — different fp32 reduction order, so
        # the recorded omega/v/ell drift from what align computes and
        # skip_pre prunes ~0%.
        from cvo_rgbd_tpu.core.cloud import kd_sort

        if fixed.positions.shape[0] % 128 == 0:
            fixed = kd_sort(fixed)
        if moving.positions.shape[0] % 128 == 0:
            moving = kd_sort(moving)
    body = make_align_step(p, adaptive)
    ci = prepare_ci(p, fixed, moving)

    init = AlignState(
        k=jnp.zeros((), jnp.int32),
        R=jnp.eye(3, dtype=jnp.float32),
        T=jnp.zeros(3, jnp.float32),
        ell=jnp.asarray(p.ell_init, jnp.float32),
        ell_max=jnp.asarray(
            p.ell_max_init if adaptive else 1e9, jnp.float32
        ),
        tf=jnp.eye(4, dtype=jnp.float32),
        converged=jnp.zeros((), bool),
        omega=jnp.zeros(3, jnp.float32),
        v=jnp.zeros(3, jnp.float32),
    )

    ck_caches = build_ck_caches(p, adaptive, fixed, moving)
    moments_pre = build_moments_pre(p, fixed)
    from cvo_rgbd_tpu.core.registration import (
        build_selfsweep_cheb,
        build_skip_pre,
    )

    skip_pre = build_skip_pre(p, adaptive, fixed, moving)
    cheb_pre = build_selfsweep_cheb(p, adaptive, fixed, moving,
                                    ck_caches, skip_pre)

    def scan_body(state, _):
        prev_R, prev_T = state.R, state.T
        new = jax.lax.cond(
            state.converged,
            lambda s: s,
            lambda s: body(s, fixed, moving, ci, ck_caches, moments_pre,
                           skip_pre, cheb_pre),
            state,
        )
        dR = jnp.swapaxes(prev_R, -1, -2) @ new.R
        dT = jnp.swapaxes(prev_R, -1, -2)[..., :3, :3] @ (new.T - prev_T)
        rec = IterRecord(
            omega_norm=jnp.linalg.norm(new.omega),
            v_norm=jnp.linalg.norm(new.v),
            ell=new.ell,
            dist=se3.dist_se3(dR, dT),
            converged=new.converged,
        )
        return new, rec

    final, recs = jax.lax.scan(scan_body, init, None, length=n_iters)
    return final, recs
