"""Distributed bundle adjustment — Schur-complement reduction over
collectives.

SURVEY.md section 2.6 lists "keyframe graph + Schur-complement reduction
over collectives" as a first-class component with **no analog in the
reference** (the reference chains accum_transform, cvo.cpp:414, and
never builds a map).  This module provides it for the RGB-D setting:

  poses      X_k in SE(3)   (keyframe camera-to-world)
  landmarks  l_m in R^3     (world-frame map points)
  residual   r_o = X_k^{-1} l_m - z_o
             (z_o = the 3-D point measured in camera k's frame — RGB-D
             observes full 3-D points, so no projection model is needed)

Gauss-Newton with right-multiplicative pose updates X <- X exp(xi^),
xi = [omega; v] (the se3.exp_se3 convention).  With d = R^T (l - t):

  dr/dxi = [skew(d), -I_3]        dr/dl = R^T

The normal equations have the classic BA arrowhead structure: H_pp is
block-diagonal over poses (each observation touches exactly one pose),
H_ll is block-diagonal over landmarks, H_pl couples them.  Landmarks
are eliminated by the Schur complement

  S   = H_pp - H_pl H_ll^{-1} H_lp        (6K x 6K reduced system)
  rhs = b_p  - H_pl H_ll^{-1} b_l
  dl  = -H_ll^{-1} (b_l + H_lp dp)        (back-substitution)

TPU-native distribution: observations shard over a mesh axis inside
`shard_map`; every device scatter-adds its shard's contributions into
dense H_pp/H_ll/H_pl/b_p/b_l accumulators and ONE `lax.psum` per
quantity reduces them — the direct scale-out of the reference's
mutex-guarded accumulators (cvo.cpp:201-204).  The reduced 6K x 6K
solve is replicated (keyframe counts are small); all the O(observations)
work is sharded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from cvo_rgbd_tpu import se3
from cvo_rgbd_tpu.parallel.sharded import shard_map

# bf16-default matmuls bias GN updates (CLAUDE.md numerics rules); pin
# full-fp32 MXU precision on every contraction.
_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """poses [K,4,4] camera-to-world; landmarks [M,3] world;
    observations (obs_pose [O] int32, obs_lm [O] int32, obs_z [O,3]
    camera-frame measured points, obs_w [O] weights — 0 marks padding).
    """

    poses: jnp.ndarray
    landmarks: jnp.ndarray
    obs_pose: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_z: jnp.ndarray
    obs_w: jnp.ndarray


def make_ba_problem(poses, landmarks, obs_pose, obs_lm, obs_z, obs_w=None,
                    pad_to=None):
    """Assemble a BAProblem from host arrays, padding observations to
    `pad_to` (needed to shard evenly over a mesh axis)."""
    obs_pose = np.asarray(obs_pose, np.int32)
    obs_lm = np.asarray(obs_lm, np.int32)
    obs_z = np.asarray(obs_z, np.float32)
    o = obs_pose.shape[0]
    obs_w = (np.ones(o, np.float32) if obs_w is None
             else np.asarray(obs_w, np.float32))
    if pad_to is not None and pad_to > o:
        pad = pad_to - o
        obs_pose = np.concatenate([obs_pose, np.zeros(pad, np.int32)])
        obs_lm = np.concatenate([obs_lm, np.zeros(pad, np.int32)])
        obs_z = np.concatenate([obs_z, np.zeros((pad, 3), np.float32)])
        obs_w = np.concatenate([obs_w, np.zeros(pad, np.float32)])
    return BAProblem(
        poses=jnp.asarray(poses, jnp.float32),
        landmarks=jnp.asarray(landmarks, jnp.float32),
        obs_pose=jnp.asarray(obs_pose),
        obs_lm=jnp.asarray(obs_lm),
        obs_z=jnp.asarray(obs_z),
        obs_w=jnp.asarray(obs_w),
    )


def _accumulate(poses, landmarks, obs_pose, obs_lm, obs_z, obs_w):
    """Dense normal-equation accumulators from one observation shard."""
    k, m = poses.shape[0], landmarks.shape[0]
    R = poses[obs_pose, :3, :3]                      # [O,3,3]
    t = poses[obs_pose, :3, 3]                       # [O,3]
    l = landmarks[obs_lm]                            # [O,3]
    d = jnp.matmul((l - t)[:, None, :], R,
                   precision=_HI)[:, 0, :]           # R^T (l - t), [O,3]
    r = d - obs_z                                    # [O,3]

    Jp = jnp.concatenate([se3.skew(d), -jnp.broadcast_to(
        jnp.eye(3, dtype=d.dtype), d.shape[:1] + (3, 3))], axis=-1)  # [O,3,6]
    Jl = jnp.swapaxes(R, -1, -2)                     # R^T, [O,3,3]

    w = obs_w[:, None, None]
    JpT = jnp.swapaxes(Jp, -1, -2)
    JlT = jnp.swapaxes(Jl, -1, -2)
    mm = functools.partial(jnp.matmul, precision=_HI)

    H_pp = jnp.zeros((k, 6, 6), jnp.float32).at[obs_pose].add(w * mm(JpT, Jp))
    H_ll = jnp.zeros((m, 3, 3), jnp.float32).at[obs_lm].add(w * mm(JlT, Jl))
    H_pl = jnp.zeros((k, m, 6, 3), jnp.float32).at[obs_pose, obs_lm].add(
        w * mm(JpT, Jl)
    )
    b_p = jnp.zeros((k, 6), jnp.float32).at[obs_pose].add(
        (w * mm(JpT, r[..., None]))[..., 0]
    )
    b_l = jnp.zeros((m, 3), jnp.float32).at[obs_lm].add(
        (w * mm(JlT, r[..., None]))[..., 0]
    )
    cost = jnp.sum(obs_w * jnp.sum(r * r, axis=-1))
    return H_pp, H_ll, H_pl, b_p, b_l, cost


def _schur_step(poses, landmarks, acc, damping):
    """One GN update from (psum'd) accumulators via the Schur complement."""
    H_pp, H_ll, H_pl, b_p, b_l, cost = acc
    k, m = H_pp.shape[0], H_ll.shape[0]
    eye3 = jnp.eye(3, dtype=jnp.float32)

    # landmark-block inverses (3x3, batched); damping keeps unobserved
    # landmark blocks invertible with dl = 0
    Hll_inv = jnp.linalg.inv(H_ll + damping * eye3)

    # S = blockdiag(H_pp) - H_pl Hll_inv H_lp   (the Schur complement)
    S = -jnp.einsum("kmab,mbc,lmec->kale", H_pl, Hll_inv, H_pl,
                    precision=_HI)
    S = S.at[jnp.arange(k), :, jnp.arange(k), :].add(H_pp)
    rhs = b_p - jnp.einsum("kmab,mbc,mc->ka", H_pl, Hll_inv, b_l,
                           precision=_HI)

    Sd = S.reshape(6 * k, 6 * k)
    # gauge prior on pose 0 + LM damping
    Sd = Sd + damping * jnp.eye(6 * k)
    Sd = Sd.at[:6, :6].add(1e6 * jnp.eye(6))
    dp = jnp.linalg.solve(Sd, -rhs.reshape(6 * k)).reshape(k, 6)

    # back-substitute landmarks
    Hlp_dp = jnp.einsum("kmab,ka->mb", H_pl, dp, precision=_HI)
    dl = -jnp.matmul(Hll_inv, (b_l + Hlp_dp)[..., None],
                     precision=_HI)[..., 0]

    new_poses = jnp.matmul(poses, se3.exp_se3(dp), precision=_HI)
    new_landmarks = landmarks + dl
    return new_poses, new_landmarks, cost


def _solve_local(problem: BAProblem, iters: int, damping: float,
                 axis: str | None):
    """GN loop over a (possibly sharded) observation set.  When `axis`
    is set this runs inside shard_map: obs_* hold this device's shard
    and the accumulators are psum'd before the replicated solve."""

    def body(carry, _):
        poses, landmarks = carry
        acc = _accumulate(poses, landmarks, problem.obs_pose,
                          problem.obs_lm, problem.obs_z, problem.obs_w)
        if axis is not None:
            acc = jax.lax.psum(acc, axis_name=axis)
        poses, landmarks, cost = _schur_step(poses, landmarks, acc, damping)
        return (poses, landmarks), cost

    (poses, landmarks), costs = jax.lax.scan(
        body, (problem.poses, problem.landmarks), None, length=iters
    )
    return poses, landmarks, costs


@functools.partial(jax.jit, static_argnames=("iters", "damping"))
def _ba_single(problem, iters, damping):
    return _solve_local(problem, iters, damping, axis=None)


@functools.lru_cache(maxsize=None)
def _compiled_ba_sharded(mesh, axis, iters, damping):
    obs_spec = P(axis)
    rep = P()
    fn = shard_map(
        functools.partial(_solve_local, iters=iters, damping=damping,
                          axis=axis),
        mesh,
        in_specs=(BAProblem(rep, rep, obs_spec, obs_spec, obs_spec,
                            obs_spec),),
        out_specs=(rep, rep, rep),
    )
    return jax.jit(fn)


def ba_solve(problem: BAProblem, mesh=None, axis: str = "sp",
             iters: int = 10, damping: float = 1e-4):
    """Bundle-adjust; returns (poses [K,4,4], landmarks [M,3], costs).

    With a mesh, observations shard over `axis` and each GN iteration
    does one psum of the normal-equation blocks — O(K·36 + M·9 + K·M·18)
    bytes of collective against O(O/devices) local work.
    """
    if mesh is None:
        return _ba_single(problem, iters, damping)

    n = mesh.shape[axis]
    o = int(problem.obs_pose.shape[0])
    if o % n:
        problem = jax.tree_util.tree_map(np.asarray, problem)
        problem = make_ba_problem(
            problem.poses, problem.landmarks, problem.obs_pose,
            problem.obs_lm, problem.obs_z, problem.obs_w,
            pad_to=((o + n - 1) // n) * n,
        )

    return _compiled_ba_sharded(mesh, axis, iters, damping)(problem)


def ba_cost(problem: BAProblem, poses=None, landmarks=None):
    """Total weighted squared residual."""
    poses = problem.poses if poses is None else poses
    landmarks = problem.landmarks if landmarks is None else landmarks
    R = poses[problem.obs_pose, :3, :3]
    t = poses[problem.obs_pose, :3, 3]
    d = jnp.matmul((landmarks[problem.obs_lm] - t)[:, None, :], R,
                   precision=_HI)[:, 0, :]
    r = d - problem.obs_z
    return jnp.sum(problem.obs_w * jnp.sum(r * r, axis=-1))


def ba_from_keyframes(keyframe_clouds, poses, grid=0.1, radius=0.05,
                      max_landmarks=512, rng=None):
    """Harvest a BA problem from keyframe clouds + trajectory poses.

    CVO is correspondence-free, so correspondences for map refinement
    are built here the classic way: landmark candidates are a grid
    subsample of keyframe 0's cloud in world frame; each keyframe
    observes a landmark if its cloud has a point within `radius` of it
    (host-side brute-force NN — keyframe counts and cloud sizes are
    small).  Returns a BAProblem or None if too few observations.
    """
    from cvo_rgbd_tpu.utils.downsample import grid_downsample

    rng = np.random.default_rng(0) if rng is None else rng
    poses = np.asarray(poses, np.float32)

    def world(cloud, T):
        pos = np.asarray(cloud.positions)[np.asarray(cloud.mask) > 0]
        return pos @ T[:3, :3].T + T[:3, 3]

    cand, _ = grid_downsample(world(keyframe_clouds[0], poses[0]),
                              np.zeros((np.sum(np.asarray(
                                  keyframe_clouds[0].mask) > 0), 3)), grid)
    if cand.shape[0] > max_landmarks:
        cand = cand[rng.choice(cand.shape[0], max_landmarks, replace=False)]

    obs_pose, obs_lm, obs_z = [], [], []
    for k, (cloud, T) in enumerate(zip(keyframe_clouds, poses)):
        pts_w = world(cloud, T)
        # dense brute-force NN (landmark -> nearest cloud point); fine at
        # keyframe scale: max_landmarks x cloud points ~ 512 x few-1000
        d2 = ((cand[:, None, :] - pts_w[None, :, :]) ** 2).sum(-1)
        j = d2.argmin(1)
        hit = d2[np.arange(cand.shape[0]), j] < radius * radius
        if not hit.any():
            continue
        # observation = the matched point expressed in camera k's frame
        Rk, tk = T[:3, :3], T[:3, 3]
        z = (pts_w[j[hit]] - tk) @ Rk
        obs_pose.append(np.full(hit.sum(), k, np.int32))
        obs_lm.append(np.nonzero(hit)[0].astype(np.int32))
        obs_z.append(z.astype(np.float32))

    if not obs_pose:
        return None
    return make_ba_problem(
        poses, cand, np.concatenate(obs_pose), np.concatenate(obs_lm),
        np.concatenate(obs_z),
    )
