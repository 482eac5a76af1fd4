"""SE(3) pose-graph optimization — jittable Gauss-Newton on device.

The reference chains odometry into `accum_transform` with no global
consistency machinery (cvo.cpp:414; SURVEY.md section 2.6 lists
pose-graph/BA as a required extension with no reference analog).  This
module closes loops: given keyframe nodes and relative-pose edges
(odometry + loop closures from the keyframe scorer), it minimizes

    sum_e  || log( Z_e^{-1} X_i^{-1} X_j ) ||^2_{Omega_e}

by Gauss-Newton with right-multiplicative updates, as one jitted
program: residuals/Jacobians are batched over edges with vmap, the
dense 6N x 6N normal equations solve on the MXU, and the iteration
count is static (`lax.scan`).  Node 0 is gauge-fixed.

Edge Jacobians use the standard small-residual form
  d r / d xi_i = -Jr^{-1}(r) Ad(X_j^{-1} X_i),   d r / d xi_j = Jr^{-1}(r)
with the exact right-Jacobian inverse from se3.left_jacobian_se3.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cvo_rgbd_tpu import se3


class PoseGraph(NamedTuple):
    """nodes [N,4,4]; edges (i [E], j [E], z [E,4,4], weight [E])."""

    nodes: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_z: jnp.ndarray
    edge_w: jnp.ndarray


def from_odometry(poses, loop_edges=()):
    """Build a graph from absolute poses: consecutive odometry edges
    (weight 1) plus optional (i, j, Z, w) loop closures."""
    poses = np.asarray(poses)
    n = poses.shape[0]
    ei, ej, ez, ew = [], [], [], []
    for k in range(n - 1):
        ei.append(k)
        ej.append(k + 1)
        ez.append(np.linalg.inv(poses[k]) @ poses[k + 1])
        ew.append(1.0)
    for (i, j, z, w) in loop_edges:
        ei.append(i)
        ej.append(j)
        ez.append(np.asarray(z))
        ew.append(float(w))
    return PoseGraph(
        nodes=jnp.asarray(poses, jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_z=jnp.asarray(np.stack(ez), jnp.float32),
        edge_w=jnp.asarray(ew, jnp.float32),
    )


def _se3_inv44(X):
    R = X[..., :3, :3]
    t = X[..., :3, 3]
    Ri, ti = se3.se3_inv(R, t)
    return se3.make_se3(Ri, ti)


def _edge_residual_jac(Xi, Xj, Z):
    """r [6], Ji [6,6], Jj [6,6] for one edge."""
    rel = _se3_inv44(Xi) @ Xj
    E = _se3_inv44(Z) @ rel
    r = se3.log_se3(E)
    # right Jacobian inverse: Jr(r) = Jl(-r)
    Jr_inv = jnp.linalg.inv(se3.left_jacobian_se3(-r))
    Adj = se3.adjoint_se3(_se3_inv44(rel))
    Ji = -Jr_inv @ Adj
    Jj = Jr_inv
    return r, Ji, Jj


def _gn_step(nodes, edge_i, edge_j, edge_z, edge_w, damping):
    n = nodes.shape[0]
    Xi = nodes[edge_i]
    Xj = nodes[edge_j]
    r, Ji, Jj = jax.vmap(_edge_residual_jac)(Xi, Xj, edge_z)

    w = edge_w[:, None, None]
    H = jnp.zeros((n, n, 6, 6), jnp.float32)
    b = jnp.zeros((n, 6), jnp.float32)
    JiT = jnp.swapaxes(Ji, -1, -2)
    JjT = jnp.swapaxes(Jj, -1, -2)
    H = H.at[edge_i, edge_i].add(w * (JiT @ Ji))
    H = H.at[edge_j, edge_j].add(w * (JjT @ Jj))
    H = H.at[edge_i, edge_j].add(w * (JiT @ Jj))
    H = H.at[edge_j, edge_i].add(w * (JjT @ Ji))
    b = b.at[edge_i].add((w * (JiT @ r[..., None]))[..., 0])
    b = b.at[edge_j].add((w * (JjT @ r[..., None]))[..., 0])

    # gauge fix node 0: huge prior on its increment
    H = H.at[0, 0].add(1e6 * jnp.eye(6))

    Hd = H.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
    Hd = Hd + damping * jnp.eye(6 * n)
    bd = b.reshape(6 * n)
    delta = jnp.linalg.solve(Hd, -bd).reshape(n, 6)

    # right-multiplicative update X <- X exp(delta); pinned fp32 — the
    # bf16 matmul default biases pose chains at mm level (CLAUDE.md)
    dX = se3.exp_se3(delta)
    new_nodes = jnp.matmul(nodes, dX, precision=jax.lax.Precision.HIGHEST)
    cost = jnp.sum(edge_w * jnp.sum(r * r, axis=-1))
    return new_nodes, cost


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize(graph: PoseGraph, iters: int = 10, damping: float = 1e-6):
    """Gauss-Newton; returns (optimized nodes [N,4,4], costs [iters])."""

    def body(nodes, _):
        new_nodes, cost = _gn_step(
            nodes, graph.edge_i, graph.edge_j, graph.edge_z, graph.edge_w,
            damping,
        )
        return new_nodes, cost

    nodes, costs = jax.lax.scan(body, graph.nodes, None, length=iters)
    return nodes, costs


def graph_cost(graph: PoseGraph, nodes=None):
    """Total weighted squared residual of the graph."""
    nodes = graph.nodes if nodes is None else nodes
    Xi = nodes[graph.edge_i]
    Xj = nodes[graph.edge_j]

    def res(Xi, Xj, Z):
        return se3.log_se3(_se3_inv44(Z) @ _se3_inv44(Xi) @ Xj)

    r = jax.vmap(res)(Xi, Xj, graph.edge_z)
    return jnp.sum(graph.edge_w * jnp.sum(r * r, axis=-1))
