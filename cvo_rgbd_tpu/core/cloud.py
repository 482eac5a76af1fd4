"""PointCloud pytree: static-shape, mask-padded colored point clouds.

TPU-native replacement of the reference's `point_cloud` struct
(include/data_type.h:59-71).  The reference stores exactly
`num_points` rows; XLA wants static shapes, so clouds are padded to a
lane-aligned capacity with an explicit validity mask.  Every kernel in
the framework treats `mask == 0` rows as nonexistent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_FEATURES = 5  # [c0, c1, c2, dx, dy] (data_type.h:26, pcd_generator.cpp:336-381)
LANE = 128        # TPU lane width; pad capacities to a multiple of this


class PointCloud(NamedTuple):
    """positions [N,3] f32, features [N,F] f32, mask [N] f32 (1=valid)."""

    positions: jnp.ndarray
    features: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.positions.shape[-2]

    def num_valid(self):
        return jnp.sum(self.mask, axis=-1)


def round_up(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


def stack_clouds(clouds, repeat: int = 1) -> PointCloud:
    """Stack equal-capacity PointClouds into a leading batch axis
    (optionally tiling the list `repeat` times) — the input format of
    `parallel.align_batched`.

    Device-resident clouds stay on device (`jnp.stack` dispatches
    asynchronously): forcing them through `np.asarray` would pay a
    BLOCKING device->host transfer per field per cloud — ~90 ms/pair of
    pure relay round-trips in the batched odometry driver before this
    was caught (docs/PERF.md).  All-host inputs still produce host
    arrays (cheap to build, uploaded once at dispatch)."""
    clouds = list(clouds) * repeat
    fields = []
    for f in PointCloud._fields:
        vals = [getattr(c, f) for c in clouds]
        if all(isinstance(v, np.ndarray) for v in vals):
            fields.append(np.stack(vals))
        else:
            fields.append(jnp.stack([jnp.asarray(v) for v in vals]))
    return PointCloud(*fields)


def pad_cloud(
    positions,
    features=None,
    capacity: int | None = None,
    dtype=np.float32,
) -> PointCloud:
    """Build a mask-padded PointCloud from ragged host arrays."""
    positions = np.asarray(positions, dtype=dtype)
    n = positions.shape[0]
    if features is None:
        features = np.zeros((n, NUM_FEATURES), dtype=dtype)
    features = np.asarray(features, dtype=dtype)
    cap = capacity if capacity is not None else round_up(max(n, 1))
    if n > cap:
        raise ValueError(f"cloud with {n} points exceeds capacity {cap}")
    pos = np.zeros((cap, 3), dtype=dtype)
    feat = np.zeros((cap, features.shape[1]), dtype=dtype)
    mask = np.zeros((cap,), dtype=dtype)
    pos[:n] = positions
    feat[:n] = features
    mask[:n] = 1.0
    return PointCloud(jnp.asarray(pos), jnp.asarray(feat), jnp.asarray(mask))


def transform_cloud(R, t, positions):
    """Apply SE(3) to positions [N,3] (cvo.cpp:310-315).

    Full-fp32 precision: the TPU bf16 matmul default would perturb
    positions at the millimeter scale.
    """
    return (
        jnp.matmul(
            positions,
            jnp.swapaxes(R, -1, -2),
            precision=jax.lax.Precision.HIGHEST,
        )
        + t[..., None, :]
    )


def cloud_ok(cloud: PointCloud, min_valid: int = 64):
    """Jit-traceable input-sanity flag for a (possibly lane-batched)
    cloud: enough valid points AND finite positions in the valid slots.

    This is the driver-level failure detector the MATLAB batch runner
    gets from its try/catch (rgbddataset_rkhs.m:49-81 — an empty or
    corrupt cloud errors the solve there and records NaN): the align
    loop itself is total (an empty/garbage cloud gates every kernel
    entry off and converges to identity at iteration 0), so without
    this check a total sensor dropout would silently chain an identity
    relative pose instead of firing skip-and-mark.

    Batched clouds ([B,N,...]) reduce per lane -> [B] bools.
    """
    valid = cloud.mask > 0
    n = jnp.sum(valid, axis=-1)
    fin = jnp.all(
        jnp.isfinite(cloud.positions) | ~valid[..., None], axis=(-1, -2)
    )
    return (n >= min_valid) & fin


def kd_sort(cloud: PointCloud, cell: int = 128) -> PointCloud:
    """Reorder points by recursive median splits (balanced kd-cells).

    Point order is semantically irrelevant — every align reduction is
    permutation-invariant (modulo fp reassociation) — but it decides
    how much the AABB tile pruning (ops/pallas_gram.block_bounds) can
    skip: raster- or sample-ordered clouds give every tile a
    scene-wide bounding box and nothing prunes.  Better than a Morton
    (z-order) curve for tile compactness: each
    split sorts a segment along its widest extent and divides it at a
    cell-aligned median, so every `cell`-point run is a compact spatial
    box (and adjacent runs are siblings, so larger tiles stay compact
    too).  Measured tile-prune rates on the reference-scale fixture
    clouds: 0.74-0.81 at 128-tiles vs 0.60-0.64 for Morton order.
    Split sizes are static (derived from the capacity); the split
    dimension is data-dependent but jit-traceable.  Invalid slots sort
    to the end (+inf keys).
    """
    pos, feat, mask = cloud.positions, cloud.features, cloud.mask
    n = pos.shape[0]
    if n % cell:
        raise ValueError(f"capacity {n} must be a multiple of {cell}")
    valid = mask > 0
    big = jnp.float32(3.4e38)
    order = jnp.arange(n)
    segs = [(0, n)]
    while any(size > cell for _, size in segs):
        new_segs = []
        for start, size in segs:
            if size <= cell:
                new_segs.append((start, size))
                continue
            ncells = size // cell
            left = (ncells // 2 + ncells % 2) * cell
            seg_idx = order[start:start + size]
            p = pos[seg_idx]
            v = valid[seg_idx]
            lo = jnp.min(jnp.where(v[:, None], p, big), axis=0)
            hi = jnp.max(jnp.where(v[:, None], p, -big), axis=0)
            dim = jnp.argmax(hi - lo)
            key = jnp.take_along_axis(
                p, jnp.full((size, 1), dim, jnp.int32), axis=1
            )[:, 0]
            key = jnp.where(v, key, jnp.inf)
            loc = jnp.argsort(key)
            order = order.at[start:start + size].set(seg_idx[loc])
            new_segs += [(start, left), (start + left, size - left)]
        segs = new_segs
    return PointCloud(pos[order], feat[order], mask[order])
