"""Scaling sweep: frames/s vs mesh size for the sharded registration.

BASELINE.json asks for frames/s scaling efficiency at 1 chip / 1 host /
>= 2 hosts.  This tool sweeps the `sp` (point-sharding) and `dp`
(pair-batch) axes over however many devices exist — real chips on a
pod, or the virtual CPU mesh for plumbing validation:

    python scaling_bench.py                # all local devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scaling_bench.py            # virtual 8-device mesh

Prints one JSON line per configuration.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def main():
    import jax

    if os.environ.get("SCALING_BENCH_CPU"):
        # the session sitecustomize registers the tunneled TPU backend
        # programmatically (the JAX_PLATFORMS env var is ignored —
        # CLAUDE.md); force the virtual CPU mesh via the config instead
        jax.config.update("jax_platforms", "cpu")

    from cvo_rgbd_tpu import CvoParams, pad_cloud, se3
    from cvo_rgbd_tpu.parallel import align_sharded, make_mesh, train_step_2d

    ndev = len(jax.devices())
    rng = np.random.default_rng(0)
    # half the workload on the CPU mesh: the sweep validates collective
    # plumbing + efficiency shape there, not absolute speed
    N = 1536 if os.environ.get("SCALING_BENCH_CPU") else 3072
    base = (
        rng.standard_normal((N + 200, 3)) * np.array([0.8, 0.6, 0.5])
        + np.array([0.3, -0.2, 2.5])
    ).astype(np.float32)
    feat = (rng.random((N + 200, 5)) * np.array([255, 255, 255, 60, 60])).astype(
        np.float32
    )
    R = np.asarray(se3.exp_so3(np.array([0.01, -0.012, 0.008], np.float32)))
    t = np.array([0.02, -0.01, 0.015], np.float32)
    yp = (base[100 : 100 + N] @ R.T + t).astype(np.float32)
    x = pad_cloud(base[:N], feat[:N], capacity=N)
    y = pad_cloud(yp, feat[100 : 100 + N], capacity=N)
    p = CvoParams(max_iter=30, eps=0.0, eps_2=0.0)

    sweep = [s for s in (1, 2, 4, 8, 16, 32) if s <= ndev and N % s == 0]
    results = []
    for sp in sweep:
        mesh = make_mesh({"sp": sp})
        fn = jax.jit(functools.partial(align_sharded, p, mesh))
        res = fn(x, y)
        jax.block_until_ready(res.tf)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = fn(x, y)
            jax.block_until_ready(res.tf)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        rec = {
            "mode": "sp_shard",
            "n": N,
            "devices": sp,
            "ms_per_pair_30it": round(med * 1e3, 2),
            "us_per_iter": round(med / 30 * 1e6, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # weak-scaling over dp: one pair per dp group
    for dp in [d for d in (2, 4, 8) if d <= ndev]:
        sp = ndev // dp
        if sp < 1 or N % max(sp, 1):
            continue
        mesh = make_mesh({"dp": dp, "sp": sp})

        def stack(c, n=dp):
            from cvo_rgbd_tpu.core.cloud import PointCloud

            return PointCloud(*(np.stack([np.asarray(a)] * n) for a in c))

        fn = jax.jit(functools.partial(train_step_2d, p, mesh))
        fb, mb = stack(x), stack(y)
        res = fn(fb, mb)
        jax.block_until_ready(res.tf)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = fn(fb, mb)
            jax.block_until_ready(res.tf)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        rec = {
            "mode": "dp_x_sp",
            "devices": ndev,
            "dp": dp,
            "sp": sp,
            "pairs": dp,
            "ms_per_step_30it": round(med * 1e3, 2),
            "pairs_per_s": round(dp / med, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    return results


if __name__ == "__main__":
    main()
