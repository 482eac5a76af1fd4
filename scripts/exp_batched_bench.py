"""Experiment: sequential vs batched registration throughput on the
fr1/desk fixture pairs (real TPU).  Not part of the test suite."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    import jax

    from cvo_rgbd_tpu import MATLAB_PARAMS, align_jit
    from cvo_rgbd_tpu.core.cloud import PointCloud, stack_clouds
    from cvo_rgbd_tpu.parallel import align_batched

    clouds = bench.load_clouds()
    pairs = list(zip(clouds[:-1], clouds[1:]))
    npairs = len(pairs)

    stack = stack_clouds
    fb = stack([f for f, _ in pairs])
    mb = stack([m for _, m in pairs])

    # warmup both paths
    for f, m in pairs:
        jax.block_until_ready(align_jit(MATLAB_PARAMS, f, m).tf)
    res = align_batched(MATLAB_PARAMS, fb, mb)
    jax.block_until_ready(res.tf)
    print("batched iterations:", np.asarray(res.iterations),
          "converged:", np.asarray(res.converged), flush=True)

    seq_times, bat_times = [], []
    for r in range(7):
        t0 = time.perf_counter()
        for f, m in pairs:
            jax.block_until_ready(align_jit(MATLAB_PARAMS, f, m).tf)
        seq_times.append((time.perf_counter() - t0) / npairs)
        t0 = time.perf_counter()
        res = align_batched(MATLAB_PARAMS, fb, mb)
        jax.block_until_ready(res.tf)
        bat_times.append((time.perf_counter() - t0) / npairs)

    print("seq  per-pair ms:", [round(t * 1e3, 2) for t in seq_times],
          "median", round(float(np.median(seq_times)) * 1e3, 2))
    print("bat  per-pair ms:", [round(t * 1e3, 2) for t in bat_times],
          "median", round(float(np.median(bat_times)) * 1e3, 2))

    # also try a wider batch (replicate pairs 4x -> batch 16) to see
    # how throughput scales with batch width
    fb4 = PointCloud(*(np.concatenate([np.asarray(a)] * 4) for a in fb))
    mb4 = PointCloud(*(np.concatenate([np.asarray(a)] * 4) for a in mb))
    res = align_batched(MATLAB_PARAMS, fb4, mb4)
    jax.block_until_ready(res.tf)
    wide = []
    for r in range(7):
        t0 = time.perf_counter()
        res = align_batched(MATLAB_PARAMS, fb4, mb4)
        jax.block_until_ready(res.tf)
        wide.append((time.perf_counter() - t0) / (npairs * 4))
    print("b16  per-pair ms:", [round(t * 1e3, 2) for t in wide],
          "median", round(float(np.median(wide)) * 1e3, 2))


if __name__ == "__main__":
    main()
