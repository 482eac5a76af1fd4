"""Experiment: per-iteration align cost at reference scale (N=M=3072)
on the real TPU, batch-amortized.  Not part of the test suite.

Methodology (docs/PERF.md): the dev relay costs ~25-30 ms per dispatch,
so per-iteration time is measured as the SLOPE between two fixed
iteration counts on a batch-B vmapped align:

    per_iter = (t(hi) - t(lo)) / (hi - lo) / B

Convergence tolerances are zeroed so every lane runs exactly max_iter
iterations.

Usage: python scripts/exp_iter_bench.py [cvo|acvo|both] [backend ...]
"""

import dataclasses
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def synth_pair(rng, n, cap):
    from cvo_rgbd_tpu import pad_cloud, se3

    base = rng.standard_normal((n + 50, 3)).astype(np.float32) * 1.2
    feat = (rng.random((n + 50, 5)) * np.array([255, 255, 255, 60, 60]))
    feat = feat.astype(np.float32)
    R = np.asarray(se3.exp_so3(np.array([0.02, -0.015, 0.01], np.float32)))
    t = np.array([0.03, -0.02, 0.025], np.float32)
    yp = (base[30:30 + n] @ R.T + t).astype(np.float32)
    x = pad_cloud(base[:n], feat[:n], capacity=cap)
    y = pad_cloud(yp, feat[30:30 + n], capacity=cap)
    return x, y


def bench_one(p, name, batch=8, lo=10, hi=60, n=3000, cap=3072, rounds=5):
    import jax

    from cvo_rgbd_tpu.core.cloud import stack_clouds
    from cvo_rgbd_tpu.core.registration import align

    rng = np.random.default_rng(0)
    xs, ys = [], []
    for b in range(batch):
        x, y = synth_pair(rng, n, cap)
        xs.append(x)
        ys.append(y)
    fb, mb = stack_clouds(xs), stack_clouds(ys)

    results = {}
    for iters in (lo, hi):
        pi = dataclasses.replace(p, eps=0.0, eps_2=0.0, max_iter=iters)
        fn = jax.jit(jax.vmap(functools.partial(align, pi)))
        r = fn(fb, mb)
        jax.block_until_ready(r.tf)  # compile + warmup
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(fb, mb).tf)
            ts.append(time.perf_counter() - t0)
        results[iters] = float(np.median(ts))
        print(f"  {name} iters={iters}: total {results[iters]*1e3:.1f} ms",
              flush=True)
    per_iter = (results[hi] - results[lo]) / (hi - lo) / batch
    print(f"{name}: {per_iter*1e6:.0f} us/iteration/pair "
          f"(batch={batch}, N={cap})", flush=True)
    return per_iter


def main():
    import jax

    from cvo_rgbd_tpu import AcvoParams, CvoParams

    print("device:", jax.devices()[0], flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    backends = sys.argv[2:] or ["xla", "pallas"]

    for backend in backends:
        if which in ("cvo", "both"):
            bench_one(CvoParams(backend=backend), f"cvo/{backend}")
        if which in ("acvo", "both"):
            bench_one(AcvoParams(backend=backend), f"acvo/{backend}")


if __name__ == "__main__":
    main()
