"""Round-5 on-chip validation: tile skipping + sharded Pallas paths.

One process, all TPU work batched (CLAUDE.md relay rules).  Prints
compact JSON lines; exits nonzero on a correctness failure.
"""
import dataclasses
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from bench import _per_iteration_slope, synth_reference_scale  # noqa: E402
from cvo_rgbd_tpu import AcvoParams, CvoParams, align_jit  # noqa: E402
from cvo_rgbd_tpu.core.cloud import stack_clouds  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
fails = []


def line(tag, **kw):
    print(json.dumps({"leg": tag, **kw}), flush=True)


# ---------------------------------------------------------------- skip
# 1. on-chip bitwise equality of tile_skip on/off + C++-stop
#    convergence with the skip enabled (8 pairs each variant)
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, truth = synth_reference_scale(n_pairs=8, hsv_scale=hsv)
    p_on = Base(backend="pallas", max_iter=400, tile_skip=True)
    p_off = dataclasses.replace(p_on, tile_skip=False)
    a = align_jit(p_on, fixed[0], moving[0])
    b = align_jit(p_off, fixed[0], moving[0])
    eq = bool(np.array_equal(np.asarray(a.tf), np.asarray(b.tf))
              and int(a.iterations) == int(b.iterations))
    if not eq:
        d = float(np.abs(np.asarray(a.tf) - np.asarray(b.tf)).max())
        fails.append(f"skip_bitwise_{tag}")
        line(f"skip_bitwise_{tag}", equal=False, dtf=d,
             it_on=int(a.iterations), it_off=int(b.iterations))
    else:
        line(f"skip_bitwise_{tag}", equal=True, iters=int(a.iterations))

    # convergence at the C++ shipped stops with the skip on
    fb, mb = stack_clouds(fixed), stack_clouds(moving)
    fn = jax.jit(jax.vmap(functools.partial(
        __import__("cvo_rgbd_tpu.core.registration",
                   fromlist=["align"]).align, p_on)))
    res = fn(fb, mb)
    jax.block_until_ready(res.tf)
    conv = int(np.sum(np.asarray(res.converged)))
    it = np.asarray(res.iterations)
    line(f"cpp_stops_skip_{tag}", converged=f"{conv}/8",
         mean_iters=round(float(it.mean()), 1), max_iters=int(it.max()))
    if conv < 8:
        fails.append(f"cpp_stops_skip_{tag}")

# ---------------------------------------------------------- per-iter
# 2. per-iteration slopes with skip on/off (MATLAB-stop param set, the
#    bench methodology: batch-8, fixed-iteration slope)
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, _ = synth_reference_scale(n_pairs=8, hsv_scale=hsv)
    for skip in (True, False):
        p = Base(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4,
                 tile_skip=skip)
        ms = _per_iteration_slope(p, fixed, moving) * 1e3
        line("per_iter", variant=tag, tile_skip=skip,
             ms_per_iteration=round(ms, 4))

# ------------------------------------------------------------ sharded
# 3. sharded path at sp=1 on the real chip: per-device per-iteration
#    cost must match the single-chip single-pair Pallas floor
#    (VERDICT r4 item 1 done-criterion)
from cvo_rgbd_tpu.parallel import align_sharded, make_mesh  # noqa: E402

mesh = make_mesh({"sp": 1})
fixed, moving, _ = synth_reference_scale(n_pairs=2)
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, _ = synth_reference_scale(n_pairs=2, hsv_scale=hsv)
    slope = {}
    for label, runner in (
        ("sharded_sp1", lambda pi: jax.jit(
            functools.partial(align_sharded, pi, mesh))),
        ("single", lambda pi: jax.jit(functools.partial(
            __import__("cvo_rgbd_tpu.core.registration",
                       fromlist=["align"]).align, pi))),
    ):
        ts_by_it = {}
        for it in (10, 60):
            pi = Base(backend="pallas", eps=0.0, eps_2=0.0, max_iter=it)
            f = runner(pi)
            jax.block_until_ready(f(fixed[0], moving[0]).tf)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f(fixed[0], moving[0]).tf)
                ts.append(time.perf_counter() - t0)
            ts_by_it[it] = float(np.min(ts))
        slope[label] = (ts_by_it[60] - ts_by_it[10]) / 50.0 * 1e3
    ratio = slope["sharded_sp1"] / max(slope["single"], 1e-9)
    line("sharded_sp1_vs_single", variant=tag,
         sharded_ms_it=round(slope["sharded_sp1"], 4),
         single_ms_it=round(slope["single"], 4), ratio=round(ratio, 3))

print("TPU_VALIDATE", "FAIL" if fails else "OK", fails, flush=True)
sys.exit(1 if fails else 0)
