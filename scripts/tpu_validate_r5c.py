"""Round-5 on-chip validation, part 2: tiled mega-kernel + sorted
sharded paths + self-sweep cache experiment.  One process (relay
rules); compact JSON lines; nonzero exit on correctness failure."""
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

print("backend:", jax.default_backend(), flush=True)
fails = []


def line(tag, **kw):
    print(json.dumps({"leg": tag, **kw}), flush=True)


def timed_align(p, f, m, reps=5):
    fn = jax.jit(functools.partial(
        __import__("cvo_rgbd_tpu.core.registration",
                   fromlist=["align"]).align, p))
    jax.block_until_ready(fn(f, m).tf)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(f, m).tf)
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


# ---------------------------------------------------------- tiled fused
# 1. Mosaic compile + run at reference scale, agreement + timing vs the
#    per-iteration pallas backend
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, _ = synth_reference_scale(n_pairs=2, hsv_scale=hsv)
    try:
        p_f = Base(backend="fused", max_iter=200, eps=5e-4, eps_2=1e-4)
        p_p = Base(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4)
        a = align_jit(p_f, fixed[0], moving[0])
        b = align_jit(p_p, fixed[0], moving[0])
        d = float(np.abs(np.asarray(a.tf) - np.asarray(b.tf)).max())
        ok = bool(a.converged) and bool(b.converged) and d < 2e-3
        line(f"tiled_fused_{tag}", dtf=round(d, 6),
             iters_fused=int(a.iterations), iters_pallas=int(b.iterations),
             converged=bool(a.converged))
        if not ok:
            fails.append(f"tiled_fused_{tag}")
        # per-iteration slope: fixed-iteration aligns (eps=0)
        slope = {}
        for name, pp in (("fused", p_f), ("pallas", p_p)):
            ts_by = {}
            for it in (10, 60):
                pi = dataclasses.replace(pp, eps=0.0, eps_2=0.0, max_iter=it)
                ts_by[it] = timed_align(pi, fixed[0], moving[0])
            slope[name] = (ts_by[60] - ts_by[10]) / 50.0 * 1e3
        line(f"tiled_perf_{tag}",
             fused_ms_it=round(slope["fused"], 4),
             pallas_ms_it=round(slope["pallas"], 4),
             ratio=round(slope["fused"] / max(slope["pallas"], 1e-9), 3))
    except Exception as e:  # Mosaic lowering failure etc.
        fails.append(f"tiled_fused_{tag}")
        line(f"tiled_fused_{tag}", error=str(e)[:300])

# ---------------------------------------------------- sharded (sorted)
# 2. sharded sp=1 vs single with the kd-sort + skip wiring in place
from cvo_rgbd_tpu.parallel import align_sharded, make_mesh  # noqa: E402

mesh = make_mesh({"sp": 1})
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
        ts_by = {}
        for it in (10, 60):
            pi = Base(backend="pallas", eps=0.0, eps_2=0.0, max_iter=it)
            f = runner(pi)
            jax.block_until_ready(f(fixed[0], moving[0]).tf)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f(fixed[0], moving[0]).tf)
                ts.append(time.perf_counter() - t0)
            ts_by[it] = float(np.min(ts))
        slope[label] = (ts_by[60] - ts_by[10]) / 50.0 * 1e3
    ratio = slope["sharded_sp1"] / max(slope["single"], 1e-9)
    line("sharded_sp1_sorted", variant=tag,
         sharded_ms_it=round(slope["sharded_sp1"], 4),
         single_ms_it=round(slope["single"], 4), ratio=round(ratio, 3))
    if ratio > 1.35:
        fails.append(f"sharded_sp1_{tag}")

# --------------------------------------------- self-sweep ck experiment
# 3. acvo per-iteration with ck_cache off (self-sweeps recompute color
#    in-kernel; skipped tiles then cost nothing at all) vs on
fixed, moving, _ = synth_reference_scale(n_pairs=8, hsv_scale=True)
for ck in (True, False):
    p = AcvoParams(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4,
                   ck_cache=ck)
    ms = _per_iteration_slope(p, fixed, moving) * 1e3
    line("acvo_ck_experiment", ck_cache=ck, ms_per_iteration=round(ms, 4))

# cvo too (ck_cache off on the moment sweep)
fixed, moving, _ = synth_reference_scale(n_pairs=8)
for ck in (True, False):
    p = CvoParams(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4,
                  ck_cache=ck)
    ms = _per_iteration_slope(p, fixed, moving) * 1e3
    line("cvo_ck_experiment", ck_cache=ck, ms_per_iteration=round(ms, 4))

print("TPU_VALIDATE2", "FAIL" if fails else "OK", fails, flush=True)
sys.exit(1 if fails else 0)
