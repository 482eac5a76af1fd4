"""Probe: tiled mega-kernel Mosaic compile + run at reference scale."""
import dataclasses, functools, json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
from bench import synth_reference_scale
from cvo_rgbd_tpu import AcvoParams, CvoParams, align_jit

print("backend:", jax.default_backend(), flush=True)
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, _ = synth_reference_scale(n_pairs=2, hsv_scale=hsv)
    try:
        p_f = Base(backend="fused", max_iter=200, eps=5e-4, eps_2=1e-4)
        p_p = Base(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4)
        t0 = time.time()
        a = align_jit(p_f, fixed[0], moving[0])
        print(json.dumps({"leg": f"compile_{tag}", "s": round(time.time()-t0, 1),
                          "iters": int(a.iterations), "conv": bool(a.converged)}), flush=True)
        b = align_jit(p_p, fixed[0], moving[0])
        d = float(np.abs(np.asarray(a.tf) - np.asarray(b.tf)).max())
        print(json.dumps({"leg": f"agree_{tag}", "dtf": round(d, 6)}), flush=True)
        # per-iteration slope, single pair
        slope = {}
        for name, pp in (("fused", p_f), ("pallas", p_p)):
            ts_by = {}
            for it in (10, 60):
                pi = dataclasses.replace(pp, eps=0.0, eps_2=0.0, max_iter=it)
                fn = jax.jit(functools.partial(
                    __import__("cvo_rgbd_tpu.core.registration", fromlist=["align"]).align, pi))
                jax.block_until_ready(fn(fixed[0], moving[0]).tf)
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(fixed[0], moving[0]).tf)
                    ts.append(time.perf_counter() - t0)
                ts_by[it] = float(np.min(ts))
            slope[name] = (ts_by[60] - ts_by[10]) / 50.0 * 1e3
        print(json.dumps({"leg": f"perf_{tag}",
                          "fused_ms_it": round(slope["fused"], 4),
                          "pallas_ms_it": round(slope["pallas"], 4)}), flush=True)
    except Exception as e:
        print(json.dumps({"leg": f"fail_{tag}", "error": str(e)[:200]}), flush=True)
print("DONE", flush=True)
