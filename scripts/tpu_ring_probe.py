"""On-chip: the moment-carrying ring at sp=1 (compiles + runs the
single-sweep pallas ring on real hardware; correctness vs single)."""
import functools, json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
from bench import synth_reference_scale
from cvo_rgbd_tpu import AcvoParams, CvoParams
from cvo_rgbd_tpu.core.registration import align
from cvo_rgbd_tpu.parallel import make_mesh
from cvo_rgbd_tpu.parallel.sharded import align_ring

print("backend:", jax.default_backend(), flush=True)
mesh = make_mesh({"sp": 1})
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, _ = synth_reference_scale(n_pairs=1, hsv_scale=hsv)
    try:
        p = Base(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4)
        fn = jax.jit(functools.partial(align_ring, p, mesh))
        res = fn(fixed[0], moving[0])
        jax.block_until_ready(res.tf)
        ref = jax.jit(functools.partial(align, p))(fixed[0], moving[0])
        d = float(np.abs(np.asarray(res.tf) - np.asarray(ref.tf)).max())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(fixed[0], moving[0]).tf)
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"leg": "ring_sp1", "variant": tag,
                          "dtf_vs_single": round(d, 6),
                          "iters": int(res.iterations),
                          "conv": bool(res.converged),
                          "best_wall_ms": round(min(ts) * 1e3, 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"leg": "ring_sp1_fail", "variant": tag,
                          "error": str(e)[:200]}), flush=True)
print("DONE", flush=True)
