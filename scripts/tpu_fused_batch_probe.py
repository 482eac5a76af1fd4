"""Batched (vmapped) tiled mega-kernel at reference scale on-chip."""
import functools, json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
from bench import synth_reference_scale
from cvo_rgbd_tpu import AcvoParams, CvoParams
from cvo_rgbd_tpu.core.cloud import stack_clouds
from cvo_rgbd_tpu.core.registration import align

print("backend:", jax.default_backend(), flush=True)
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, _ = synth_reference_scale(n_pairs=8, hsv_scale=hsv)
    fb, mb = stack_clouds(fixed), stack_clouds(moving)
    try:
        slope = {}
        for it in (10, 60):
            p = Base(backend="fused", eps=0.0, eps_2=0.0, max_iter=it)
            fn = jax.jit(jax.vmap(functools.partial(align, p)))
            jax.block_until_ready(fn(fb, mb).tf)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(fb, mb).tf)
                ts.append(time.perf_counter() - t0)
            slope[it] = float(np.min(ts))
        ms_it = (slope[60] - slope[10]) / 50.0 / 8 * 1e3
        print(json.dumps({"leg": "fused_batch8", "variant": tag,
                          "ms_per_iteration_per_pair": round(ms_it, 4)}),
              flush=True)
        # convergence sanity at C++ stops, batch of 8
        p = Base(backend="fused", max_iter=400)
        fn = jax.jit(jax.vmap(functools.partial(align, p)))
        res = fn(fb, mb)
        jax.block_until_ready(res.tf)
        print(json.dumps({"leg": "fused_batch8_conv", "variant": tag,
                          "conv": int(np.sum(np.asarray(res.converged))),
                          "mean_it": round(float(np.mean(np.asarray(res.iterations))), 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"leg": "fused_batch8_fail", "variant": tag,
                          "error": str(e)[:200]}), flush=True)
print("DONE", flush=True)
