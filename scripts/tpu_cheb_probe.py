"""On-chip: acvo self_mode=cheb per-iteration cost + convergence."""
import json, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, functools
from bench import _per_iteration_slope, synth_reference_scale
from cvo_rgbd_tpu import AcvoParams
from cvo_rgbd_tpu.core.cloud import stack_clouds
from cvo_rgbd_tpu.core.registration import align

print("backend:", jax.default_backend(), flush=True)
fixed, moving, _ = synth_reference_scale(n_pairs=8, hsv_scale=True)
for mode in ("exact", "cheb"):
    p = AcvoParams(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4,
                   self_mode=mode)
    ms = _per_iteration_slope(p, fixed, moving) * 1e3
    print(json.dumps({"leg": "acvo_self_mode", "mode": mode,
                      "ms_per_iteration": round(ms, 4)}), flush=True)
# convergence at the C++ stops, batch of 8
p = AcvoParams(backend="pallas", max_iter=400, self_mode="cheb")
fn = jax.jit(jax.vmap(functools.partial(align, p)))
res = fn(stack_clouds(fixed), stack_clouds(moving))
jax.block_until_ready(res.tf)
p0 = AcvoParams(backend="pallas", max_iter=400)
fn0 = jax.jit(jax.vmap(functools.partial(align, p0)))
res0 = fn0(stack_clouds(fixed), stack_clouds(moving))
jax.block_until_ready(res0.tf)
d = float(np.abs(np.asarray(res.tf) - np.asarray(res0.tf)).max())
print(json.dumps({"leg": "acvo_cheb_conv",
                  "conv": int(np.sum(np.asarray(res.converged))),
                  "mean_it": round(float(np.mean(np.asarray(res.iterations))), 1),
                  "exact_mean_it": round(float(np.mean(np.asarray(res0.iterations))), 1),
                  "max_dtf_vs_exact": round(d, 6)}), flush=True)
print("DONE", flush=True)
