"""A/B: 128 vs 256 tile size for the skip-enabled moment kernels."""
import json, sys
sys.path.insert(0, "/root/repo")
import jax

# patch the tile preference BEFORE any kernel module gets used
import cvo_rgbd_tpu.ops.pallas_gram as pg
import cvo_rgbd_tpu.ops.pallas_moments as pm

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 128

def _tile_small(n):
    if n % TILE == 0:
        return TILE
    if n % 128 == 0:
        return 128
    raise ValueError(f"cloud capacity {n} must be a multiple of 128")

pg._tile = _tile_small
pm._tile = _tile_small

from bench import _per_iteration_slope, synth_reference_scale
from cvo_rgbd_tpu import AcvoParams, CvoParams

print("backend:", jax.default_backend(), "tile:", TILE, flush=True)
for tag, Base, hsv in (("cvo", CvoParams, False), ("acvo", AcvoParams, True)):
    fixed, moving, _ = synth_reference_scale(n_pairs=8, hsv_scale=hsv)
    p = Base(backend="pallas", max_iter=200, eps=5e-4, eps_2=1e-4)
    ms = _per_iteration_slope(p, fixed, moving) * 1e3
    print(json.dumps({"leg": "per_iter", "variant": tag, "tile": TILE,
                      "ms_per_iteration": round(ms, 4)}), flush=True)
print("DONE", flush=True)
