"""Finer bisect: which tiled-kernel slice direction breaks Mosaic."""
import json, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

def try_case(name, fn):
    try:
        out = fn()
        print(json.dumps({"case": name, "ok": True,
                          "val": float(np.asarray(out).ravel()[0])}), flush=True)
    except Exception as e:
        print(json.dumps({"case": name, "ok": False, "err": str(e)[:120]}), flush=True)

# h: (N,1) column ref sliced at sublane offset 256
def case_h():
    def k(x_ref, o_ref):
        t = x_ref[pl.ds(256, 256), :]          # (256,1) at offset
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        o_ref[:, :] = jnp.where(row == 0, jnp.sum(t), 0.0)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return f(jnp.ones((512, 1), jnp.float32))

# i: (1,M) row VALUE lane-sliced at offset 256
def case_i():
    def k(x_ref, o_ref):
        v = x_ref[:, :] * 2.0                   # (1,512) value
        t = v[:, 256:512]                       # lane slice at offset
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        o_ref[:, :] = jnp.where(row == 0, jnp.sum(t), 0.0)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return f(jnp.ones((1, 512), jnp.float32))

# j: broadcast (256,1)x(1,256) from offset slices + reduce
def case_j():
    def k(x_ref, y_ref, o_ref):
        xc = x_ref[pl.ds(256, 256), :]
        yr = (y_ref[:, :] * 2.0)[:, 256:512]
        d = (xc - yr) ** 2
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        o_ref[:, :] = jnp.where(row == 0, jnp.sum(d), 0.0)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return f(jnp.ones((512, 1), jnp.float32), jnp.ones((1, 512), jnp.float32))

# k: momT-style [128, 512] scratch, += at lane offset 256 inside while
def case_k():
    def k(s_ref, o_ref, sc_ref):
        def body(c):
            sc_ref[:, :] = jnp.zeros((128, 512), jnp.float32)
            contrib = jnp.full((128, 256), 2.0, jnp.float32)
            sc_ref[:, 256:512] += contrib
            return c + 1
        jax.lax.while_loop(lambda c: c < 2, body, jnp.int32(0))
        o_ref[:, :] = sc_ref[0:8, 256:384]
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, 512), jnp.float32)],
    )
    return f(jnp.zeros((1, 8), jnp.float32))

# g2: tiled align nbi=2, nbj=1 (x tiling only)
def tiled(nx, mx):
    import cvo_rgbd_tpu.ops.pallas_align as pa
    from cvo_rgbd_tpu import CvoParams, pad_cloud
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((nx - 20, 3)).astype(np.float32)
    feat = (rng.random((nx - 20, 5)) * 255).astype(np.float32)
    x = pad_cloud(pos, feat, capacity=nx)
    pos2 = rng.standard_normal((mx - 20, 3)).astype(np.float32)
    feat2 = (rng.random((mx - 20, 5)) * 255).astype(np.float32)
    y = pad_cloud(pos2, feat2, capacity=mx)
    orig = pa._fused_mode
    pa._fused_mode = lambda p, f, m: "tiled"
    try:
        res = pa.align_fused(CvoParams(max_iter=4, eps=5e-4, eps_2=1e-4), x, y)
        return res.iterations
    finally:
        pa._fused_mode = orig

for nm, fn in [("h", case_h), ("i", case_i), ("j", case_j), ("k", case_k),
               ("g2_x2_y1", lambda: tiled(512, 256)),
               ("g3_x1_y2", lambda: tiled(256, 512))]:
    try_case(nm, fn)
print("DONE", flush=True)
