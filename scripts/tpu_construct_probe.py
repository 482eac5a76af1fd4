"""Bisect which Mosaic construct breaks the tiled mega-kernel."""
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
        print(json.dumps({"case": name, "ok": True, "val": float(np.asarray(out).ravel()[0])}), flush=True)
    except Exception as e:
        print(json.dumps({"case": name, "ok": False, "err": str(e)[:150]}), flush=True)

# A: no-grid kernel + VMEM scratch
def case_a():
    def k(x_ref, o_ref, s_ref):
        s_ref[:, :] = x_ref[:, :] * 2.0
        o_ref[:, :] = s_ref[:, :] + 1.0
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    return f(jnp.ones((8, 128), jnp.float32))

# B: while_loop(scalar) body writing static lane slices of a wide scratch
def case_b():
    def k(x_ref, o_ref, s_ref):
        def body(c):
            k_, acc = c
            s_ref[:, 256:512] += x_ref[:, 0:256] * acc
            return (k_ + 1, acc + 1.0)
        def cond(c):
            return c[0] < 3
        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))
        o_ref[:, :] = s_ref[:, 256:384]
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 1024), jnp.float32)],
    )
    return f(jnp.ones((8, 1024), jnp.float32))

# B2: zeroing a big scratch inside a while body
def case_b2():
    def k(x_ref, o_ref, s_ref):
        def body(c):
            s_ref[:, :] = jnp.zeros((128, 1024), jnp.float32)
            s_ref[:, 0:256] += x_ref[0:128, 0:256]
            return c + 1
        jax.lax.while_loop(lambda c: c < 3, body, jnp.int32(0))
        o_ref[:, :] = s_ref[0:8, 0:128]
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, 1024), jnp.float32)],
    )
    return f(jnp.ones((256, 1024), jnp.float32))

# C: wide SMEM row (1, 160)
def case_c():
    def k(s_ref, o_ref):
        v = s_ref[0, 0] + s_ref[0, 159]
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        o_ref[:, :] = jnp.where(row == 0, v, 0.0)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return f(jnp.arange(160, dtype=jnp.float32).reshape(1, 160))

# D: pl.when(traced scalar) guarding a scratch store, inside while
def case_d():
    def k(s_ref, o_ref, sc_ref):
        def body(c):
            @pl.when(s_ref[0, 0] > -1.0)
            def _():
                sc_ref[:, :] += 1.0
            return c + 1
        jax.lax.while_loop(lambda c: c < 3, body, jnp.int32(0))
        o_ref[:, :] = sc_ref[:, :]
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    return f(jnp.zeros((1, 8), jnp.float32))

# E: MXU dot inside while + pl.when
def case_e():
    def k(s_ref, o_ref, sc_ref):
        def body(c):
            @pl.when(s_ref[0, 0] > -1.0)
            def _():
                a = jnp.full((256, 256), 0.01, jnp.float32)
                b = jnp.full((256, 128), 0.02, jnp.float32)
                sc_ref[:, :] += jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )[0:8, 0:128]
            return c + 1
        jax.lax.while_loop(lambda c: c < 3, body, jnp.int32(0))
        o_ref[:, :] = sc_ref[:, :]
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )
    return f(jnp.zeros((1, 8), jnp.float32))

# F: the actual tiled kernel at 1 tile (256x256) via forced mode
def case_f():
    import cvo_rgbd_tpu.ops.pallas_align as pa
    from cvo_rgbd_tpu import CvoParams, pad_cloud
    rng = np.random.default_rng(0)
    n = 220
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    feat = (rng.random((n, 5)) * 255).astype(np.float32)
    x = pad_cloud(pos, feat, capacity=256)
    y = pad_cloud(pos + 0.01, feat, capacity=256)
    orig = pa._fused_mode
    pa._fused_mode = lambda p, f, m: "tiled"
    try:
        res = pa.align_fused(CvoParams(max_iter=5, eps=5e-4, eps_2=1e-4), x, y)
        return res.iterations
    finally:
        pa._fused_mode = orig

# G: tiled at 2x2 tiles (512)
def case_g():
    import cvo_rgbd_tpu.ops.pallas_align as pa
    from cvo_rgbd_tpu import CvoParams, pad_cloud
    rng = np.random.default_rng(0)
    n = 500
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    feat = (rng.random((n, 5)) * 255).astype(np.float32)
    x = pad_cloud(pos, feat, capacity=512)
    y = pad_cloud(pos + 0.01, feat, capacity=512)
    orig = pa._fused_mode
    pa._fused_mode = lambda p, f, m: "tiled"
    try:
        res = pa.align_fused(CvoParams(max_iter=5, eps=5e-4, eps_2=1e-4), x, y)
        return res.iterations
    finally:
        pa._fused_mode = orig

for nm, fn in [("a", case_a), ("b", case_b), ("b2", case_b2), ("c", case_c),
               ("d", case_d), ("e", case_e), ("f", case_f), ("g", case_g)]:
    try_case(nm, fn)
print("DONE", flush=True)
