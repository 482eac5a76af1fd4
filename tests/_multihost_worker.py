"""Worker for tests/test_multihost.py — one of two cooperating
processes forming a 2-process (DCN-analog) CPU mesh via
jax.distributed.  Each process contributes 4 virtual devices; the
global mesh is dp=2 (across processes — the DCN axis) x sp=4 (within
a process — the ICI axis), and a shard_map psum must see all 8
devices.

Usage: python tests/_multihost_worker.py <port> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

    from jax.sharding import NamedSharding, PartitionSpec as P

    import numpy as np

    from cvo_rgbd_tpu.parallel import make_mesh, multihost_initialize
    from cvo_rgbd_tpu.parallel.sharded import shard_map

    multihost_initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    # repeated init must be the benign no-op path
    multihost_initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )

    mesh = make_mesh({"dp": 2, "sp": 4})

    local = (np.arange(4, dtype=np.float32) + 4 * pid)  # 0..7 globally
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(("dp", "sp"))), local, (8,)
    )
    f = shard_map(
        lambda x: jax.lax.psum(x, ("dp", "sp")),
        mesh=mesh,
        in_specs=P(("dp", "sp")),
        out_specs=P(),
    )
    out = jax.jit(f)(garr)
    val = float(np.asarray(out.addressable_data(0))[0])
    assert val == 28.0, val  # sum(0..7): the psum crossed both processes
    print(f"worker {pid} OK psum={val}", flush=True)


if __name__ == "__main__":
    main()
