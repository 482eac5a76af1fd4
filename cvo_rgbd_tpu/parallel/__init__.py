from cvo_rgbd_tpu.parallel.mesh import make_mesh
from cvo_rgbd_tpu.parallel.sharded import (
    align_batched,
    align_ring,
    align_sharded,
    train_step_2d,
)

__all__ = [
    "make_mesh",
    "align_batched",
    "align_ring",
    "align_sharded",
    "train_step_2d",
]
