from cvo_rgbd_tpu.parallel.ba import (
    BAProblem,
    ba_cost,
    ba_from_keyframes,
    ba_solve,
    make_ba_problem,
)
from cvo_rgbd_tpu.parallel.mesh import make_mesh, multihost_initialize
from cvo_rgbd_tpu.parallel.sharded import (
    align_batched,
    align_ring,
    align_sharded,
    train_step_2d,
)

__all__ = [
    "BAProblem",
    "ba_cost",
    "ba_from_keyframes",
    "ba_solve",
    "make_ba_problem",
    "make_mesh",
    "multihost_initialize",
    "align_batched",
    "align_ring",
    "align_sharded",
    "train_step_2d",
]
