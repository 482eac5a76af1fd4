from cvo_rgbd_tpu.core.cloud import PointCloud, pad_cloud, stack_clouds
from cvo_rgbd_tpu.core.registration import AlignResult, align, make_align_step

__all__ = [
    "PointCloud",
    "pad_cloud",
    "stack_clouds",
    "AlignResult",
    "align",
    "make_align_step",
]
