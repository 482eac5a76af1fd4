from cvo_rgbd_tpu.utils.downsample import grid_downsample, range_filter

__all__ = ["grid_downsample", "range_filter"]
