from cvo_rgbd_tpu.utils.downsample import grid_downsample, range_filter
from cvo_rgbd_tpu.utils.edge import canny_edges, edge_filter

__all__ = ["grid_downsample", "range_filter", "canny_edges", "edge_filter"]
