from cvo_rgbd_tpu.frontend.camera import CAMERAS, CameraInfo
from cvo_rgbd_tpu.frontend.pipeline import make_frontend, process_frame

__all__ = ["CAMERAS", "CameraInfo", "make_frontend", "process_frame"]
