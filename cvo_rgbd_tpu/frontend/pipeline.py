"""RGB-D frame -> padded PointCloud: the full jitted frontend.

Replaces pcd_generator::create_pointcloud (pcd_generator.cpp:398-420):
pyramid + selection + pinhole backprojection + 5-dim features, one XLA
program per (H, W, num_want, feature_type), static shapes throughout.

feature_type semantics (pcd_generator.cpp:329-382):
- 0: HSV normalized to ~[0,1] (H/180, S/255, V/255) + gradients
     *2/255 — used by adaptive CVO (adaptive_cvo.cpp:451).
- 1: raw RGB 0..255 + raw gradients — used by CVO (cvo.cpp:340).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cvo_rgbd_tpu.core.cloud import PointCloud, round_up
from cvo_rgbd_tpu.frontend import image as image_mod
from cvo_rgbd_tpu.frontend import selector as selector_mod
from cvo_rgbd_tpu.frontend.camera import get_camera


def _process(rgb, depth, *, cam, num_want, feature_type, dep_thres, pot,
             bgr_quirk=False):
    """rgb [H,W,3] f32 0..255, depth [H,W] f32 raw sensor units.

    bgr_quirk: opt-in bit-parity mode with the reference binaries, which
    load BGR via cv::imread but convert with COLOR_RGB2GRAY/RGB2HSV
    (pcd_generator.cpp:390-391), i.e. run RGB formulas on BGR data and
    emit features in [b,g,r,dx,dy] storage order (pcd_generator.cpp:
    359-381).  Flipping the channel axis before any conversion
    reproduces all of that at once.  Default off: the registration
    kernel only compares features between frames, so the correct RGB
    math is used unless byte-level parity with reference output is the
    goal (frontend/image.py module docstring).
    """
    h, w = depth.shape
    if bgr_quirk:
        rgb = rgb[..., ::-1]
    gray = image_mod.rgb_to_gray(rgb)
    pyr = image_mod.make_pyramid(gray)
    idx, sel_valid = selector_mod.select_pixels(pyr, num_want, pot=pot)

    ys = idx // w
    xs = idx % w
    dep = depth.reshape(-1)[idx]
    # depth gates (pcd_generator.cpp:306-308 `dep!=0 && !isnan`, plus the
    # dep_thres field the reference declares at pcd_generator.cpp:23)
    dep_ok = (dep > 0) & jnp.isfinite(dep) & (dep < dep_thres)
    valid = sel_valid & dep_ok

    z = dep / cam.scaling_factor
    x3 = (xs.astype(jnp.float32) - cam.cx) * z / cam.fx
    y3 = (ys.astype(jnp.float32) - cam.cy) * z / cam.fy
    positions = jnp.stack([x3, y3, z], axis=-1)

    dx0 = pyr[0][1].reshape(-1)[idx]
    dy0 = pyr[0][2].reshape(-1)[idx]
    if feature_type == 0:
        hsv = image_mod.rgb_to_hsv_cv(rgb).reshape(-1, 3)[idx]
        feats = jnp.stack(
            [
                hsv[:, 0] / 180.0,
                hsv[:, 1] / 255.0,
                hsv[:, 2] / 255.0,
                dx0 / 255.0 * 2.0,
                dy0 / 255.0 * 2.0,
            ],
            axis=-1,
        )
    else:
        c = rgb.reshape(-1, 3)[idx]
        feats = jnp.stack([c[:, 0], c[:, 1], c[:, 2], dx0, dy0], axis=-1)

    vf = valid.astype(jnp.float32)
    cap = round_up(num_want)
    pad = cap - num_want
    positions = jnp.pad(positions * vf[:, None], ((0, pad), (0, 0)))
    feats = jnp.pad(feats * vf[:, None], ((0, pad), (0, 0)))
    mask = jnp.pad(vf, (0, pad))
    return PointCloud(positions, feats, mask)


@functools.lru_cache(maxsize=None)
def make_frontend(camera_key, num_want=3000, feature_type=1,
                  dep_thres=20000.0, pot=3, bgr_quirk=False):
    """Build a jitted frame processor for a camera/config.

    num_want=3000, dep_thres=20000 match pcd_generator.cpp:22-23.
    bgr_quirk=True reproduces the reference's BGR-as-RGB color
    convention for bit-parity runs (see `_process`).
    """
    cam = get_camera(camera_key)
    fn = functools.partial(
        _process,
        cam=cam,
        num_want=num_want,
        feature_type=feature_type,
        dep_thres=dep_thres,
        pot=pot,
        bgr_quirk=bgr_quirk,
    )
    return jax.jit(fn)


def process_frame(rgb, depth, camera_key, num_want=3000, feature_type=1,
                  bgr_quirk=False):
    """Convenience one-shot API (compiles per image shape)."""
    fn = make_frontend(camera_key, num_want, feature_type,
                       bgr_quirk=bgr_quirk)
    return fn(jnp.asarray(rgb, jnp.float32), jnp.asarray(depth, jnp.float32))
