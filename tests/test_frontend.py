"""Frontend tests: color conversion vs cv2, pyramid, selection, backprojection."""

import numpy as np
import pytest

from cvo_rgbd_tpu.frontend import camera, image, pipeline, selector


def synth_rgbd(rng, h=96, w=128):
    """Textured synthetic RGB-D scene: gradient-rich blocks + plane depth."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = (
        127 + 80 * np.sin(xx / 3.0) * np.cos(yy / 5.0)
        + 40 * ((xx // 16 + yy // 16) % 2)
    )
    rgb = np.stack([tex, np.roll(tex, 7, axis=1), 255 - tex], axis=-1)
    rgb = np.clip(rgb + rng.normal(0, 2, (h, w, 3)), 0, 255).astype(np.float32)
    depth = (5000.0 * (1.0 + 0.3 * xx / w + 0.2 * yy / h)).astype(np.float32)
    return rgb, depth


def test_rgb_to_hsv_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    rgb = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    ours = np.asarray(image.rgb_to_hsv_cv(rgb.astype(np.float32)))
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV).astype(np.float32)
    # hue wraps at 180; compare circularly, allow 1-unit rounding
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert np.percentile(dh, 99) <= 1.0
    np.testing.assert_allclose(ours[..., 1], ref[..., 1], atol=1.0)
    np.testing.assert_allclose(ours[..., 2], ref[..., 2], atol=1e-3)


def test_gray_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    ours = np.asarray(image.rgb_to_gray(rgb.astype(np.float32)))
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=1.0)


def test_pyramid_shapes_and_gradients(rng):
    rgb, _ = synth_rgbd(rng)
    gray = np.asarray(image.rgb_to_gray(rgb))
    pyr = image.make_pyramid(gray)
    assert len(pyr) == 3
    assert pyr[0][0].shape == (96, 128)
    assert pyr[1][0].shape == (48, 64)
    assert pyr[2][0].shape == (24, 32)
    # central difference oracle at an interior pixel
    dx = np.asarray(pyr[0][1])
    assert np.isclose(dx[10, 10], 0.5 * (gray[10, 11] - gray[10, 9]), atol=1e-4)
    # downsample is 2x2 mean
    lvl1 = np.asarray(pyr[1][0])
    assert np.isclose(lvl1[3, 4], gray[6:8, 8:10].mean(), atol=1e-3)


def test_selector_distribution(rng):
    rgb, _ = synth_rgbd(rng, h=128, w=160)
    gray = np.asarray(image.rgb_to_gray(rgb))
    pyr = image.make_pyramid(gray)
    num_want = 500
    idx, valid = selector.select_pixels(pyr, num_want)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    assert idx.shape == (num_want,)
    # textured scene: selection fills completely
    assert valid.sum() >= 0.9 * num_want
    # no duplicates among valid selections
    sel = idx[valid]
    assert len(np.unique(sel)) == len(sel)
    # all in-border
    ys, xs = sel // 160, sel % 160
    assert xs.min() >= 4 and xs.max() < 160 - 5
    assert ys.min() >= 4 and ys.max() <= 128 - 4
    # spatially spread: every 32x32 cell of the interior has a point
    occ = np.zeros((4, 5))
    for y, x in zip(ys, xs):
        occ[min(y // 32, 3), min(x // 32, 4)] += 1
    assert (occ > 0).all()


def test_selector_flat_image_refill(rng):
    """Uniform image: no gradients pass the threshold; selection falls
    back to the refill tier and marks slots invalid where nothing
    exists."""
    gray = np.full((96, 128), 100.0, np.float32)
    pyr = image.make_pyramid(gray)
    idx, valid = selector.select_pixels(pyr, 300)
    assert np.asarray(valid).sum() == 0  # zero gradient everywhere


def test_selector_no_weak_texture_padding(rng):
    """Textured quadrant on a near-flat background: the tiers find
    enough pixels (>= num_want/3) to close the refill gate
    (pcd_generator.cpp:135), so weak-texture background pixels are NOT
    padded in — the cloud carries only the tier winners, possibly fewer
    than num_want, exactly like DSO."""
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    gray = np.full((h, w), 100.0, np.float32)
    gray += rng.normal(0, 0.2, (h, w)).astype(np.float32)
    gray[:64, :64] = (127 + 100 * np.sin(xx / 2.0) * np.cos(yy / 3.0))[:64, :64]
    pyr = image.make_pyramid(gray)
    num_want = 1200
    idx, valid = selector.select_pixels(pyr, num_want)
    idx, valid = np.asarray(idx), np.asarray(valid)
    sel = idx[valid]
    assert num_want // 3 <= len(sel) < num_want
    ys, xs = sel // w, sel % w
    # everything comes from the textured quadrant (plus its boundary
    # bleed through the coarse pyramid levels) — no flat-noise pixels
    assert (ys <= 70).all() and (xs <= 70).all()


def test_selector_refill_gate_and_block_distribution(rng):
    """Nearly-flat scene with one step edge: tier winners < num_want/3,
    so the refill gate fires (pcd_generator.cpp:135) and tops up with at
    most ONE pixel per 8x8 block (the reference's per-block Canny scan,
    pcd_generator.cpp:138-161)."""
    h, w = 96, 128
    gray = np.full((h, w), 100.0, np.float32)
    gray += rng.normal(0, 0.05, (h, w)).astype(np.float32)
    gray[:, 64:] += 40.0  # one vertical step edge
    pyr = image.make_pyramid(gray)
    idx, valid = selector.select_pixels(pyr, 300)
    idx, valid = np.asarray(idx), np.asarray(valid)
    sel = idx[valid]
    xs = sel % w
    # tier winners can only live near the edge (the sole gradient
    # source, reach <= ~6 px through the coarse pyramid levels); noise
    # pixels far from it can only have entered through the top-up
    tier = sel[np.abs(xs - 63.5) <= 6]
    refill = sel[np.abs(xs - 63.5) > 6]
    assert len(tier) < 100             # gate condition really held
    assert len(refill) > 0             # ...and the top-up fired
    # block distribution: at most one refill pixel per 8x8 block
    blocks = (refill // w) // 8 * (w // 8) + (refill % w) // 8
    assert len(np.unique(blocks)) == len(blocks)


def test_pipeline_backprojection(rng):
    rgb, depth = synth_rgbd(rng)
    cloud = pipeline.process_frame(rgb, depth, "fr1", num_want=512)
    pos = np.asarray(cloud.positions)
    mask = np.asarray(cloud.mask)
    assert pos.shape == (512, 3)
    n = int(mask.sum())
    assert n > 400
    cam = camera.get_camera("fr1")
    # every valid point reprojects into the image
    valid_pos = pos[mask > 0]
    z = valid_pos[:, 2]
    assert (z > 0).all()
    u = valid_pos[:, 0] / z * cam.fx + cam.cx
    v = valid_pos[:, 1] / z * cam.fy + cam.cy
    assert (u > -1).all() and (u < 128.5).all()
    assert (v > -1).all() and (v < 96.5).all()
    # depth scaling: z = raw/5000 within the raw range
    assert z.min() >= depth.min() / 5000 - 1e-4
    assert z.max() <= depth.max() / 5000 + 1e-4


def test_pipeline_feature_types(rng):
    rgb, depth = synth_rgbd(rng)
    c_rgb = pipeline.process_frame(rgb, depth, "fr1", num_want=256, feature_type=1)
    c_hsv = pipeline.process_frame(rgb, depth, "fr1", num_want=256, feature_type=0)
    f_rgb = np.asarray(c_rgb.features)
    f_hsv = np.asarray(c_hsv.features)
    m = np.asarray(c_rgb.mask) > 0
    # RGB mode: raw 0..255 colors (cvo.cpp feature_type 1)
    assert f_rgb[m][:, :3].max() > 100
    # HSV mode: normalized to ~[0,1] (adaptive feature_type 0)
    assert f_hsv[np.asarray(c_hsv.mask) > 0][:, :3].max() <= 1.43  # H/180 bound
    assert np.isfinite(f_hsv).all()


def test_zero_depth_masked(rng):
    rgb, depth = synth_rgbd(rng)
    depth[:, :64] = 0.0  # left half has no depth
    cloud = pipeline.process_frame(rgb, depth, "fr1", num_want=512)
    pos = np.asarray(cloud.positions)
    mask = np.asarray(cloud.mask) > 0
    cam = camera.get_camera("fr1")
    u = pos[mask][:, 0] / pos[mask][:, 2] * cam.fx + cam.cx
    assert (u >= 63.0).all()  # only right-half pixels survive


def test_bgr_quirk_flag(rng):
    """bgr_quirk=True reproduces the reference's BGR-as-RGB convention
    (pcd_generator.cpp:390-391): identical to processing the
    channel-reversed image, and feature_type 1 emits [b,g,r,dx,dy]."""
    rgb, depth = synth_rgbd(rng)
    quirk = pipeline.process_frame(rgb, depth, "fr1", num_want=256,
                                   bgr_quirk=True)
    flipped = pipeline.process_frame(rgb[..., ::-1].copy(), depth, "fr1",
                                     num_want=256)
    np.testing.assert_array_equal(np.asarray(quirk.features),
                                  np.asarray(flipped.features))
    np.testing.assert_array_equal(np.asarray(quirk.positions),
                                  np.asarray(flipped.positions))
    # same image, default mode: selection differs (gray weights now run
    # on swapped channels) unless the image is channel-symmetric
    plain = pipeline.process_frame(rgb, depth, "fr1", num_want=256)
    m = (np.asarray(quirk.mask) > 0) & (np.asarray(plain.mask) > 0)
    fq, fp = np.asarray(quirk.features)[m], np.asarray(plain.features)[m]
    assert not np.array_equal(fq[:, :3], fp[:, :3])
