"""Native loader tests: PNG decode parity with PIL, prefetch ordering."""

import numpy as np
import pytest
from PIL import Image

from cvo_rgbd_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_decode_rgb8_matches_pil(lib, tmp_path, rng):
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(img).save(p)
    out = native.decode_png(str(p))
    np.testing.assert_array_equal(out, img)


def test_decode_gray16_matches_pil(lib, tmp_path, rng):
    img = rng.integers(0, 65536, (41, 29)).astype(np.uint16)
    p = tmp_path / "d.png"
    Image.fromarray(img).save(p)
    out = native.decode_png(str(p))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_decode_large_textured(lib, tmp_path, rng):
    """Exercise all PNG filter types via a realistic textured image."""
    yy, xx = np.mgrid[0:480, 0:640]
    img = np.stack([
        (127 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0)),
        (xx * 255 / 640),
        (yy * 255 / 480),
    ], axis=-1).astype(np.uint8)
    p = tmp_path / "big.png"
    Image.fromarray(img).save(p, optimize=True)
    out = native.decode_png(str(p))
    np.testing.assert_array_equal(out, img)


def test_prefetch_loader_order_and_content(lib, tmp_path, rng):
    n = 12
    rgbs, deps, rpaths, dpaths = [], [], [], []
    for i in range(n):
        rgb = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        dep = rng.integers(0, 60000, (24, 32)).astype(np.uint16)
        rp = tmp_path / f"r{i}.png"
        dp = tmp_path / f"d{i}.png"
        Image.fromarray(rgb).save(rp)
        Image.fromarray(dep).save(dp)
        rgbs.append(rgb)
        deps.append(dep)
        rpaths.append(str(rp))
        dpaths.append(str(dp))

    loader = native.PrefetchLoader(rpaths, dpaths, 32, 24, workers=3, ahead=4)
    got = 0
    for idx, rgb, dep in loader:
        assert idx == got
        np.testing.assert_array_equal(rgb, rgbs[idx])
        np.testing.assert_array_equal(dep, deps[idx])
        got += 1
    assert got == n
    loader.close()


def test_loader_missing_file(lib, tmp_path, rng):
    rgb = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    dep = rng.integers(0, 100, (8, 8)).astype(np.uint16)
    rp = tmp_path / "r.png"
    dp = tmp_path / "d.png"
    Image.fromarray(rgb).save(rp)
    Image.fromarray(dep).save(dp)
    loader = native.PrefetchLoader(
        [str(rp), str(tmp_path / "missing.png")],
        [str(dp), str(dp)], 8, 8, workers=1,
    )
    idx, _, _ = loader.next()
    assert idx == 0
    with pytest.raises(IOError):
        loader.next()
    loader.close()
