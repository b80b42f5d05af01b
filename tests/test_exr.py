"""EXR codec (film/exr.py): compressed read/write vs the reference's
bitmap.cpp EXR engine.  The PIZ case reads the reference's own fixture
(data/tests/envmap.exr — PIZ, HALF), which round 1 could not load."""
import os

import numpy as np
import pytest

from mitsuba_path_guiding_tpu.film.exr import (
    read_exr,
    read_exr_rgb,
    write_exr,
)

ENVMAP = "/root/reference/data/tests/envmap.exr"


def _img(rs, h=48, w=80):
    base = rs.random((h, w, 3)).astype(np.float32)
    base[:, :10] = 0.25  # constant runs exercise predictor + RLE-ish paths
    base[5:9] = 0.0
    return base * 4.0


def test_zip_roundtrip_float():
    rs = np.random.default_rng(0)
    img = _img(rs)
    write_exr("/tmp/_t_zip.exr", img, compression="zip", half=False)
    out = read_exr_rgb("/tmp/_t_zip.exr")
    np.testing.assert_array_equal(out, img)


def test_zips_roundtrip_half():
    rs = np.random.default_rng(1)
    img = _img(rs, 33, 65)  # odd sizes
    write_exr("/tmp/_t_zips.exr", img, compression="zips", half=True)
    out = read_exr_rgb("/tmp/_t_zips.exr")
    np.testing.assert_array_equal(out, np.float32(np.float16(img)))


def test_none_roundtrip():
    rs = np.random.default_rng(2)
    img = _img(rs, 17, 31)
    write_exr("/tmp/_t_none.exr", img, compression="none", half=False)
    out = read_exr_rgb("/tmp/_t_none.exr")
    np.testing.assert_array_equal(out, img)


def test_multichannel():
    rs = np.random.default_rng(3)
    ch = {
        "R": rs.random((20, 30)).astype(np.float32),
        "G": rs.random((20, 30)).astype(np.float32),
        "B": rs.random((20, 30)).astype(np.float32),
        "albedo.X": rs.random((20, 30)).astype(np.float32),
        "depth.Z": rs.random((20, 30)).astype(np.float32) * 100,
    }
    write_exr("/tmp/_t_mc.exr", ch, compression="zip", half=False)
    out, attrs = read_exr("/tmp/_t_mc.exr")
    assert sorted(out) == sorted(ch)
    for name in ch:
        np.testing.assert_array_equal(out[name], ch[name])


@pytest.mark.skipif(not os.path.exists(ENVMAP), reason="reference fixture absent")
def test_piz_reference_fixture():
    """Decode the reference's PIZ/HALF envmap fixture and check the
    statistical signature of a real HDR probe (finite, positive, smooth,
    high dynamic range) — garbage from a codec bug fails all of these."""
    img = read_exr_rgb(ENVMAP)
    assert img.shape == (256, 512, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert 5.0 < img.max() < 1e4  # HDR highlights present
    # adjacent-pixel correlation: natural images are smooth
    dx = np.abs(np.diff(img, axis=1)).mean()
    assert dx < 0.5 * img.mean()


@pytest.mark.skipif(not os.path.exists(ENVMAP), reason="reference fixture absent")
def test_piz_reencode_roundtrip():
    img = read_exr_rgb(ENVMAP)
    write_exr("/tmp/_t_piz_rt.exr", img, compression="zip", half=True)
    out = read_exr_rgb("/tmp/_t_piz_rt.exr")
    # source was HALF so a half-precision roundtrip is exact
    np.testing.assert_array_equal(out, np.float32(np.float16(img)))
