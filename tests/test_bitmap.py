"""Bitmap format engine round-trips + resampling (reference
src/libcore/bitmap.cpp codecs, rescale.h Resampler)."""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.film import bitmap


@pytest.fixture
def hdr_img():
    rng = np.random.default_rng(7)
    img = rng.random((23, 31, 3)).astype(np.float32) * 4.0  # HDR range
    img[3:6, 4:9] = 0.0  # runs for RLE paths
    img[10, :] = 2.5
    return img


def test_rgbe_roundtrip(tmp_path, hdr_img):
    p = str(tmp_path / "t.hdr")
    bitmap.write_hdr(p, hdr_img)
    back = bitmap.read_hdr(p)
    assert back.shape == hdr_img.shape
    # RGBE: 8-bit mantissa + shared exponent -> ~1% relative error
    denom = np.maximum(hdr_img.max(axis=-1, keepdims=True), 1e-3)
    assert np.abs(back - hdr_img).max() / denom.max() < 0.02


def test_rgbe_flat_scanline_narrow(tmp_path):
    # width < 8 uses flat (non-RLE) scanlines
    img = np.random.default_rng(0).random((5, 4, 3)).astype(np.float32)
    p = str(tmp_path / "n.hdr")
    bitmap.write_hdr(p, img)
    back = bitmap.read_hdr(p)
    assert np.abs(back - img).max() < 0.02


def test_ldr_png_jpeg_tga_bmp_roundtrip(tmp_path, hdr_img):
    img = np.clip(hdr_img / 4.0, 0, 1)
    for ext, tol in [("png", 0.01), ("bmp", 0.01), ("tga", 0.01)]:
        p = str(tmp_path / f"t.{ext}")
        bitmap.save(p, img)
        back = bitmap.load(p)
        assert back.shape == img.shape, ext
        # linear-space comparison after sRGB round-trip
        assert np.abs(back - img).max() < tol, ext
    # JPEG is DCT-lossy on noise: gate the mean error, not the max
    p = str(tmp_path / "t.jpg")
    bitmap.save(p, img)
    back = bitmap.load(p)
    assert back.shape == img.shape
    assert np.abs(back - img).mean() < 0.03


def test_load_save_dispatch_hdr_formats(tmp_path, hdr_img):
    for ext in ("exr", "pfm", "hdr", "npy"):
        p = str(tmp_path / f"t.{ext}")
        bitmap.save(p, hdr_img)
        back = bitmap.load(p)
        tol = 0.02 if ext == "hdr" else 1e-5
        assert np.abs(back - hdr_img).max() < tol, ext


def test_unknown_format_raises(tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        bitmap.load(str(tmp_path / "x.gif"))
    with pytest.raises(ValueError, match="unsupported"):
        bitmap.save(str(tmp_path / "x.gif"), np.zeros((2, 2, 3)))


def test_resample_constant_preserved():
    img = np.full((17, 13, 3), 0.7, np.float32)
    for f in ("box", "tent", "gaussian", "lanczos"):
        out = bitmap.resample(img, 40, 9, rfilter=f)
        assert out.shape == (9, 40, 3)
        # row-stochastic weights: constants are exactly preserved
        assert np.abs(out - 0.7).max() < 1e-5, f


def test_resample_energy_and_gradient():
    # downsample a linear ramp: mean is preserved, shape stays a ramp
    x = np.linspace(0, 1, 64, dtype=np.float32)
    img = np.broadcast_to(x[None, :, None], (64, 64, 1)).copy()
    out = bitmap.resample(img, 16, 16, rfilter="lanczos")
    assert abs(out.mean() - img.mean()) < 1e-3
    d = np.diff(out[8, :, 0])
    assert (d > 0).all()  # monotone ramp survives


def test_resample_upsample_identityish():
    # smooth (band-limited) content survives up-then-down resampling
    y, x = np.mgrid[0:8, 0:8] / 8.0
    img = np.stack([np.sin(2 * np.pi * x), np.cos(2 * np.pi * y), x * y],
                   axis=-1).astype(np.float32) * 0.4 + 0.5
    up = bitmap.resample(img, 32, 32, rfilter="lanczos")
    down = bitmap.resample(up, 8, 8, rfilter="lanczos")
    assert np.abs(down - img).mean() < 0.03


def test_resample_2d_grayscale():
    img = np.random.default_rng(1).random((12, 9)).astype(np.float32)
    out = bitmap.resample(img, 18, 6, rfilter="tent")
    assert out.shape == (6, 18)
    assert (out >= 0).all()


def test_hdr_old_rle_roundtrip(tmp_path):
    """Old-style Radiance RLE ((1,1,1,n) repeat markers) must decode
    correctly (ADVICE r2: flat decode silently corrupted such files)."""
    import struct

    import numpy as np

    from mitsuba_path_guiding_tpu.film.bitmap import read_hdr

    w, h = 16, 2
    # build a constant-color image encoded with old RLE runs
    px = bytes([128, 64, 32, 130])  # some RGBE pixel
    rows = []
    for _ in range(h):
        # first pixel literal, then a run of 15 repeats
        rows.append(px + bytes([1, 1, 1, 15]))
    payload = b"".join(rows)
    hdr = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    p = tmp_path / "old_rle.hdr"
    p.write_bytes(hdr + payload)
    img = read_hdr(str(p))
    assert img.shape == (h, w, 3)
    # every pixel equals the first (run-repeated)
    assert np.allclose(img, img[0, 0]), img[0, :4]
    assert img[0, 0].max() > 0
