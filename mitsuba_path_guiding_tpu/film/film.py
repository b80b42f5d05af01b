"""Film: weighted sample accumulation with reconstruction-filter splatting.

Counterpart of the reference's ImageBlock/Film stack
(/root/reference/include/mitsuba/render/imageblock.h:40-188, film.h:37-94,
src/films/hdrfilm.cpp): per-tile ImageBlocks with border splatting become a
single device-resident (H*W, 4) accumulation array (RGB + filter weight)
updated by scatter-add over pixel ids — the segment-reduction form of
filter splatting (SURVEY.md §7 "hard parts": scatter into the film).

The accumulator is a pytree so it can live sharded across devices and be
psum-merged (the WorkResult merge of BlockedRenderProcess::processResult).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.film.rfilter import get_filter


class Film(NamedTuple):
    rgb_weight: jnp.ndarray  # (H*W, 4): filtered RGB sum + filter weight sum
    width: int
    height: int


def new_film(width: int, height: int) -> Film:
    return Film(
        rgb_weight=jnp.zeros((width * height, 4), dtype=jnp.float32),
        width=width,
        height=height,
    )


@partial(jax.jit, static_argnames=("width", "height", "filter_name"))
def splat(
    rgb_weight: jnp.ndarray,
    film_xy: jnp.ndarray,
    values: jnp.ndarray,
    width: int,
    height: int,
    filter_name: str = "box",
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scatter samples into the accumulator through a reconstruction filter.

    film_xy: (N,2) continuous film position; values: (N,3) radiance.
    Footprint is the (2R)x(2R) integer pixel neighborhood of each sample
    (reference ImageBlock::put loop, imageblock.h:131-188)."""
    fn, radius = get_filter(filter_name)
    n = film_xy.shape[0]
    if sample_weight is None:
        sample_weight = jnp.ones((n,), dtype=jnp.float32)

    if filter_name == "box":
        # box(R=0.5): the only non-zero tap is the containing pixel —
        # a 1-tap scatter instead of the generic 2Rx2R footprint (the
        # generic path scatters 4x the indices, 3/4 with weight 0; the
        # scatter dominated the wave profile at ~30 ms/524k lanes)
        px = jnp.clip(jnp.floor(film_xy[..., 0]).astype(jnp.int32), 0, width - 1)
        py = jnp.clip(jnp.floor(film_xy[..., 1]).astype(jnp.int32), 0, height - 1)
        pid = py * width + px
        upd = jnp.concatenate(
            [values * sample_weight[..., None], sample_weight[..., None]], axis=-1
        )
        return rgb_weight.at[pid].add(upd)

    # center pixel of the footprint
    cx = jnp.floor(film_xy[..., 0] - 0.5).astype(jnp.int32)
    cy = jnp.floor(film_xy[..., 1] - 0.5).astype(jnp.int32)
    taps = 2 * radius  # box(R=1)->2x2? box radius ceil(0.5-eps)=1 -> 2 taps
    taps = max(taps, 1)
    updates = []
    idxs = []
    for oy in range(-radius + 1, radius + 1):
        for ox in range(-radius + 1, radius + 1):
            px = cx + ox
            py = cy + oy
            # filter weight at pixel center (px+0.5, py+0.5)
            wx = fn(px.astype(jnp.float32) + 0.5 - film_xy[..., 0])
            wy = fn(py.astype(jnp.float32) + 0.5 - film_xy[..., 1])
            w = wx * wy * sample_weight
            inside = (px >= 0) & (px < width) & (py >= 0) & (py < height)
            w = jnp.where(inside, w, 0.0)
            pid = jnp.clip(py, 0, height - 1) * width + jnp.clip(px, 0, width - 1)
            upd = jnp.concatenate([values * w[..., None], w[..., None]], axis=-1)
            updates.append(upd)
            idxs.append(pid)
    all_idx = jnp.concatenate(idxs, axis=0)
    all_upd = jnp.concatenate(updates, axis=0)
    return rgb_weight.at[all_idx].add(all_upd)


def splat_box_aligned(
    rgb_weight: jnp.ndarray, values: jnp.ndarray, n_pix: int,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Box-filter splat for pixel-aligned waves: values (S*n_pix, 3) laid
    out as S complete spp-planes (sample i belongs to pixel i % n_pix, the
    ``jnp.tile(arange(n_pix), S)`` convention of the render loops).

    A box-filtered sample lands only in its own pixel, so the scatter-add
    is exactly a reshape + sum over the plane axis — no sort/scatter at
    all (the generic scatter was ~20% of the wave on v5e)."""
    s = values.shape[0] // n_pix
    if sample_weight is None:
        acc = jnp.sum(values.reshape(s, n_pix, 3), axis=0)
        w = jnp.full((n_pix, 1), float(s), dtype=rgb_weight.dtype)
    else:
        acc = jnp.sum(
            (values * sample_weight[..., None]).reshape(s, n_pix, 3), axis=0
        )
        w = jnp.sum(sample_weight.reshape(s, n_pix), axis=0)[..., None]
    return rgb_weight + jnp.concatenate([acc, w], axis=-1)


def develop(film: Film) -> jnp.ndarray:
    """(H, W, 3) image = filtered RGB / filter weight (reference
    hdrfilm.cpp:432 develop)."""
    rgbw = film.rgb_weight
    img = rgbw[..., 0:3] / jnp.maximum(rgbw[..., 3:4], 1e-8)
    return img.reshape(film.height, film.width, 3)


# ---------------------------------------------------------------------------
# output formats (host-side; reference bitmap.cpp / fork cnpy mfilm)
# ---------------------------------------------------------------------------

def write_npy(path: str, img) -> None:
    """NumPy output — the fork's research-pipeline format
    (/root/reference/src/films/mfilm.cpp:25,257 via cnpy)."""
    np.save(path, np.asarray(img))


def write_pfm(path: str, img) -> None:
    """Portable float map (reference bitmap.cpp writePFM)."""
    img = np.asarray(img, dtype=np.float32)
    h, w, c = img.shape
    with open(path, "wb") as f:
        f.write(b"PF\n" if c == 3 else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(img[::-1].tobytes())  # PFM is bottom-up


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        c = 3 if header == b"PF" else 1
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), dtype="<f4" if scale < 0 else ">f4")
        img = data.reshape(h, w, c)[::-1]
    return img


def write_png(path: str, img, gamma_encode: bool = True) -> None:
    """Minimal 8-bit PNG writer (zlib from the stdlib; reference ldrfilm)."""
    import struct
    import zlib

    from mitsuba_path_guiding_tpu.core.spectrum import srgb_encode

    img = np.asarray(img)
    if gamma_encode:
        img = np.asarray(srgb_encode(jnp.asarray(np.clip(img, 0, 1))))
    arr = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(png)


def write_exr_channels(path: str, channels: dict) -> None:
    """ZIP-compressed scanline OpenEXR for arbitrary named FLOAT channels
    (reference hdrfilm multichannel EXR output, bitmap.cpp EXR path —
    the reference writes ZIP by default).  ``channels``: {name: (H, W)}."""
    from mitsuba_path_guiding_tpu.film.exr import write_exr as _write

    _write(
        path,
        {n: np.asarray(v, np.float32) for n, v in channels.items()},
        compression="zip",
        half=False,
    )


def write_exr(path: str, img) -> None:
    """ZIP-compressed scanline OpenEXR (FLOAT RGB) — the reference's
    primary output format (hdrfilm EXR) without external deps."""
    img = np.asarray(img, dtype=np.float32)
    write_exr_channels(
        path, {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}
    )


def write_image(path: str, img) -> None:
    """Dispatch on extension (npy/pfm/png/exr)."""
    low = path.lower()
    if low.endswith(".npy"):
        write_npy(path, img)
    elif low.endswith(".pfm"):
        write_pfm(path, img)
    elif low.endswith(".png"):
        write_png(path, img)
    elif low.endswith(".exr"):
        write_exr(path, img)
    else:
        raise ValueError(f"unknown image extension: {path}")


def splat_raw(acc: jnp.ndarray, film_xy: jnp.ndarray, values: jnp.ndarray,
              width: int, height: int) -> jnp.ndarray:
    """Weightless nearest-pixel scatter-add for adjoint splats (the
    light-image accumulation of ptracer/bdpt — reference bdpt_wr.cpp's
    ImageBlock with a box filter).  acc: (H*W, 3)."""
    px = jnp.clip(jnp.floor(film_xy[..., 0]).astype(jnp.int32), 0, width - 1)
    py = jnp.clip(jnp.floor(film_xy[..., 1]).astype(jnp.int32), 0, height - 1)
    idx = py * width + px
    return acc.at[idx].add(values)
