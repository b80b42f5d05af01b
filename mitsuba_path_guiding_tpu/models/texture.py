"""Bitmap textures: UV-mapped reflectance lookups + procedural patterns.

Counterpart of /root/reference/src/textures/ (bitmap.cpp mipmapped lookups,
checkerboard.cpp, gridtexture.cpp): textures live in one padded atlas array
(NT, TH, TW, 3); shading does a bilinear fetch at the interpolated UV and
overrides the material's reflectance.  Procedural types are rasterized into
the atlas at build time (the TPU-native answer to per-type dispatch).
Mipmapping/EWA (reference mipmap.h) is future work — renders are
supersampled by spp anyway.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def rasterize_procedural(spec: dict, res: int = 256) -> np.ndarray:
    """checkerboard / gridtexture -> image (reference checkerboard.cpp)."""
    t = spec["type"]
    c0 = np.asarray(spec.get("color0", [0.4] * 3), np.float32)
    c1 = np.asarray(spec.get("color1", [0.2] * 3), np.float32)
    uu, vv = np.meshgrid(
        (np.arange(res) + 0.5) / res, (np.arange(res) + 0.5) / res, indexing="xy"
    )
    us = spec.get("uscale", 2.0)
    vs = spec.get("vscale", 2.0)
    if t == "checkerboard":
        mask = ((np.floor(uu * 2 * us) + np.floor(vv * 2 * vs)) % 2).astype(bool)
    elif t == "gridtexture":
        lw = float(spec.get("line_width", 0.01))
        fu = np.mod(uu * us, 1.0)
        fv = np.mod(vv * vs, 1.0)
        mask = (fu < lw) | (fu > 1 - lw) | (fv < lw) | (fv > 1 - lw)
    else:
        raise ValueError(f"unknown procedural texture {t}")
    img = np.where(mask[..., None], c1, c0)
    return img.astype(np.float32)


def build_atlas(images: list[np.ndarray]):
    """Pad textures to a common size -> (atlas (NT,TH,TW,3), sizes (NT,2))."""
    if not images:
        return jnp.zeros((1, 1, 1, 3), jnp.float32), jnp.ones((1, 2), jnp.float32)
    th = max(im.shape[0] for im in images)
    tw = max(im.shape[1] for im in images)
    atlas = np.zeros((len(images), th, tw, 3), dtype=np.float32)
    sizes = np.zeros((len(images), 2), dtype=np.float32)
    for i, im in enumerate(images):
        atlas[i, : im.shape[0], : im.shape[1]] = im[..., :3]
        sizes[i] = (im.shape[0], im.shape[1])
    return jnp.asarray(atlas), jnp.asarray(sizes)


def sample_atlas(atlas: jnp.ndarray, sizes: jnp.ndarray, tid: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear fetch: atlas (NT,TH,TW,3), tid (N,), uv (N,2) -> (N,3).

    UV wraps (repeat mode, the reference bitmap default); v flips so v=0 is
    the bottom of the image (Mitsuba convention)."""
    t = jnp.maximum(tid, 0)
    h = sizes[t, 0]
    w = sizes[t, 1]
    u = jnp.mod(uv[..., 0], 1.0) * w - 0.5
    v = jnp.mod(1.0 - uv[..., 1], 1.0) * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0

    def at(xi, yi):
        xi = jnp.mod(xi, w).astype(jnp.int32)
        yi = jnp.mod(yi, h).astype(jnp.int32)
        return atlas[t, yi, xi]

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    top = c00 * (1 - fx)[..., None] + c10 * fx[..., None]
    bot = c01 * (1 - fx)[..., None] + c11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]
