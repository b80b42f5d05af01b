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


MAX_MIP_LEVELS = 8


def _downsample(im: np.ndarray) -> np.ndarray:
    h, w = im.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    im = im[: h2 * 2, : w2 * 2]
    return 0.25 * (im[0::2, 0::2] + im[1::2, 0::2] + im[0::2, 1::2] + im[1::2, 1::2])


def build_atlas(images: list[np.ndarray]):
    """Pad textures to a common size and bake a box-filtered mip pyramid
    (reference mipmap.h MIPMap construction) -> (atlas (NT, 2*TH, TW, 3),
    sizes (NT, 2)).  Level k of texture t lives at rows
    [2*TH - (2*TH >> k) : ... + (TH >> k)], cols [0 : TW >> k]; level 0
    sits at the origin so plain bilinear lookups are layout-agnostic."""
    if not images:
        return jnp.zeros((1, 2, 1, 3), jnp.float32), jnp.ones((1, 2), jnp.float32)
    th = max(im.shape[0] for im in images)
    tw = max(im.shape[1] for im in images)
    atlas = np.zeros((len(images), 2 * th, tw, 3), dtype=np.float32)
    sizes = np.zeros((len(images), 2), dtype=np.float32)
    for i, im in enumerate(images):
        cur = np.asarray(im[..., :3], dtype=np.float32)
        sizes[i] = (im.shape[0], im.shape[1])
        for k in range(MAX_MIP_LEVELS):
            off = 2 * th - ((2 * th) >> k)
            atlas[i, off : off + cur.shape[0], : cur.shape[1]] = cur
            if cur.shape[0] <= 1 and cur.shape[1] <= 1:
                break
            cur = _downsample(cur)
    return jnp.asarray(atlas), jnp.asarray(sizes)


def _bilinear_level(atlas, sizes, t, uv, level):
    """Bilinear fetch at integer mip level ``level`` (per-lane int32)."""
    th2 = atlas.shape[1]  # == 2 * TH
    off = (th2 - (th2 >> level)).astype(jnp.float32) if hasattr(level, "astype") else float(th2 - (th2 >> level))
    h = jnp.maximum(jnp.floor(sizes[t, 0] / (2.0 ** level)), 1.0)
    w = jnp.maximum(jnp.floor(sizes[t, 1] / (2.0 ** level)), 1.0)
    u = jnp.mod(uv[..., 0], 1.0) * w - 0.5
    v = jnp.mod(1.0 - uv[..., 1], 1.0) * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0

    def at(xi, yi):
        xi = jnp.mod(xi, w).astype(jnp.int32)
        yi = (jnp.mod(yi, h) + off).astype(jnp.int32)
        return atlas[t, yi, xi]

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    top = c00 * (1 - fx)[..., None] + c10 * fx[..., None]
    bot = c01 * (1 - fx)[..., None] + c11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def sample_atlas_nearest(atlas, sizes, tid, uv):
    """Nearest-texel fetch at the base level, same wrap/flip conventions as
    ``sample_atlas``.  Used for DATA textures whose channels must not be
    blended across texel boundaries (the cloth yarn-record map: warp/weft
    bit + spine parameters, models/cloth.py compile_cloth)."""
    t = jnp.maximum(tid, 0)
    h = jnp.maximum(sizes[t, 0], 1.0)
    w = jnp.maximum(sizes[t, 1], 1.0)
    xi = jnp.floor(jnp.mod(uv[..., 0], 1.0) * w)
    yi = jnp.floor(jnp.mod(1.0 - uv[..., 1], 1.0) * h)
    xi = jnp.clip(xi, 0.0, w - 1.0).astype(jnp.int32)
    yi = jnp.clip(yi, 0.0, h - 1.0).astype(jnp.int32)
    return atlas[t, yi, xi]


def sample_atlas(atlas, sizes, tid, uv, lod=None):
    """Texture fetch: atlas (NT, 2*TH, TW, 3), tid (N,), uv (N,2) -> (N,3).

    UV wraps (repeat mode, the reference bitmap default); v flips so v=0 is
    the bottom of the image (Mitsuba convention).  ``lod`` (N,) selects a
    fractional mip level for TRILINEAR filtering (mipmap.h's ETrilinear;
    the ray-cone footprint is computed by the integrator); None = plain
    bilinear at the base level."""
    t = jnp.maximum(tid, 0)
    if lod is None:
        return _bilinear_level(atlas, sizes, t, uv, 0)
    max_l = MAX_MIP_LEVELS - 1
    lod = jnp.clip(lod, 0.0, float(max_l))
    l0 = jnp.floor(lod)
    f = (lod - l0)[..., None]
    th2 = atlas.shape[1]
    # per-lane level offsets need dynamic shifts: compute offsets as float
    def level_fetch(lv):
        off = th2 - jnp.floor(th2 / (2.0 ** lv))
        h = jnp.maximum(jnp.floor(sizes[t, 0] / (2.0 ** lv)), 1.0)
        w = jnp.maximum(jnp.floor(sizes[t, 1] / (2.0 ** lv)), 1.0)
        u = jnp.mod(uv[..., 0], 1.0) * w - 0.5
        v = jnp.mod(1.0 - uv[..., 1], 1.0) * h - 0.5
        x0 = jnp.floor(u)
        y0 = jnp.floor(v)
        fx = (u - x0)[..., None]
        fy = (v - y0)[..., None]

        def at(xi, yi):
            xi = jnp.mod(xi, w).astype(jnp.int32)
            yi = (jnp.mod(yi, h) + off).astype(jnp.int32)
            return atlas[t, yi, xi]

        top = at(x0, y0) * (1 - fx) + at(x0 + 1, y0) * fx
        bot = at(x0, y0 + 1) * (1 - fx) + at(x0 + 1, y0 + 1) * fx
        return top * (1 - fy) + bot * fy

    return level_fetch(l0) * (1 - f) + level_fetch(jnp.minimum(l0 + 1, max_l)) * f


MAX_ANISO = 8.0
EWA_TAPS = 4  # taps in [-EWA_TAPS, EWA_TAPS]^2 at the chosen level


def sample_atlas_ewa(atlas, sizes, tid, uv, duv0, duv1):
    """EWA (elliptical weighted average) anisotropic lookup
    (reference mipmap.h's EEWA mode / Heckbert '89 as in PBRT): ``duv0``/
    ``duv1`` (N, 2) are the screen-footprint axes in UV space.  The minor
    axis picks the mip level; texels of that level inside the ellipse are
    accumulated with Gaussian weights over a static (2*EWA_TAPS+1)^2 tap
    window.  Anisotropy is clamped to MAX_ANISO by widening the minor
    axis (the standard quality/cost clamp)."""
    import jax
    import jax.numpy as jnp

    t = jnp.maximum(tid, 0)
    l0sq = jnp.sum(duv0 * duv0, axis=-1)
    l1sq = jnp.sum(duv1 * duv1, axis=-1)
    swap = l1sq > l0sq
    major = jnp.where(swap[..., None], duv1, duv0)
    minor = jnp.where(swap[..., None], duv0, duv1)
    maj_len = jnp.sqrt(jnp.maximum(l0sq, l1sq))
    min_len = jnp.sqrt(jnp.minimum(l0sq, l1sq))
    # clamp anisotropy: widen minor so major/minor <= MAX_ANISO
    scale_min = jnp.where(
        min_len * MAX_ANISO < maj_len,
        maj_len / (MAX_ANISO * jnp.maximum(min_len, 1e-12)),
        1.0,
    )
    minor = minor * scale_min[..., None]
    min_len = min_len * scale_min

    res = jnp.maximum(sizes[t, 0], sizes[t, 1])
    max_l = MAX_MIP_LEVELS - 1
    # level from the minor axis, raised so the major HALF-axis fits the
    # static tap window (otherwise the ellipse would be truncated)
    need = jnp.maximum(min_len * res, maj_len * res / float(EWA_TAPS))
    lod = jnp.clip(jnp.log2(jnp.maximum(need, 1.0)), 0.0, float(max_l))
    lv = jnp.floor(lod)

    th2 = atlas.shape[1]
    off = th2 - jnp.floor(th2 / (2.0 ** lv))
    h = jnp.maximum(jnp.floor(sizes[t, 0] / (2.0 ** lv)), 1.0)
    w = jnp.maximum(jnp.floor(sizes[t, 1] / (2.0 ** lv)), 1.0)
    # ellipse in texel coordinates of the level
    u_c = jnp.mod(uv[..., 0], 1.0) * w - 0.5
    v_c = jnp.mod(1.0 - uv[..., 1], 1.0) * h - 0.5
    dux, duy = major[..., 0] * w, -major[..., 1] * h
    dvx, dvy = minor[..., 0] * w, -minor[..., 1] * h
    # implicit ellipse coefficients (PBRT EWA): A x^2 + B xy + C y^2 = F
    A = duy * duy + dvy * dvy + 1.0
    B = -2.0 * (dux * duy + dvx * dvy)
    C = dux * dux + dvx * dvx + 1.0
    invF = 1.0 / jnp.maximum(A * C - B * B * 0.25, 1e-12)
    A, B, C = A * invF, B * invF, C * invF

    acc = jnp.zeros(uv.shape[:-1] + (3,))
    wsum = jnp.zeros(uv.shape[:-1])
    x0 = jnp.floor(u_c)
    y0 = jnp.floor(v_c)
    for dy in range(-EWA_TAPS, EWA_TAPS + 1):
        for dx in range(-EWA_TAPS, EWA_TAPS + 1):
            xs = x0 + dx
            ys = y0 + dy
            ex = xs - u_c
            ey = ys - v_c
            r2 = A * ex * ex + B * ex * ey + C * ey * ey
            wgt = jnp.where(r2 < 1.0, jnp.exp(-2.0 * r2) - jnp.exp(-2.0), 0.0)
            xi = jnp.mod(xs, w).astype(jnp.int32)
            yi = (jnp.mod(ys, h) + off).astype(jnp.int32)
            acc = acc + atlas[t, yi, xi] * wgt[..., None]
            wsum = wsum + wgt
    fallback = _bilinear_level(atlas, sizes, t, uv, 0)
    ok = wsum > 1e-8
    return jnp.where(
        ok[..., None], acc / jnp.maximum(wsum, 1e-8)[..., None], fallback
    )
