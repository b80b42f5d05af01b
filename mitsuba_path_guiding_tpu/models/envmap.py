"""Lat-long environment map: build, evaluate, importance-sample.

Counterpart of /root/reference/src/emitters/envmap.cpp (importance-sampled
lat-long with hierarchical warping): here the 2D luminance distribution is
tabulated as a marginal row CDF + per-row conditional CDFs (equivalent
sampling quality; searchsorted instead of hierarchical descent — two
sorted lookups per sample, batched).

Direction convention (y-up, matching scene/transforms.look_at):
  v = theta/pi with theta measured from +y,
  u = 0.5 + atan2(d.x, -d.z) / 2pi.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import safe_sqrt
from mitsuba_path_guiding_tpu.core.spectrum import LUM_WEIGHTS


def build_env_tables(image: np.ndarray, scale: float = 1.0):
    """(He,We,3) -> dict of jnp tables for Emitters.env_* fields.

    env_pdf_tex[r,c] is the solid-angle pdf of sampling a direction inside
    texel (r,c) *given the env emitter was picked* (the emitter-pick pmf is
    multiplied in at sampling/MIS time)."""
    img = np.asarray(image, dtype=np.float32) * scale
    he, we = img.shape[0], img.shape[1]
    lum = img @ np.asarray(LUM_WEIGHTS)
    theta = (np.arange(he) + 0.5) / he * np.pi
    sin_t = np.sin(theta)
    w = lum * sin_t[:, None] + 1e-12           # row-area-weighted luminance
    row_w = w.sum(axis=1)
    cdf_rows = np.cumsum(row_w) / row_w.sum()
    cdf_cols = np.cumsum(w, axis=1) / w.sum(axis=1, keepdims=True)
    # texel probability -> pointwise solid-angle pdf factor: sampling is
    # uv-uniform inside a texel, so pdf(w) = P_texel * He*We / (2 pi^2
    # sin(theta(w))); env_pdf_tex stores the direction-independent part and
    # the 1/sin(theta) is applied at the exact direction in env_pdf_dir
    p_texel = w / w.sum()
    pdf_tex = p_texel * (he * we) / (2.0 * np.pi * np.pi)
    return {
        "env_image": jnp.asarray(img),
        "env_cdf_rows": jnp.asarray(cdf_rows.astype(np.float32)),
        "env_cdf_cols": jnp.asarray(cdf_cols.astype(np.float32)),
        "env_pdf_tex": jnp.asarray(pdf_tex.astype(np.float32)),
    }


def constant_env_tables(radiance):
    return build_env_tables(np.asarray(radiance, np.float32).reshape(1, 1, 3))


def dir_to_uv(d: jnp.ndarray):
    """(N,3) direction -> (u, v) in [0,1)."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 0], -d[..., 2])
    u = phi / (2.0 * jnp.pi) + 0.5
    v = theta / jnp.pi
    return jnp.mod(u, 1.0), jnp.clip(v, 0.0, 1.0 - 1e-7)


def uv_to_dir(u: jnp.ndarray, v: jnp.ndarray):
    theta = v * jnp.pi
    phi = (u - 0.5) * 2.0 * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack(
        [st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)], axis=-1
    )


def env_eval(em, d: jnp.ndarray) -> jnp.ndarray:
    """Radiance for escaped rays (nearest-texel lookup; (1,1) = constant)."""
    he, we = em.env_image.shape[0], em.env_image.shape[1]
    u, v = dir_to_uv(d)
    r = jnp.clip((v * he).astype(jnp.int32), 0, he - 1)
    c = jnp.clip((u * we).astype(jnp.int32), 0, we - 1)
    return em.env_image[r, c]


def env_pdf_dir(em, d: jnp.ndarray) -> jnp.ndarray:
    """Pointwise solid-angle NEE pdf for direction d (given env picked;
    the emitter-pick pmf is folded in by the caller)."""
    he, we = em.env_pdf_tex.shape
    u, v = dir_to_uv(d)
    r = jnp.clip((v * he).astype(jnp.int32), 0, he - 1)
    c = jnp.clip((u * we).astype(jnp.int32), 0, we - 1)
    sin_t = jnp.maximum(safe_sqrt(1.0 - d[..., 1] * d[..., 1]), 1e-5)
    return em.env_pdf_tex[r, c] / sin_t


def env_sample(em, u2: jnp.ndarray):
    """Importance-sample a direction; returns (d, pdf_solid_angle, radiance).

    Both searchsorted lookups are batched (the conditional needs one
    (N, We) row gather); the CDF residual is remapped to a continuous
    within-texel offset (reference envmap warping is likewise continuous).
    """
    he, we = em.env_pdf_tex.shape
    r = jnp.clip(
        jnp.searchsorted(em.env_cdf_rows, u2[..., 0], side="right"), 0, he - 1
    ).astype(jnp.int32)
    row_lo = jnp.where(r > 0, em.env_cdf_rows[jnp.maximum(r - 1, 0)], 0.0)
    row_hi = em.env_cdf_rows[r]
    fr = jnp.clip((u2[..., 0] - row_lo) / jnp.maximum(row_hi - row_lo, 1e-12), 0.0, 1.0)

    rows = em.env_cdf_cols[r]  # (N, We)
    c = jnp.clip(jax_vmap_searchsorted(rows, u2[..., 1]), 0, we - 1).astype(jnp.int32)
    n_ar = jnp.arange(c.shape[0])
    col_lo = jnp.where(c > 0, rows[n_ar, jnp.maximum(c - 1, 0)], 0.0)
    col_hi = rows[n_ar, c]
    fc = jnp.clip((u2[..., 1] - col_lo) / jnp.maximum(col_hi - col_lo, 1e-12), 0.0, 1.0)

    uu = (c.astype(jnp.float32) + fc) / we
    vv = (r.astype(jnp.float32) + fr) / he
    d = uv_to_dir(uu, vv)
    sin_t = jnp.maximum(jnp.sin(vv * jnp.pi), 1e-5)
    return d, em.env_pdf_tex[r, c] / sin_t, em.env_image[r, c]


def jax_vmap_searchsorted(rows: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Per-row searchsorted: rows (N, W) sorted, vals (N,) -> (N,) index."""
    return jnp.sum((rows < vals[..., None]).astype(jnp.int32), axis=-1)
