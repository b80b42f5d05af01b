"""Feature-guided denoiser: edge-avoiding a-trous wavelet filtering.

The TPU-native counterpart of the fork's OIDN wrapper
(/root/reference/include/mitsuba/render/denoiser.h:10-48, denoiser.cpp):
same interface shape — color + albedo + normal (+depth) feature buffers in,
denoised image out — but implemented as an edge-avoiding a-trous wavelet
filter (Dammertz et al. 2010, the SVGF spatial core): a handful of 5x5
dilated convolutions with bilateral weights from the feature buffers.
Pure jnp stencil ops (rolls), jit-friendly, differentiable.

The fork's auxiliary prefiltering (``cleanAux``, denoiser.cpp:38-58) maps
to ``prefilter_features``; buffer save/load parity lives in
utils/checkpoint.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 5-tap B3 spline kernel (separable) — plain floats: jnp constants would
# turn into tracers inside the jitted filter
_K1D = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]


def _shift2d(x, dy, dx):
    """Zero-padded 2D shift of (H, W, C) or (H, W)."""
    out = jnp.roll(x, (dy, dx), axis=(0, 1))
    h, w = x.shape[0], x.shape[1]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = (
        (ys - dy >= 0) & (ys - dy < h) & (xs - dx >= 0) & (xs - dx < w)
    )
    if x.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, 0.0), valid.astype(jnp.float32)


@jax.jit
def firefly_suppress(color: jnp.ndarray, k: float = 4.0) -> jnp.ndarray:
    """Clamp outlier pixels to k x their 3x3-neighborhood mean (excluding
    self).  The OIDN 'RT' filter is robust to HDR outliers internally
    (denoiser.cpp feeds it raw HDR); the a-trous core is not, and a few
    firefly pixels otherwise carry ~95% of the MSE (measured)."""
    s = jnp.zeros_like(color)
    w = 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sh, valid = _shift2d(color, dy, dx)
            s = s + sh
            w = w + valid
    nb_mean = s / jnp.maximum(w, 1.0)
    lum = color.sum(-1, keepdims=True)
    nb_lum = nb_mean.sum(-1, keepdims=True)
    scale = jnp.where(lum > k * nb_lum + 1e-6, (k * nb_lum + 1e-6) / jnp.maximum(lum, 1e-12), 1.0)
    return color * scale


@partial(jax.jit, static_argnames=("iterations",))
def denoise_hdr(color, albedo, normal, depth, iterations: int = 3,
                sigma_color: float = 1.0, **kw):
    """Full denoising pipeline: firefly suppression + log-domain a-trous
    (the tone-compressed domain OIDN's HDR mode filters in)."""
    c = firefly_suppress(color)
    logc = jnp.log1p(c)
    out = atrous_denoise(logc, albedo, normal, depth,
                         iterations=iterations, sigma_color=sigma_color, **kw)
    return jnp.expm1(out)


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(
    color: jnp.ndarray,
    albedo: jnp.ndarray,
    normal: jnp.ndarray,
    depth: jnp.ndarray,
    iterations: int = 4,
    sigma_color: float = 0.45,
    sigma_albedo: float = 0.15,
    sigma_normal: float = 16.0,
    sigma_depth: float = 0.35,
) -> jnp.ndarray:
    """Denoise (H,W,3) radiance using feature buffers."""
    c = color
    zext = jnp.maximum(depth.max() - depth.min(), 1e-6)
    zn = depth / zext
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(c)
        wacc = jnp.zeros(c.shape[:2] + (1,))
        for iy in range(-2, 3):
            for ix in range(-2, 3):
                h = float(_K1D[iy + 2] * _K1D[ix + 2])
                dy, dx = iy * step, ix * step
                cq, vq = _shift2d(c, dy, dx)
                aq, _ = _shift2d(albedo, dy, dx)
                nq, _ = _shift2d(normal, dy, dx)
                zq, _ = _shift2d(zn, dy, dx)
                vq1 = vq if vq.ndim == 3 else vq[..., None]

                dc = jnp.sum((c - cq) ** 2, axis=-1, keepdims=True)
                w_c = jnp.exp(-dc / (sigma_color * sigma_color * (step**0.5)))
                da = jnp.sum((albedo - aq) ** 2, axis=-1, keepdims=True)
                w_a = jnp.exp(-da / (sigma_albedo * sigma_albedo))
                ndot = jnp.clip(jnp.sum(normal * nq, axis=-1, keepdims=True), 0.0, 1.0)
                w_n = ndot**sigma_normal
                dz = jnp.abs(zn - zq)[..., None]
                w_z = jnp.exp(-dz / sigma_depth)

                w = h * w_c * w_a * w_n * w_z * vq1
                acc = acc + cq * w
                wacc = wacc + w
        c = acc / jnp.maximum(wacc, 1e-8)
    return c


def prefilter_features(albedo, normal, depth, iterations: int = 2):
    """Light cross-filtering of noisy feature buffers (fork cleanAux)."""
    a = atrous_denoise(albedo, albedo, normal, depth, iterations=iterations)
    n = atrous_denoise(normal, albedo, normal, depth, iterations=iterations)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    return a, n


def render_aovs(renderer, spp: int = 4):
    """Averaged albedo / normal / depth feature buffers from the renderer
    (the fork Denoiser's add() accumulation, denoiser.h:20)."""
    import jax.numpy as jnp

    r = renderer.cfg.render
    n_pix = r.width * r.height
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    alb = jnp.zeros((n_pix, 3))
    nrm = jnp.zeros((n_pix, 3))
    dep = jnp.zeros((n_pix,))
    for s in range(spp):
        sidx = jnp.full_like(pix, renderer.sample_counter + s)
        _, _, aux, _ = renderer._wave(pix, sidx, train=False)
        alb = alb + aux.albedo
        nrm = nrm + aux.normal
        dep = dep + aux.depth_t
    alb = alb / spp
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
    dep = dep / spp
    return {
        "albedo": alb.reshape(r.height, r.width, 3),
        "normal": nrm.reshape(r.height, r.width, 3),
        "depth": dep.reshape(r.height, r.width, 1),
    }


def denoise_with_aux(renderer, img_np: np.ndarray):
    """CLI helper: render AOVs and run the denoiser on a finished image.
    Prefers the trained neural cascade (film/neural_denoise.py — the
    OIDN-class stage, denoiser.cpp:38-58) and falls back to the a-trous
    filter when no weights are checked in."""
    from mitsuba_path_guiding_tpu.film.neural_denoise import denoise_neural

    aovs = render_aovs(renderer)
    out = denoise_neural(
        jnp.asarray(img_np),
        aovs["albedo"],
        aovs["normal"],
        aovs["depth"][..., 0],
    )
    return np.asarray(out), aovs
