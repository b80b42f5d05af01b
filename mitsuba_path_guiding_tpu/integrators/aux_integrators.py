"""Auxiliary integrators: direct illumination, ambient occlusion, field/AOV
extraction, and adaptive sampling.

Counterparts of the reference's utility integrators:
  - direct  -> src/integrators/direct/direct.cpp (MIS direct lighting)
  - ao      -> src/integrators/direct/ao.cpp (cosine-weighted occlusion)
  - field   -> src/integrators/misc/field.cpp:58-105 (position/normal/
               albedo/distance/uv/shapeIndex AOVs feeding the denoiser)
  - adaptive-> src/integrators/misc/adaptive.cpp:72-90 (per-pixel
               statistical stopping; here a variance-driven sample budget
               reallocation pass)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, occluded_brute
from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.math import Frame, dot, normalize
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.core.warp import square_to_cosine_hemisphere
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render_wave
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.types import SceneData
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t


def render_direct(scene: SceneData, cfg: RenderConfig):
    """Direct illumination (emitter hits + one NEE vertex): the reference's
    ``direct`` plugin == a depth-1 path trace with MIS."""
    from mitsuba_path_guiding_tpu.integrators.render import render

    return render(scene, cfg._replace(max_depth=1))


def render_ao(scene: SceneData, cfg: RenderConfig, ray_length: float = 0.0):
    """Cosine-weighted ambient occlusion (reference ao.cpp: shadingSamples
    over the hemisphere, optional maximum ray length)."""
    if ray_length <= 0.0:
        ext = scene.aabb_max - scene.aabb_min
        ray_length = float(jnp.linalg.norm(ext)) * 0.5

    n_pix = cfg.width * cfg.height
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    key = rng.base_key(cfg.seed)
    acc = jnp.zeros((n_pix,))
    for s in range(cfg.spp):
        rkeys = rng.ray_keys(key, pix, jnp.full_like(pix, s))
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, cfg.width, cfg.height, pix, u_cam)
        hit = intersect_brute(scene.geo, o, d)
        t_hit = jnp.where(hit.valid, hit.t, 1.0)
        p = o + t_hit[..., None] * d
        prim = jnp.maximum(hit.prim, 0)
        row = gather_rows_t(scene.geo.shade_packed, prim)
        ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
        ng = jnp.where(dot(ng, -d)[..., None] < 0.0, -ng, ng)
        u = rng.bounce_uniform(rkeys, 0, 2)
        wo_local = square_to_cosine_hemisphere(u)
        wo = Frame.from_normal(ng).to_world(wo_local)
        occ = occluded_brute(
            scene.geo, p + ng * 1e-4, wo, jnp.full((n_pix,), ray_length)
        )
        vis = jnp.where(hit.valid, 1.0 - occ.astype(jnp.float32), 0.0)
        acc = acc + vis
    img = (acc / cfg.spp).reshape(cfg.height, cfg.width)
    return jnp.repeat(img[..., None], 3, axis=-1)


def render_field(scene: SceneData, cfg: RenderConfig, field: str = "position"):
    """AOV extraction (reference field.cpp fields): position, distance,
    geo_normal, sh_normal, uv, albedo, prim_index."""
    n_pix = cfg.width * cfg.height
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    key = rng.base_key(cfg.seed)
    rkeys = rng.ray_keys(key, pix, jnp.zeros_like(pix))
    u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2) * 0.0 + 0.5  # pixel centers
    o, d, _ = generate_rays(scene.sensor, cfg.width, cfg.height, pix, u_cam)
    hit = intersect_brute(scene.geo, o, d)
    t_hit = jnp.where(hit.valid, hit.t, 0.0)
    p = o + t_hit[..., None] * d
    prim = jnp.maximum(hit.prim, 0)
    row = gather_rows_t(scene.geo.shade_packed, prim)
    valid3 = hit.valid[..., None]

    if field == "position":
        out = jnp.where(valid3, p, 0.0)
    elif field == "distance":
        out = jnp.repeat(t_hit[..., None], 3, axis=-1)
    elif field == "geo_normal":
        out = jnp.where(valid3, jnp.stack([row[0], row[1], row[2]], -1), 0.0)
    elif field == "sh_normal":
        b0 = 1.0 - hit.u - hit.v
        ns = normalize(
            jnp.stack(
                [
                    b0 * row[3] + hit.u * row[6] + hit.v * row[9],
                    b0 * row[4] + hit.u * row[7] + hit.v * row[10],
                    b0 * row[5] + hit.u * row[8] + hit.v * row[11],
                ],
                axis=-1,
            )
        )
        out = jnp.where(valid3, ns, 0.0)
    elif field == "uv":
        b0 = 1.0 - hit.u - hit.v
        uu = b0 * row[12] + hit.u * row[14] + hit.v * row[16]
        vv = b0 * row[13] + hit.u * row[15] + hit.v * row[17]
        out = jnp.stack([uu, vv, jnp.zeros_like(uu)], axis=-1)
    elif field == "albedo":
        from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod

        mid = row[18].astype(jnp.int32)
        out = jnp.where(valid3, bsdf_mod.albedo(scene.mats, mid), 0.0)
    elif field == "prim_index":
        out = jnp.repeat(hit.prim.astype(jnp.float32)[..., None], 3, axis=-1)
    else:
        raise ValueError(f"unknown field: {field}")
    return out.reshape(cfg.height, cfg.width, 3)


_FIELD_NAMES = (
    "position", "distance", "geo_normal", "sh_normal", "uv", "albedo",
    "prim_index",
)


def render_multichannel(scene: SceneData, cfg: RenderConfig, channels=None):
    """Meta-integrator running several sub-integrators into one named
    channel set (reference misc/multichannel.cpp: N sub-integrators ->
    one multichannel EXR).  ``channels``: list of "path" / "direct" /
    "ao" / any render_field name.  Returns {name: (H, W, 3)}; write with
    film.write_exr_channels (keys become "<name>.R/G/B")."""
    from mitsuba_path_guiding_tpu.integrators.render import render

    channels = list(channels or ["path", "albedo", "sh_normal", "distance"])
    out = {}
    for ch in channels:
        if ch in ("path", "radiance"):
            out[ch] = render(scene, cfg)
        elif ch == "direct":
            out[ch] = render_direct(scene, cfg)
        elif ch == "ao":
            out[ch] = render_ao(scene, cfg)
        elif ch in _FIELD_NAMES:
            out[ch] = render_field(scene, cfg, field=ch)
        else:
            raise ValueError(f"multichannel: unknown sub-integrator {ch}")
    return out


def write_multichannel_exr(path: str, images: dict) -> None:
    """{name: (H, W, 3)} -> one EXR with name.R/name.G/name.B channels
    (the primary "path" group keeps plain R/G/B like hdrfilm)."""
    import numpy as np

    from mitsuba_path_guiding_tpu.film.film import write_exr_channels

    chans = {}
    for name, img in images.items():
        img = np.asarray(img, dtype=np.float32)
        prefix = "" if name in ("path", "radiance") else name + "."
        for i, c in enumerate("RGB"):
            chans[prefix + c] = img[..., i]
    write_exr_channels(path, chans)


def _normal_quantile(p_value: float) -> float:
    """Two-sided standard-normal quantile z with P(|Z| <= z) = 1 - p
    (the reference computes it via boost::math::quantile,
    adaptive.cpp:164-166; erfinv gives the same value in closed form)."""
    import math

    from scipy.special import erfinv as _erfinv  # scipy ships with jax deps

    return float(math.sqrt(2.0) * _erfinv(1.0 - p_value))


def render_adaptive(
    scene: SceneData,
    cfg: RenderConfig,
    base_spp: int = 8,
    max_sample_factor: int = 32,
    max_error: float = 0.05,
    p_value: float = 0.05,
    guide=None,
    guide_state=None,
):
    """Per-pixel statistical stopping (reference adaptive.cpp renderBlock,
    :197-271): keep sampling a pixel until the half-width of its (1-p)
    confidence interval on mean luminance drops below
    ``max_error * max(mean, 0.01 * average_luminance)``, capped at
    ``max_sample_factor * base_spp`` samples.

    Wavefront redesign of the reference's per-pixel while loop: rounds of
    ``base_spp`` batches over the still-active pixel set only, compacted
    host-side and padded to a power of two so every round reuses one of
    O(log n) compiled wave shapes.  Variance uses the same Knuth/Welford
    online recurrence (adaptive.cpp:245-248), vectorized per lane.

    Returns (image, info) with info = {"spp", "ci_width"} as (H, W) maps.
    """
    import numpy as np

    n_pix = cfg.width * cfg.height
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    quantile = _normal_quantile(p_value)

    s1 = jnp.zeros((n_pix, 3))          # RGB sum (the image accumulator)
    mean = jnp.zeros((n_pix,))          # Welford running mean of luminance
    m2 = jnp.zeros((n_pix,))            # Welford sum of squared deviations
    count = jnp.zeros((n_pix,), jnp.int32)

    def batch(idx, w, s1, mean, m2, count, spp_offset):
        """One base_spp batch over the (padded) active set; w masks pads."""
        n0 = count[idx]
        for s in range(base_spp):
            sidx = n0 + jnp.int32(spp_offset + s)
            _, L, _ = render_wave(scene, cfg, idx, sidx, guide, guide_state)
            lum = jnp.sum(L * jnp.asarray([0.212671, 0.715160, 0.072169]), -1)
            s1 = s1.at[idx].add(L * w[:, None])
            cnt = count[idx] + jnp.int32(1)
            mu = mean[idx]
            delta = lum - mu
            mu = mu + delta / cnt
            d2 = m2[idx] + delta * (lum - mu)
            count = count.at[idx].set(jnp.where(w > 0, cnt, count[idx]))
            mean = mean.at[idx].set(jnp.where(w > 0, mu, mean[idx]))
            m2 = m2.at[idx].set(jnp.where(w > 0, d2, m2[idx]))
        return s1, mean, m2, count

    # pilot round over every pixel (doubles as the reference's preprocess
    # average-luminance estimate, adaptive.cpp:140-162)
    s1, mean, m2, count = batch(
        pix, jnp.ones((n_pix,)), s1, mean, m2, count, 0
    )
    avg_lum = float(jnp.mean(mean))

    def ci_width(mean, m2, count):
        var = m2 / jnp.maximum(count - 1, 1)
        return jnp.sqrt(var / jnp.maximum(count, 1)) * quantile

    max_spp = max_sample_factor * base_spp
    while True:
        cw = ci_width(mean, m2, count)
        base = jnp.maximum(mean, 0.01 * avg_lum)
        active = (cw > max_error * base) & (count < max_spp)
        act_np = np.nonzero(np.asarray(active))[0]
        if len(act_np) == 0:
            break
        pad = 1 << max(int(np.ceil(np.log2(len(act_np)))), 5)
        # pad with an OUT-OF-BOUNDS sentinel: scatter updates at n_pix are
        # dropped under jit (never duplicate a real pixel index — duplicate
        # scatter .set() order is undefined), gathers clamp harmlessly
        idx = np.full((pad,), n_pix, np.int32)
        idx[: len(act_np)] = act_np
        w = np.zeros((pad,), np.float32)
        w[: len(act_np)] = 1.0
        s1, mean, m2, count = batch(
            jnp.asarray(idx), jnp.asarray(w), s1, mean, m2, count, 0
        )

    img = s1 / jnp.maximum(count, 1).astype(jnp.float32)[:, None]
    info = {
        "spp": np.asarray(count).reshape(cfg.height, cfg.width),
        "ci_width": np.asarray(ci_width(mean, m2, count)).reshape(
            cfg.height, cfg.width
        ),
    }
    return img.reshape(cfg.height, cfg.width, 3), info