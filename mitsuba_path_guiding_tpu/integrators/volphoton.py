"""Volume photon map + beam radiance estimate (point-sampled).

Counterpart of the reference's third photon map and BRE
(/root/reference/src/integrators/photonmapper/photonmapper.cpp:695 volume
map, bre.{h,cpp} beam radiance estimate over a photon-sphere tree).
TPU re-design:

  * ``volume_photon_pass`` — light wavefront with medium free-flight
    sampling (models/medium.py weighted delta tracking; the same tracker
    volpath uses), depositing a VOLUME photon at every medium scattering
    event and continuing by phase sampling.  Photons terminate at
    surfaces (the volume map carries medium transport only; surface maps
    come from integrators/sppm.photon_pass as before).
  * ``beam_estimate`` — the BRE query re-designed for SIMD: instead of a
    sphere-tree walked per ray (bre.cpp), each camera ray draws N_TAPS
    stratified points along its medium segment and performs a sorted-
    uniform-grid ball gather at each (the "points on beams" estimator;
    expectation equals the reference's long-beam x point-photon BRE):
      L = sum_taps  Tr(t_i) * sum_photons phase(wi -> w) P_j K_r / dpdf
    with K_r the 3-D Epanechnikov-free constant kernel 1/(4/3 pi r^3).

The reference gathers photons whose SPHERES overlap the ray; sampling
points along the beam trades a small amount of variance for a fully
regular memory pattern — cells along the segment instead of tree nodes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh
from mitsuba_path_guiding_tpu.core.math import dot, normalize
from mitsuba_path_guiding_tpu.core.rng import bounce_uniform, event_uniform
from mitsuba_path_guiding_tpu.integrators.ptracer import TAG_EMITTER_RAY
from mitsuba_path_guiding_tpu.integrators.sppm import GRID_MAX, _cell_coords, _cell_key
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.models.medium import _track_keys, sample_free_flight
from mitsuba_path_guiding_tpu.models.phase import phase_eval, phase_sample

MAX_CELL_TAPS = 16
TAG_TRACK_PHOTON = 977


@partial(jax.jit, static_argnames=("max_depth", "use_bvh", "em_kinds", "hetero"))
def volume_photon_pass(scene, rkeys, max_depth: int = 8, use_bvh: bool = False,
                       em_kinds=em_mod.ALL_KINDS, hetero: bool = False):
    """Shoot a light wavefront through the medium.  Returns per-bounce
    deposits flattened: (pos (D*M, 3), wdir (D*M, 3) PROPAGATION dir at
    the event, power (D*M, 3), ok (D*M,))."""
    geo, bvh, med = scene.geo, scene.bvh, scene.medium

    def intersect(o_, d_):
        return intersect_bvh(geo, bvh, o_, d_) if use_bvh else intersect_brute(geo, o_, d_)

    u0 = event_uniform(rkeys, TAG_EMITTER_RAY, 5)
    rs = em_mod.sample_ray(
        scene.emitters, scene.aabb_min, scene.aabb_max, u0, kinds=em_kinds
    )
    o0, d0 = rs.o, rs.d
    T0 = jnp.where(rs.valid[..., None], rs.weight, 0.0)

    sigma_t = med.sigma_a + med.sigma_s
    sigma_s = med.sigma_s

    def bounce(carry, depth):
        o, d, T, alive = carry
        u = bounce_uniform(rkeys, depth, 4)
        hit = intersect(o, d)
        t_surf = jnp.where(hit.valid, hit.t, 1e30)
        if hetero:
            tkd = _track_keys(rkeys, depth, TAG_TRACK_PHOTON)
            t_med, is_med_ev, w_ff = sample_free_flight(med, o, d, t_surf, tkd)
        else:
            # closed-form spectral free flight with the mean-extinction
            # sampling density (homogeneous.cpp sampleDistance)
            sbar = jnp.maximum(jnp.mean(sigma_t), 1e-12)
            t_med = -jnp.log(jnp.maximum(1.0 - u[..., 2], 1e-12)) / sbar
            is_med_ev = t_med < t_surf
            tt = jnp.minimum(t_med, t_surf)[..., None]
            tr_rgb = jnp.exp(-sigma_t[None, :] * tt)
            w_ev = sigma_s[None, :] * tr_rgb / (sbar * jnp.exp(-sbar * tt))
            w_pass = tr_rgb / jnp.exp(-sbar * tt)
            w_ff = jnp.where(is_med_ev[..., None], w_ev, w_pass)
        is_medium = alive & is_med_ev
        T = T * w_ff  # sigma_s/(maj p) on events; null ratios on passes

        p = o + t_med[..., None] * d
        out = (p, d, T, is_medium)

        # continue by phase sampling from medium events; photons that
        # reach a surface or escape terminate (volume map only)
        wo, _pdf = phase_sample(-d, med.phase_g, u[..., 0:2])
        o2 = p
        alive2 = is_medium
        return (o2, wo, T, alive2), out

    init = (o0, d0, T0, rs.valid)
    _, deps = jax.lax.scan(bounce, init, jnp.arange(max_depth))
    pos = deps[0].reshape(-1, 3)
    wdir = deps[1].reshape(-1, 3)
    pw = deps[2].reshape(-1, 3)
    ok = deps[3].reshape(-1)
    return pos, wdir, pw, ok


def build_vol_grid(scene, r: float):
    """Sorted-grid parameters sized so an r-ball fits a 2^3 neighborhood."""
    lo = scene.aabb_min
    extent = float(jnp.max(scene.aabb_max - scene.aabb_min))
    cell = 2.0 * r
    g = min(int(np.ceil(extent / cell)) + 1, GRID_MAX)
    inv_cell = 1.0 / cell
    return lo, inv_cell, g


@partial(jax.jit, static_argnames=("g", "n_taps", "n_emitted"))
def beam_estimate(scene, o, d, t_seg, taps_u, ph_pos, ph_dir, ph_pw, ph_ok,
                  lo, inv_cell, g, r, n_emitted, n_taps: int = 16):
    """In-scattered radiance along each camera segment [0, t_seg].

    ``taps_u``: (n_taps, N) stratified uniforms for tap placement.
    Homogeneous-medium transmittance weighting; returns (N, 3)."""
    med = scene.medium
    sigma_t = med.sigma_a + med.sigma_s
    n = o.shape[0]

    key_ph = jnp.where(
        ph_ok, _cell_key(_cell_coords(ph_pos, lo, inv_cell, g), g), jnp.int32(2**30)
    )
    perm = jax.random.permutation(jax.random.PRNGKey(23), key_ph.shape[0])
    key_ph = key_ph[perm]
    sp_pos = ph_pos[perm]
    sp_dir = ph_dir[perm]
    sp_pw = ph_pw[perm]
    order = jnp.argsort(key_ph)
    skeys = key_ph[order]
    sp_pos = sp_pos[order]
    sp_dir = sp_dir[order]
    sp_pw = sp_pw[order]
    m_total = skeys.shape[0]

    kernel = 1.0 / (4.0 / 3.0 * jnp.pi * r**3)
    r2 = r * r
    L = jnp.zeros((n, 3))
    dt = t_seg / n_taps

    for it in range(n_taps):
        t_i = (it + taps_u[it]) * dt
        x = o + t_i[..., None] * d
        tr = jnp.exp(-sigma_t[None, :] * t_i[..., None])
        base = jnp.floor((x - lo) * inv_cell - 0.5).astype(jnp.int32)
        acc = jnp.zeros((n, 3))
        seen = []
        for ox in (0, 1):
            for oy in (0, 1):
                for oz in (0, 1):
                    c = jnp.clip(base + jnp.asarray([ox, oy, oz]), 0, g - 1)
                    key = _cell_key(c, g)
                    dup = jnp.zeros(key.shape, bool)
                    for prev in seen:
                        dup = dup | (key == prev)
                    seen.append(key)
                    key = jnp.where(dup, jnp.int32(-1), key)
                    start = jnp.searchsorted(skeys, key, side="left")
                    end = jnp.searchsorted(skeys, key, side="right")
                    cell_n = (end - start).astype(jnp.float32)
                    scale = jnp.maximum(cell_n / MAX_CELL_TAPS, 1.0)
                    for j in range(MAX_CELL_TAPS):
                        idx = jnp.minimum(start + j, m_total - 1)
                        okk = (start + j < end) & (start + j < m_total)
                        dp = sp_pos[idx] - x
                        d2 = jnp.sum(dp * dp, axis=-1)
                        sel = okk & (d2 <= r2)
                        ph = phase_eval(-sp_dir[idx], -d, med.phase_g)
                        w = jnp.where(sel, scale * ph, 0.0)
                        acc = acc + w[..., None] * sp_pw[idx]
        L = L + tr * acc * (kernel * dt[..., None])
    return L / n_emitted
