"""Classic photon mapping with final gather (Jensen 1996).

TPU-native counterpart of the reference's photonmapper plugin
(/root/reference/src/integrators/photonmapper/photonmapper.cpp:695 — the
3-map global/caustic/volume estimator with one-bounce final gather).
Re-design: both maps live in the SAME sorted-grid structure the SPPM
integrator uses (integrators/sppm.py gather — segment scans instead of kNN
trees); the caustic map is the subset of deposits flagged all-specular by
photon_pass.  The volume map is not built (media render through volpath;
PARITY.md).

Estimator split per camera hitpoint x (first non-delta vertex):
  L(x) = Le(chain) + L_direct(NEE) + L_caustic(caustic-map density)
       + L_indirect(final gather: cosine rays -> global-map density at y)
Gather rays that escape to the environment or hit an emitter contribute
nothing (both are direct lighting at x, already counted by NEE), matching
the reference's gather-query radiance mask.  Gather surfaces evaluate the
diffuse lobe (albedo/pi) like the SPPM gather — glossy gather: PARITY.md.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh, occluded
from mitsuba_path_guiding_tpu.core.math import Frame, dot, normalize
from mitsuba_path_guiding_tpu.core.rng import bounce_uniform, event_uniform
from mitsuba_path_guiding_tpu.core.warp import square_to_cosine_hemisphere
from mitsuba_path_guiding_tpu.integrators.path import INFD, _offset_ray
from mitsuba_path_guiding_tpu.integrators.sppm import (
    GRID_MAX,
    camera_pass,
    gather,
    photon_pass,
)
from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t
from mitsuba_path_guiding_tpu.scene.types import SceneData


@partial(
    jax.jit,
    static_argnames=("use_bvh", "em_kinds", "mat_types", "G", "n_emitted"),
)
def _shade_pass(
    scene, rkeys, hp_pos, hp_ns, hp_alb, hp_T, hp_valid,
    gl_pos, gl_wi, gl_pw, gl_ok, ca_ok,
    lo, inv_cell, G, r_global, r_caustic, n_emitted,
    use_bvh=False, em_kinds=em_mod.ALL_KINDS, mat_types=bsdf_mod.ALL_TYPES,
):
    geo, bvh, mats, em = scene.geo, scene.bvh, scene.mats, scene.emitters
    n = hp_pos.shape[0]

    def intersect(o_, d_):
        return intersect_bvh(geo, bvh, o_, d_) if use_bvh else intersect_brute(geo, o_, d_)

    # --- direct lighting at x by NEE (diffuse lobe)
    u_nee = event_uniform(rkeys, 11 << 20, 3)
    ds = em_mod.sample_direct_jit(em, geo, hp_pos, u_nee, kinds=em_kinds)
    cos_x = jnp.maximum(dot(hp_ns, ds.direction), 0.0)
    t_sh = jnp.where(ds.distance >= INFD, INFD, ds.distance * (1.0 - 1e-3))
    occ = occluded(geo, bvh, _offset_ray(hp_pos, hp_ns, ds.direction),
                   ds.direction, t_sh, use_bvh=use_bvh)
    f_d = hp_alb / jnp.pi * cos_x[..., None]
    L_dir = jnp.where(
        (hp_valid & ~occ & (ds.pdf > 0))[..., None],
        f_d * ds.radiance / jnp.maximum(ds.pdf, 1e-12)[..., None],
        0.0,
    )

    # --- caustics from the caustic map at x
    _, phi_c_bins, _ = gather(
        hp_pos, hp_ns, jnp.full((n,), r_caustic),
        gl_pos, gl_wi, gl_pw, gl_ok & ca_ok, lo, inv_cell, G,
    )
    phi_c = phi_c_bins.sum(axis=1)  # diffuse estimate: direction bins summed
    L_cau = jnp.where(
        hp_valid[..., None],
        hp_alb / jnp.pi * phi_c / (jnp.pi * r_caustic * r_caustic * n_emitted),
        0.0,
    )

    # --- one-bounce final gather with global-map radiance estimate at y
    u_g = event_uniform(rkeys, 12 << 20, 2)
    frame = Frame.from_normal(hp_ns)
    d_g = frame.to_world(square_to_cosine_hemisphere(u_g))
    hit = intersect(_offset_ray(hp_pos, hp_ns, d_g), d_g)
    t_hit = jnp.where(hit.valid, hit.t, 1.0)
    y = _offset_ray(hp_pos, hp_ns, d_g) + t_hit[..., None] * d_g
    row = gather_rows_t(geo.shade_packed, jnp.maximum(hit.prim, 0))
    ng_y = jnp.stack([row[0], row[1], row[2]], axis=-1)
    ns_y = jnp.where(dot(ng_y, -d_g)[..., None] < 0.0, -ng_y, ng_y)
    mid_y = row[18].astype(jnp.int32)
    alb_y = bsdf_mod.albedo_raw(mats, mid_y)
    is_emitter_y = row[19] >= 0.0
    _, phi_y_bins, _ = gather(
        y, ns_y, jnp.full((n,), r_global),
        gl_pos, gl_wi, gl_pw, gl_ok, lo, inv_cell, G,
    )
    phi_y = phi_y_bins.sum(axis=1)
    L_y = alb_y / jnp.pi * phi_y / (jnp.pi * r_global * r_global * n_emitted)
    # cosine pdf cancels f*cos for the diffuse lobe: contribution=albedo*L_y
    ok_g = hp_valid & hit.valid & ~is_emitter_y
    L_ind = jnp.where(ok_g[..., None], hp_alb * L_y, 0.0)

    return hp_T * (L_dir + L_cau + L_ind)


def render_photonmapper(
    scene: SceneData, cfg, n_photons: int = 1 << 17,
    r_global: float | None = None, r_caustic: float | None = None,
):
    """Classic photon-mapping render; cfg.spp camera samples each carrying
    one final-gather ray (the reference fires granularity-many gather rays
    per query — spp plays that role on the wavefront).  Returns (H, W, 3)."""
    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    w, h = cfg.width, cfg.height
    n_pix = w * h
    use_bvh = cfg.use_bvh
    if use_bvh is None:
        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)

    lo = scene.aabb_min
    extent = float(jnp.max(scene.aabb_max - scene.aabb_min))
    if r_global is None:
        r_global = 0.025 * extent
    if r_caustic is None:
        r_caustic = 0.012 * extent
    cell = 2.0 * max(r_global, r_caustic)
    G = min(int(np.ceil(extent / cell)) + 1, GRID_MAX)
    inv_cell = 1.0 / cell

    key = rng.base_key(cfg.seed)
    # one photon map reused by every camera pass (classic PM is biased +
    # consistent in n_photons, not in spp)
    rk_ph = rng.ray_keys(
        key, jnp.arange(n_photons, dtype=jnp.int32) + (1 << 24),
        jnp.zeros((n_photons,), jnp.int32),
    )
    gl_pos, gl_wi, gl_pw, gl_ok, ca_ok = photon_pass(
        scene, rk_ph, max_depth=cfg.max_depth, use_bvh=use_bvh,
        em_kinds=em_kinds, mat_types=mat_types,
    )

    pix = jnp.arange(n_pix, dtype=jnp.int32)
    acc = jnp.zeros((n_pix, 3))
    spp = max(cfg.spp, 1)
    for s in range(spp):
        rk = rng.ray_keys(key, pix, jnp.full((n_pix,), s, jnp.int32))
        u_pos = event_uniform(rk, 1 << 20, 2)
        hp_pos, hp_ns, hp_alb, hp_T, hp_valid, L_em, hp_mid, hp_wol = camera_pass(
            scene, rk, w, h, u_pos, pix,
            max_depth=cfg.max_depth, use_bvh=use_bvh,
            em_kinds=em_kinds, mat_types=mat_types,
            sensor_kind=int(scene.sensor.kind),
        )
        acc = acc + L_em + _shade_pass(
            scene, rk, hp_pos, hp_ns, hp_alb, hp_T, hp_valid,
            gl_pos, gl_wi, gl_pw, gl_ok, ca_ok,
            lo, inv_cell, G,
            jnp.float32(r_global), jnp.float32(r_caustic), n_photons,
            use_bvh=use_bvh, em_kinds=em_kinds, mat_types=mat_types,
        )
    return (acc / jnp.float32(spp)).reshape(h, w, 3)
