"""Dipole BSSRDF subsurface scattering.

Counterpart of the reference's dipole subsurface plugin
(/root/reference/src/subsurface/dipole.cpp + irrproc.cpp + irrtree.cpp):
Jensen et al. 2001 classical dipole — irradiance samples on the translucent
surface, diffusion kernel
  dMo = 1/(4pi) * (C1 e^{-str dr}/dr^2 + C2 e^{-str dv}/dv^2)
with C1 = zr (str + 1/dr), C2 = zv (str + 1/dv),
zr = 1/st', zv = zr (1 + 4A/3), A = (1+Fdr)/(1-Fdr), str = sqrt(3 sa st'),
and Lo = (1 - Fr(cos, eta)) * Mo / pi   (dipole.cpp Lo).

TPU-native re-design: the reference samples irradiance points blue-noise
over the surface and gathers them through an octree (irrtree.cpp); here
- points come from area-weighted triangle sampling (one device pass),
- irradiance per point is a wavefront NEE estimate (+ optional hemisphere
  bounce), exactly the irrcache overture machinery,
- Mo(x) is a dense (pixels x samples) sweep in record chunks — the
  kernel-weighted sum is one (N, S) @ (S, 3) MXU matmul per chunk.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.accel.traverse import occluded
from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.math import dot, fresnel_dielectric
from mitsuba_path_guiding_tpu.core.rng import event_uniform
from mitsuba_path_guiding_tpu.core.warp import square_to_uniform_triangle
from mitsuba_path_guiding_tpu.integrators.path import INFD, _offset_ray
from mitsuba_path_guiding_tpu.integrators.sppm import camera_pass
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t
from mitsuba_path_guiding_tpu.scene.types import SceneData


class SSSamples(NamedTuple):
    pos: jnp.ndarray    # (S, 3)
    normal: jnp.ndarray # (S, 3)
    E: jnp.ndarray      # (S, 3) irradiance
    area: jnp.ndarray   # (S,) represented surface area per sample
    sid: jnp.ndarray    # (S,) sss row of the sample's triangle


def _fdr(eta):
    """fresnelDiffuseReflectance(1/eta) — d'Eon fit (util.cpp), matching
    the dipole's boundary condition input."""
    inv = 1.0 / eta
    return jnp.where(
        inv < 1.0,
        -0.4399 + 0.7099 / inv - 0.3319 / (inv * inv) + 0.0636 / (inv * inv * inv),
        -1.4399 / (inv * inv) + 0.7099 / inv + 0.6681 + 0.0636 * inv,
    )


def sample_surface_points(scene: SceneData, n: int, seed: int = 0) -> SSSamples:
    """Area-weighted points on all sss-tagged triangles (the blue-noise
    placement of bluenoise.cpp re-designed as plain area sampling — the
    estimator only needs E[area coverage], not point separation)."""
    shade = np.asarray(scene.geo.shade_packed)
    sid_tri = shade[:, 27].astype(np.int64)
    area = shade[:, 25]
    mask = sid_tri >= 0
    tri_ids = np.nonzero(mask)[0]
    if tri_ids.size == 0:
        raise ValueError("scene has no subsurface-tagged shapes")
    w = area[tri_ids]
    pmf = w / w.sum()
    rs = np.random.default_rng(seed)
    pick = rs.choice(tri_ids.size, size=n, p=pmf)
    tri = tri_ids[pick]
    u = jnp.asarray(rs.random((n, 2)), jnp.float32)
    b = square_to_uniform_triangle(u)
    p0 = scene.geo.p0[tri]
    p = p0 + b[..., 0:1] * scene.geo.e1[tri] + b[..., 1:2] * scene.geo.e2[tri]
    row = gather_rows_t(scene.geo.shade_packed, jnp.asarray(tri, jnp.int32))
    ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
    a_per = jnp.full((n,), float(w.sum()) / n)
    return SSSamples(
        pos=p, normal=ng, E=jnp.zeros((n, 3)),
        area=a_per, sid=jnp.asarray(sid_tri[tri], jnp.int32),
    )


def compute_irradiance(scene: SceneData, pts: SSSamples, cfg, n_nee: int = 8) -> SSSamples:
    """Direct irradiance at the sample points by NEE (irrproc.cpp's
    irradiance sampling; indirect E adds with more NEE+bounce passes)."""
    from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS

    use_bvh = cfg.use_bvh
    if use_bvh is None:
        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS
    n = pts.pos.shape[0]
    key = rng.base_key(cfg.seed + 1234)
    acc = jnp.zeros((n, 3))
    for s in range(n_nee):
        rk = rng.ray_keys(key, jnp.arange(n, dtype=jnp.int32),
                          jnp.full((n,), s, jnp.int32))
        u = event_uniform(rk, 13 << 20, 3)
        ds = em_mod.sample_direct_jit(scene.emitters, scene.geo, pts.pos, u)
        cos_r = jnp.maximum(dot(pts.normal, ds.direction), 0.0)
        t_sh = jnp.where(ds.distance >= INFD, INFD, ds.distance * (1.0 - 1e-3))
        occ = occluded(scene.geo, scene.bvh,
                       _offset_ray(pts.pos, pts.normal, ds.direction),
                       ds.direction, t_sh, use_bvh=use_bvh)
        acc = acc + jnp.where(
            (~occ & (ds.pdf > 0))[..., None],
            ds.radiance * (cos_r / jnp.maximum(ds.pdf, 1e-12))[..., None], 0.0,
        )
    return pts._replace(E=acc / n_nee)


@jax.jit
def dipole_mo(sss_row, x, samples: SSSamples):
    """Mo(x) for query points x (N, 3) against all irradiance samples:
    diffusion-kernel-weighted sum (dipole.cpp IsotropicDipoleQuery)."""
    sa = sss_row[0:3] * sss_row[7]
    ssp = sss_row[3:6] * sss_row[7]
    stp = sa + ssp
    eta = sss_row[6]
    fdr = _fdr(eta)
    A = (1.0 + fdr) / jnp.maximum(1.0 - fdr, 1e-6)
    sigma_tr = jnp.sqrt(3.0 * sa * stp)
    zr = 1.0 / jnp.maximum(stp, 1e-9)
    zv = zr * (1.0 + 4.0 / 3.0 * A)

    d2 = (
        jnp.sum(x * x, axis=-1)[:, None]
        + jnp.sum(samples.pos * samples.pos, axis=-1)[None, :]
        - 2.0 * (x @ samples.pos.T)
    )
    d2 = jnp.maximum(d2, 0.0)[..., None]  # (N, S, 1) broadcast over rgb
    dr = jnp.sqrt(d2 + zr * zr)
    dv = jnp.sqrt(d2 + zv * zv)
    c1 = zr * (sigma_tr + 1.0 / dr)
    c2 = zv * (sigma_tr + 1.0 / dv)
    dmo = (1.0 / (4.0 * jnp.pi)) * (
        c1 * jnp.exp(-sigma_tr * dr) / (dr * dr)
        + c2 * jnp.exp(-sigma_tr * dv) / (dv * dv)
    )
    contrib = dmo * (samples.E * samples.area[:, None])[None]
    return contrib.sum(axis=1)  # (N, 3)


def render_subsurface(
    scene: SceneData, cfg, n_points: int = 2048, n_nee: int = 8,
    chunk: int = 8192,
):
    """Render with dipole subsurface on tagged shapes: first camera hits on
    sss triangles return Lo = (1 - Fr) * Mo / pi; other surfaces get plain
    NEE direct (use the full integrators for untagged content).
    Returns (H, W, 3)."""
    from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS
    from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays
    from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod

    if scene.sss_packed is None:
        raise ValueError("scene has no subsurface shapes")
    use_bvh = cfg.use_bvh
    if use_bvh is None:
        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS

    sss_np = np.asarray(scene.sss_packed)
    any_dipole = bool((sss_np[:, 9] < 0.5).any())
    if any_dipole:
        pts = sample_surface_points(scene, n_points, seed=cfg.seed)
        pts = compute_irradiance(scene, pts, cfg, n_nee=n_nee)

    w, h = cfg.width, cfg.height
    n_pix = w * h
    key = rng.base_key(cfg.seed)
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    acc = jnp.zeros((n_pix, 3))
    spp = max(cfg.spp, 1)
    for s in range(spp):
        rk = rng.ray_keys(key, pix, jnp.full((n_pix,), s, jnp.int32))
        u_cam = event_uniform(rk, rng.TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, w, h, pix, u_cam,
                                kind=int(scene.sensor.kind))
        hit = (intersect_bvh(scene.geo, scene.bvh, o, d) if use_bvh
               else intersect_brute(scene.geo, o, d))
        t_hit = jnp.where(hit.valid, hit.t, 1.0)
        p = o + t_hit[..., None] * d
        row = gather_rows_t(scene.geo.shade_packed, jnp.maximum(hit.prim, 0))
        ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
        sid = row[27].astype(jnp.int32)
        is_sss = hit.valid & (sid >= 0)
        # one sss material per pass keeps Mo static-shaped; mixed-sss
        # scenes loop over the table rows
        L = jnp.zeros((n_pix, 3))
        for r in range(int(scene.sss_packed.shape[0])):
            sss_row = scene.sss_packed[r]
            if sss_np[r, 9] >= 0.5:
                # singlescatter.cpp path: refracted internal ray + light
                # connections (see singlescatter_lo)
                lo = singlescatter_lo(
                    scene, sss_row, r, p, d, ng, is_sss & (sid == r), rk,
                    use_bvh,
                )
            else:
                mo = jnp.concatenate([
                    dipole_mo(sss_row, p[i : i + chunk], pts)
                    for i in range(0, n_pix, chunk)
                ], axis=0)
                cos_o = jnp.abs(dot(ng, -d))
                ft = 1.0 - fresnel_dielectric(cos_o, sss_row[6])
                lo = mo / jnp.pi * ft[..., None]
            L = jnp.where((is_sss & (sid == r))[..., None], lo, L)
        # non-sss surfaces: single NEE direct bounce (documentation: use
        # the main integrators for full GI on mixed scenes)
        u_nee = event_uniform(rk, 7 << 20, 3)
        ds = em_mod.sample_direct_jit(scene.emitters, scene.geo, p, u_nee)
        ns = ng
        cos_x = jnp.maximum(dot(ns, ds.direction), 0.0)
        t_sh = jnp.where(ds.distance >= INFD, INFD, ds.distance * (1.0 - 1e-3))
        occ = occluded(scene.geo, scene.bvh, _offset_ray(p, ng, ds.direction),
                       ds.direction, t_sh, use_bvh=use_bvh)
        mid = row[18].astype(jnp.int32)
        alb = bsdf_mod.albedo_raw(scene.mats, mid)
        l_dir = jnp.where(
            (hit.valid & ~is_sss & ~occ & (ds.pdf > 0))[..., None],
            alb / jnp.pi * ds.radiance
            * (cos_x / jnp.maximum(ds.pdf, 1e-12))[..., None], 0.0,
        )
        # visible emission
        cos_l = dot(ng, -d)
        Le = jnp.where(((row[19] >= 0.0) & (cos_l > 0.0) & hit.valid)[..., None],
                       jnp.stack([row[20], row[21], row[22]], axis=-1), 0.0)
        acc = acc + L + l_dir + Le
    return (acc / jnp.float32(spp)).reshape(h, w, 3)


def singlescatter_lo(
    scene: SceneData, sss_row, sid_row: int, p, d, ng, valid, rk,
    use_bvh: bool, n_dist: int = 4,
):
    """Single scattering inside a refractive-boundary object (reference
    src/subsurface/singlescatter.cpp, Holzschuch 2014 "Accurate computation
    of single scattering in participating media with refractive
    boundaries").

    TPU-native re-design: camera refraction at the entry point is exact
    (Snell + Fresnel); ``n_dist`` stratified truncated-exponential distance
    samples along the internal ray each make a light connection with
    STRAIGHT-LINE boundary crossing — internal attenuation to the exit
    point, exit Fresnel transmittance, external occlusion — i.e. the
    common straight-connection approximation rather than Holzschuch's
    Newton-refracted connections (no bending / solid-angle reshaping at
    the exit interface).  Depth-1 volumetric scattering only (the
    reference's ``singleScatterDepth`` defaults effectively cover the
    dominant first order)."""
    from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh
    from mitsuba_path_guiding_tpu.core.math import Frame, refract_local
    from mitsuba_path_guiding_tpu.models.phase import phase_eval

    geo, bvh, em = scene.geo, scene.bvh, scene.emitters

    def intersect(o_, d_):
        return intersect_bvh(geo, bvh, o_, d_) if use_bvh else intersect_brute(geo, o_, d_)

    scale = sss_row[7]
    sa = sss_row[0:3] * scale
    ss_c = sss_row[3:6] * scale
    st = sa + ss_c
    eta = sss_row[6]
    g = sss_row[8]

    frame = Frame.from_normal(ng)
    wi_l = frame.to_local(-d)
    wt_l, tir = refract_local(wi_l, eta)
    d_in = frame.to_world(wt_l)
    fr_in = fresnel_dielectric(wi_l[..., 2], eta)
    enter = valid & ~tir

    o_in = p - ng * 1e-4
    hx = intersect(o_in, d_in)
    t_exit = jnp.where(hx.valid, hx.t, 1e-3)
    st_bar = jnp.maximum(jnp.mean(st), 1e-9)

    n = p.shape[0]
    acc = jnp.zeros((n, 3))
    for k in range(n_dist):
        u = event_uniform(rk, (17 << 20) + k, 4)
        uk = (k + u[..., 0]) / n_dist
        cdf_end = -jnp.expm1(-st_bar * t_exit)
        t_k = -jnp.log1p(-uk * cdf_end) / st_bar
        t_k = jnp.minimum(t_k, t_exit * (1.0 - 1e-4))
        pdf_k = st_bar * jnp.exp(-st_bar * t_k) / jnp.maximum(cdf_end, 1e-12)
        x = o_in + t_k[..., None] * d_in

        ds = em_mod.sample_direct_jit(em, geo, x, u[..., 1:4])
        hb = intersect(x, ds.direction)
        row_b = gather_rows_t(geo.shade_packed, jnp.maximum(hb.prim, 0))
        sid_b = row_b[27].astype(jnp.int32)
        same = hb.valid & (sid_b == sid_row)
        t_b = jnp.where(same, hb.t, 0.0)
        ng_b = jnp.stack([row_b[0], row_b[1], row_b[2]], axis=-1)
        # exit Fresnel from inside the medium (cos < 0 flips rel_eta)
        cos_b = jnp.abs(dot(ng_b, ds.direction))
        ft_out = jnp.where(same, 1.0 - fresnel_dielectric(-cos_b, eta), 1.0)
        exit_p = x + t_b[..., None] * ds.direction
        rem = jnp.where(
            ds.distance >= INFD, INFD,
            jnp.maximum(ds.distance - t_b, 0.0) * (1.0 - 1e-3),
        )
        occ = occluded(
            geo, bvh, _offset_ray(exit_p, ng_b, ds.direction), ds.direction,
            rem, use_bvh=use_bvh,
        )
        ph = phase_eval(-d_in, ds.direction, g)
        tr = jnp.exp(-st[None, :] * (t_k + t_b)[..., None])
        w = ss_c[None, :] * tr * (ph / jnp.maximum(ds.pdf * pdf_k, 1e-20))[..., None]
        good = enter & ~occ & (ds.pdf > 0.0) & (ft_out > 0.0)
        acc = acc + jnp.where(
            good[..., None],
            ((1.0 - fr_in) * ft_out)[..., None] * ds.radiance * w,
            0.0,
        )
    return acc / n_dist
