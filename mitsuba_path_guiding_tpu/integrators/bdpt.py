"""Bidirectional path tracer (wavefront, recursive VCM-style MIS).

TPU-native counterpart of the reference's Veach BDPT plugin
(/root/reference/src/integrators/bdpt/bdpt.{h,cpp}, bdpt_proc.cpp — all
connection strategies including the light-image, ``lightImage`` flag
bdpt.h:44) and of the libbidir Path/PathVertex layer it is built on
(include/mitsuba/bidir/{path.h,vertex.h,edge.h}).

Design (re-design, not a translation): the reference walks pointer-linked
``Path`` objects per sample and computes MIS weights with an O(depth) pdf
sweep per connection (path.cpp ``miWeight``).  On TPU both subpaths are
fixed-depth SoA wavefronts (lax.scan), and MIS weights use the O(1)
*recursive* quantities dVCM/dVC carried per vertex — the formulation of
"Implementing Vertex Connection and Merging" (Georgiev 2012) used by GPU
bidirectional renderers, with the balance heuristic.  Strategy inventory
per full path with k edges:

  s=0          camera subpath hits the emitter            (weighted in-scan)
  s=1          fresh next-event sample from camera vertex (same pdf as the
               stored light vertex, lower correlation)
  t=1          every light-subpath vertex (including the emission vertex)
               connects to the camera -> light-image splats (bdpt_wr.cpp's
               separate work result)
  s>=2, t>=1   interior connections between stored vertices

Scope: finite emitters (area/point/spot); no RR inside subpaths (fixed
max_depth); surfaces only.  Env-map/infinite-light strategies: NEXT.md.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh, occluded
from mitsuba_path_guiding_tpu.core.math import Frame, dot, normalize
from mitsuba_path_guiding_tpu.core.rng import bounce_uniform, event_uniform
from mitsuba_path_guiding_tpu.integrators.path import INFD, _offset_ray
from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.models.sensor import connect_to_sensor, generate_rays
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t
from mitsuba_path_guiding_tpu.scene.types import EmitterKind, SceneData

TAG_EMITTER_RAY = 4 << 20
TAG_LIGHT_STREAM = 7 << 20

FINITE_KINDS = (EmitterKind.AREA, EmitterKind.POINT, EmitterKind.SPOT)


def _decode_hit(geo, hit, o, d):
    """Shared hit decode: position, normals, material id, emitter row data."""
    prim = jnp.maximum(hit.prim, 0)
    t_hit = jnp.where(hit.valid, hit.t, 1.0)
    p = o + t_hit[..., None] * d
    row = gather_rows_t(geo.shade_packed, prim)
    ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
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
    ns = jnp.where(dot(ns, ng)[..., None] < 0.0, -ns, ns)
    return p, ng, ns, row, t_hit


def _camera_pdf_w(sensor, width: int, height: int, d_world):
    """Solid-angle pdf (per one sample in the pixel hit by the direction)
    of a perspective camera ray: 1 / (A_pix_plane * cos^3 theta) — see
    models/sensor.py connect_to_sensor for the Jacobian chain."""
    R = sensor.to_world[:3, :3]
    fwd = R[:, 2]
    cos_t = jnp.maximum(dot(d_world, fwd), 1e-6)
    aspect = height / width
    tanx = sensor.tan_half_fov_x
    a_pix = (2.0 * tanx / width) * (2.0 * tanx * aspect / height)
    return 1.0 / (a_pix * cos_t**3)


@partial(
    jax.jit,
    static_argnames=("width", "height", "max_depth", "use_bvh", "em_kinds", "mat_types"),
)
def trace_bdpt(
    scene: SceneData,
    rkeys,
    pix: jnp.ndarray,
    width: int,
    height: int,
    max_depth: int = 5,
    use_bvh: bool = False,
    em_kinds=FINITE_KINDS,
    mat_types=bsdf_mod.ALL_TYPES,
):
    """One BDPT wave: each lane pairs one camera subpath (through its pixel)
    with one light subpath.

    Returns (L (N,3) per-lane pixel estimate, light_splats = (film_xy
    (A,N,2), rgb (A,3,N), ok (A,N)) to be accumulated into the light image
    divided by the TOTAL light-path count, n_segments ()).
    """
    # every emitter family traces: finite (area/point/spot), infinite
    # (constant/envmap: SmallVCM background-light conventions) and
    # delta-infinite (directional: delta direction, disk position;
    # collimated: delta position AND direction — light-subpath strategies
    # only, matching reference bdpt_proc.cpp:63+).  sample_ray supplies
    # the per-kind VCM pdf initialization.
    has_env = (EmitterKind.CONSTANT in em_kinds) or (EmitterKind.ENVMAP in em_kinds)
    # bounding-disk area of the infinite-emitter parameterization — MUST
    # match models/emitter.py sample_ray's radius convention
    _radius = 0.5 * jnp.linalg.norm(scene.aabb_max - scene.aabb_min) + 1e-3
    disk_area = jnp.pi * _radius * _radius
    geo, bvh, mats, em = scene.geo, scene.bvh, scene.mats, scene.emitters
    n = pix.shape[0]
    n_pix = width * height  # light-subpath count factor for t=1 MIS

    def intersect(o, d):
        return intersect_bvh(geo, bvh, o, d) if use_bvh else intersect_brute(geo, o, d)

    def occl(o, d, tmax):
        return occluded(geo, bvh, o, d, tmax, use_bvh=use_bvh)

    def rev_pdf(mid, wi_local, wo_local):
        """Adjoint pdf: density of sampling wi given wo."""
        _, p_r = bsdf_mod.eval_pdf_raw(mats, mid, wo_local, wi_local, types=mat_types)
        return p_r

    lkeys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(rkeys, TAG_LIGHT_STREAM)

    # ------------------------------------------------------------------
    # light subpath: emit, walk, store vertices, t=1 camera connections
    # ------------------------------------------------------------------
    u0 = event_uniform(lkeys, TAG_EMITTER_RAY, 5)
    rs = em_mod.sample_ray(em, scene.aabb_min, scene.aabb_max, u0, kinds=em_kinds)

    # emission vertex -> camera (a=1, t=1): direct weight (the recursion
    # state is not applicable to the unscattered emission vertex)
    film0, to_cam0, dist0, imp0, okc0 = connect_to_sensor(scene.sensor, width, height, rs.o)
    cos_q = dot(rs.normal, to_cam0)
    point_like = dot(rs.normal, rs.normal) < 0.5
    cos_conn = jnp.where(point_like, 1.0, jnp.maximum(cos_q, 0.0))
    occ0 = occl(rs.o, to_cam0, dist0 * (1.0 - 1e-3))
    splat0 = rs.emit_weight * (cos_conn * imp0)[..., None]
    cam_pdf_a0 = imp0 * cos_conn  # area pdf of camera sampling the emitter point
    w_light0 = cam_pdf_a0 / (n_pix * jnp.maximum(rs.direct_pdf_a, 1e-12))
    mis0 = 1.0 / (1.0 + w_light0)
    splat0 = splat0 * mis0[..., None]
    ok0 = (
        rs.valid & okc0 & ~occ0 & (jnp.max(splat0, axis=-1) > 0.0)
        & ~point_like & ~rs.infinite  # the bounding-disk origin is virtual
    )
    # point/spot lights have no area measure on the sensor side; their
    # direct image comes from the s=1 strategy exclusively
    emission_splat = (
        film0,
        jnp.stack([splat0[..., 0], splat0[..., 1], splat0[..., 2]], axis=0),
        ok0,
    )

    # VCM init at the emission vertex (Georgiev 2012, eq. for light source):
    e_pdf = jnp.maximum(rs.emission_pdf_w, 1e-12)
    dVCM_l0 = rs.direct_pdf_a / e_pdf
    # delta-POSITION emitters: a BSDF-sampled camera ray can never hit the
    # light, so the camera-continuation strategy dVC tracks does not exist
    dVC_l0 = jnp.where(point_like, 0.0, rs.cos_light / e_pdf)

    def light_bounce(carry, depth):
        o, d, T, alive, dVCM, dVC = carry
        u = bounce_uniform(lkeys, depth, 9)
        hit = intersect(o, d)
        act = alive & hit.valid
        p, ng, ns, row, t_hit = _decode_hit(geo, hit, o, d)
        mid = row[18].astype(jnp.int32)
        frame = Frame.from_normal(ns)
        wi_local = frame.to_local(-d)
        cos_in = jnp.maximum(jnp.abs(wi_local[..., 2]), 1e-6)

        # traversal update (pdf measure conversion to area at this vertex);
        # infinite emitters already carry an AREA-measure emission pdf on
        # the bounding disk, so their first segment skips the distance^2
        # factor (SmallVCM: "mIsFiniteLight" gate)
        d2 = jnp.maximum(t_hit * t_hit, 1e-12)
        d2 = jnp.where((depth == 0) & rs.infinite, 1.0, d2)
        dVCM_v = dVCM * d2 / cos_in
        dVC_v = dVC / cos_in

        # t=1: connect this vertex to the camera
        film_xy, to_cam, dist_cam, imp, okc = connect_to_sensor(scene.sensor, width, height, p)
        wo_cam = frame.to_local(to_cam)
        f_cam, _ = bsdf_mod.eval_pdf_raw(mats, mid, wi_local, wo_cam, types=mat_types)
        p_rev_cam = rev_pdf(mid, wi_local, wo_cam)  # adjoint at this vertex
        occ = occl(_offset_ray(p, ng, to_cam), to_cam, dist_cam * (1.0 - 1e-3))
        cam_pdf_a = imp * jnp.maximum(jnp.abs(dot(ns, to_cam)), 1e-6)
        w_light = (cam_pdf_a / n_pix) * (dVCM_v + p_rev_cam * dVC_v)
        mis = 1.0 / (1.0 + w_light)
        splat = T * f_cam * (imp * mis)[..., None]
        splat_ok = act & okc & ~occ & (jnp.max(splat, axis=-1) > 0.0)

        # continue the walk
        bs = bsdf_mod.sample_raw(mats, mid, wi_local, u[..., 3:6], types=mat_types)
        wo_world = frame.to_world(bs.wo)
        p_rev = rev_pdf(mid, bs.wo, wi_local)
        cos_out = jnp.maximum(jnp.abs(bs.wo[..., 2]), 1e-6)
        pf = jnp.maximum(bs.pdf, 1e-12)
        dVC_n = jnp.where(
            bs.is_delta, dVC_v * cos_out, (cos_out / pf) * (dVCM_v + p_rev * dVC_v)
        )
        dVCM_n = jnp.where(bs.is_delta, 0.0, 1.0 / pf)
        T_new = T * bs.weight
        cont = act & (bs.pdf > 0.0) & (jnp.max(jnp.abs(T_new), axis=-1) > 0.0)

        carry_new = (
            jnp.where(cont[..., None], _offset_ray(p, ng, wo_world), o),
            jnp.where(cont[..., None], wo_world, d),
            jnp.where(cont[..., None], T_new, T),
            cont,
            jnp.where(cont, dVCM_n, dVCM),
            jnp.where(cont, dVC_n, dVC),
        )
        # stored vertex for interior connections (component-major)
        vert = (
            jnp.stack([p[..., 0], p[..., 1], p[..., 2]], axis=0),
            jnp.stack([ns[..., 0], ns[..., 1], ns[..., 2]], axis=0),
            jnp.stack([ng[..., 0], ng[..., 1], ng[..., 2]], axis=0),
            jnp.stack([-d[..., 0], -d[..., 1], -d[..., 2]], axis=0),  # wi world
            mid,
            jnp.stack([T[..., 0], T[..., 1], T[..., 2]], axis=0),
            dVCM_v,
            dVC_v,
            act,
        )
        splat_out = (
            film_xy,
            jnp.stack([splat[..., 0], splat[..., 1], splat[..., 2]], axis=0),
            splat_ok,
        )
        return carry_new, (vert, splat_out)

    T_l0 = jnp.where(rs.valid[..., None], rs.weight, 0.0)
    # Path-length policy (matches this build's path tracer, integrators/
    # path.py: BSDF-hit paths up to max_depth edges, NEE paths up to
    # max_depth+1): cover every length <= max_depth+1 with the full
    # strategy set except s=0 at max_depth+1 (which the PT lacks too).
    # Light walk stores vertices a = 2..max_depth+1.
    n_light_bounces = max_depth
    (_, _, _, _, _, _), (lverts, lsplats) = jax.lax.scan(
        light_bounce,
        (rs.o, rs.d, T_l0, rs.valid, dVCM_l0, dVC_l0),
        jnp.arange(n_light_bounces),
    )
    light_splats = tuple(
        jnp.concatenate([e[None], b], axis=0) for e, b in zip(emission_splat, lsplats)
    )

    # ------------------------------------------------------------------
    # camera subpath: s=0 and s=1 in-scan, store vertices
    # ------------------------------------------------------------------
    from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA

    u_cam = event_uniform(rkeys, TAG_CAMERA, 2)
    o0, d0, film_xy_cam = generate_rays(scene.sensor, width, height, pix, u_cam)
    cam_pdf_w = _camera_pdf_w(scene.sensor, width, height, d0)
    dVCM_c0 = jnp.asarray(n_pix, jnp.float32) / cam_pdf_w
    dVC_c0 = jnp.zeros((n,))

    def cam_bounce(carry, depth):
        o, d, L, T, alive, dVCM, dVC, n_seg = carry
        u = bounce_uniform(rkeys, depth, 9)
        hit = intersect(o, d)
        act = alive & hit.valid
        n_seg = n_seg + jnp.sum(act.astype(jnp.int32))
        p, ng, ns, row, t_hit = _decode_hit(geo, hit, o, d)
        mid = row[18].astype(jnp.int32)
        frame = Frame.from_normal(ns)
        wi_local = frame.to_local(-d)
        cos_in = jnp.maximum(jnp.abs(wi_local[..., 2]), 1e-6)
        d2 = jnp.maximum(t_hit * t_hit, 1e-12)
        dVCM_v = dVCM * d2 / cos_in
        dVC_v = dVC / cos_in

        # --- s=0: emissive hit (area lights only carry geometry rows)
        is_emitter = row[19] >= 0.0
        cos_l = dot(ng, -d)
        Le = jnp.where(
            (is_emitter & (cos_l > 0.0))[..., None],
            jnp.stack([row[20], row[21], row[22]], axis=-1),
            0.0,
        )
        direct_pdf_a = row[23] / jnp.maximum(row[25], 1e-12)  # pmf / area
        emission_pdf_w = direct_pdf_a * jnp.maximum(cos_l, 0.0) / jnp.pi
        w_cam_hit = direct_pdf_a * dVCM_v + emission_pdf_w * dVC_v
        mis_hit = 1.0 / (1.0 + w_cam_hit)
        L = jnp.where(act[..., None], L + T * Le * mis_hit[..., None], L)

        # --- s=0 escape: environment radiance (bdpt_proc.cpp handles
        # infinite emitters throughout; SmallVCM background-light weight —
        # dVCM/dVC used UNconverted, pdfs in solid-angle x disk-area)
        if has_env:
            esc = alive & ~hit.valid
            env_L = em_mod.eval_env(em, d, kinds=em_kinds)
            pd_env = em_mod.pdf_env(em, d, kinds=em_kinds)
            pd_env = jnp.broadcast_to(pd_env, esc.shape)
            em_pdf_env = pd_env / disk_area
            w_cam_esc = pd_env * dVCM + em_pdf_env * dVC
            mis_esc = 1.0 / (1.0 + w_cam_esc)
            L = jnp.where(esc[..., None], L + T * env_L * mis_esc[..., None], L)

        # --- s=1: fresh next-event estimation with VCM weight
        ds = em_mod.sample_direct_jit(em, geo, p, u[..., 0:3], kinds=em_kinds)
        wo_nee = frame.to_local(ds.direction)
        f_nee, pdf_bsdf_nee = bsdf_mod.eval_pdf_raw(mats, mid, wi_local, wo_nee, types=mat_types)
        p_rev_nee = rev_pdf(mid, wi_local, wo_nee)
        o_sh = _offset_ray(p, ng, ds.direction)
        t_sh = jnp.where(ds.distance >= INFD, INFD, ds.distance * (1.0 - 1e-3))
        occ = occl(o_sh, ds.direction, t_sh)
        pdf_dir_w = jnp.maximum(ds.pdf, 1e-12)
        cos_to_l = jnp.abs(wo_nee[..., 2])
        # delta FINITE emitters (point/spot): ds.pdf is a discrete pick
        # prob (the 1/dist^2 lives in ds.radiance); the MIS ratio needs
        # the solid-angle measure.  Delta INFINITE (directional): SmallVCM
        # DirectionalLight convention — directPdfW stays the pick prob
        # and emission/direct = 1/diskArea (no distance factor), matching
        # the light-subpath t=1 competitor (bdpt_proc.cpp:63+ delta-
        # infinite strategies).
        inf_delta = ds.is_delta & (ds.distance >= INFD)
        d_l = jnp.minimum(ds.distance, 1e9)
        pdf_dir_mis = jnp.where(
            ds.is_delta & ~inf_delta, pdf_dir_w * d_l * d_l, pdf_dir_w
        )
        w_light_nee = jnp.where(ds.is_delta, 0.0, pdf_bsdf_nee / pdf_dir_w)
        # env/constant NEE: sample_direct leaves the VCM extras zero (it
        # has no scene extent); emission pdf = dir pdf / disk_area, cos=1
        is_env_nee = ((ds.distance >= INFD) & ~ds.is_delta) | inf_delta
        nee_em_pdf = jnp.where(is_env_nee, pdf_dir_w / disk_area, ds.emission_pdf_w)
        nee_cos_l = jnp.where(is_env_nee, 1.0, ds.cos_light)
        w_cam_nee = (
            nee_em_pdf
            * cos_to_l
            / (pdf_dir_mis * jnp.maximum(nee_cos_l, 1e-6))
        ) * (dVCM_v + p_rev_nee * dVC_v)
        mis_nee = 1.0 / (w_light_nee + 1.0 + w_cam_nee)
        contrib = T * f_nee * ds.radiance * (mis_nee / pdf_dir_w)[..., None]
        good = act & ~occ & (ds.pdf > 0.0)
        L = jnp.where(good[..., None], L + contrib, L)

        # --- continue
        bs = bsdf_mod.sample_raw(mats, mid, wi_local, u[..., 3:6], types=mat_types)
        wo_world = frame.to_world(bs.wo)
        p_rev = rev_pdf(mid, bs.wo, wi_local)
        cos_out = jnp.maximum(jnp.abs(bs.wo[..., 2]), 1e-6)
        pf = jnp.maximum(bs.pdf, 1e-12)
        dVC_n = jnp.where(
            bs.is_delta, dVC_v * cos_out, (cos_out / pf) * (dVCM_v + p_rev * dVC_v)
        )
        dVCM_n = jnp.where(bs.is_delta, 0.0, 1.0 / pf)
        T_new = T * bs.weight
        cont = act & (bs.pdf > 0.0) & (jnp.max(jnp.abs(T_new), axis=-1) > 0.0)

        carry_new = (
            jnp.where(cont[..., None], _offset_ray(p, ng, wo_world), o),
            jnp.where(cont[..., None], wo_world, d),
            L,
            jnp.where(cont[..., None], T_new, T),
            cont,
            jnp.where(cont, dVCM_n, dVCM),
            jnp.where(cont, dVC_n, dVC),
            n_seg,
        )
        vert = (
            jnp.stack([p[..., 0], p[..., 1], p[..., 2]], axis=0),
            jnp.stack([ns[..., 0], ns[..., 1], ns[..., 2]], axis=0),
            jnp.stack([ng[..., 0], ng[..., 1], ng[..., 2]], axis=0),
            jnp.stack([-d[..., 0], -d[..., 1], -d[..., 2]], axis=0),
            mid,
            jnp.stack([T[..., 0], T[..., 1], T[..., 2]], axis=0),
            dVCM_v,
            dVC_v,
            act,
        )
        return carry_new, vert

    L0 = jnp.zeros((n, 3))
    T0 = jnp.ones((n, 3))
    n_cam_bounces = max_depth  # b camera vertices => b edges for s=0
    carry, cverts = jax.lax.scan(
        cam_bounce,
        (o0, d0, L0, T0, jnp.ones((n,), bool), dVCM_c0, dVC_c0, jnp.int32(0)),
        jnp.arange(n_cam_bounces),
    )
    _, _, L, _, _, _, _, n_seg = carry

    # ------------------------------------------------------------------
    # interior connections: light vertex a (>=2) x camera vertex b, edges
    # (a-1) + b + 1 <= max_depth + 1 (see path-length policy above).
    # Stored index i corresponds to vertex index a = i + 2 (light: l_2 is
    # the first stored hit) / b = j + 1.
    # ------------------------------------------------------------------
    def vert_at(vs, i):
        return tuple(v[i] for v in vs)

    for i in range(n_light_bounces):
        a = i + 2
        for j in range(n_cam_bounces):
            b = j + 1
            if a + b > max_depth + 1:
                continue
            (lp, lns, lng, lwi, lmid, lT, ldVCM, ldVC, lact) = vert_at(lverts, i)
            (cp, cns, cng, cwi, cmid, cT, cdVCM, cdVC, cact) = vert_at(cverts, j)
            lp_v = jnp.stack([lp[0], lp[1], lp[2]], axis=-1)
            cp_v = jnp.stack([cp[0], cp[1], cp[2]], axis=-1)
            lns_v = jnp.stack([lns[0], lns[1], lns[2]], axis=-1)
            cns_v = jnp.stack([cns[0], cns[1], cns[2]], axis=-1)
            lng_v = jnp.stack([lng[0], lng[1], lng[2]], axis=-1)
            cng_v = jnp.stack([cng[0], cng[1], cng[2]], axis=-1)
            lwi_v = jnp.stack([lwi[0], lwi[1], lwi[2]], axis=-1)
            cwi_v = jnp.stack([cwi[0], cwi[1], cwi[2]], axis=-1)
            lT_v = jnp.stack([lT[0], lT[1], lT[2]], axis=-1)
            cT_v = jnp.stack([cT[0], cT[1], cT[2]], axis=-1)

            seg = lp_v - cp_v
            d2 = jnp.maximum(dot(seg, seg), 1e-12)
            dist = jnp.sqrt(d2)
            dir_cl = seg / dist[..., None]  # camera vertex -> light vertex

            cframe = Frame.from_normal(cns_v)
            lframe = Frame.from_normal(lns_v)
            c_wi_l = cframe.to_local(cwi_v)
            c_wo_l = cframe.to_local(dir_cl)
            l_wi_l = lframe.to_local(lwi_v)
            l_wo_l = lframe.to_local(-dir_cl)

            f_c, pdf_c_dir = bsdf_mod.eval_pdf_raw(mats, cmid, c_wi_l, c_wo_l, types=mat_types)
            pdf_c_rev = rev_pdf(cmid, c_wi_l, c_wo_l)
            f_l, pdf_l_dir = bsdf_mod.eval_pdf_raw(mats, lmid, l_wi_l, l_wo_l, types=mat_types)
            pdf_l_rev = rev_pdf(lmid, l_wi_l, l_wo_l)

            cos_c = jnp.abs(c_wo_l[..., 2])
            cos_l = jnp.abs(l_wo_l[..., 2])
            # f eval includes |cos| at its own vertex in this build's
            # convention -> geometry term contributes only 1/d^2
            geom = 1.0 / d2

            occ = occl(
                _offset_ray(cp_v, cng_v, dir_cl), dir_cl, dist * (1.0 - 2e-3)
            )
            pdf_c_dir_a = pdf_c_dir * cos_l / d2
            pdf_l_dir_a = pdf_l_dir * cos_c / d2
            w_light = pdf_c_dir_a * (ldVCM + pdf_l_rev * ldVC)
            w_cam = pdf_l_dir_a * (cdVCM + pdf_c_rev * cdVC)
            mis = 1.0 / (w_light + 1.0 + w_cam)
            contrib = cT_v * f_c * lT_v * f_l * (geom * mis)[..., None]
            ok = lact & cact & ~occ & (jnp.max(contrib, axis=-1) > 0.0)
            L = jnp.where(ok[..., None], L + contrib, L)

    return L, light_splats, n_seg


def render_bdpt(scene: SceneData, cfg, light_image: bool = True):
    """Full BDPT render; spp camera samples per pixel, one light subpath per
    camera sample (reference bdpt.cpp default configuration).  Returns
    (H, W, 3)."""
    import numpy as np

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.film.film import splat_raw
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    w, h = cfg.width, cfg.height
    n_pix = w * h
    use_bvh = cfg.use_bvh
    if use_bvh is None:
        from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS

        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)

    key = rng.base_key(cfg.seed)
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    acc = jnp.zeros((n_pix, 3), jnp.float32)
    light_acc = jnp.zeros((n_pix, 3), jnp.float32)
    n_light_paths = 0
    for s in range(cfg.spp):
        rkeys = rng.ray_keys(key, pix, jnp.full((n_pix,), s, jnp.int32))
        L, lsplats, _ = trace_bdpt(
            scene, rkeys, pix, w, h,
            max_depth=cfg.max_depth, use_bvh=use_bvh,
            em_kinds=em_kinds, mat_types=mat_types,
        )
        acc = acc + L
        if light_image:
            film_xy, rgb, ok = lsplats
            A = film_xy.shape[0]
            xy = film_xy.reshape(A * n_pix, 2)
            val = jnp.moveaxis(rgb, 1, 2).reshape(A * n_pix, 3)
            good = ok.reshape(A * n_pix)
            light_acc = splat_raw(
                light_acc, xy, jnp.where(good[..., None], val, 0.0), w, h
            )
        n_light_paths += n_pix
    img = acc / jnp.float32(cfg.spp)
    if light_image:
        img = img + light_acc / jnp.float32(n_light_paths)
    return img.reshape(h, w, 3)
