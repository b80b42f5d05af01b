"""Veach path-space MLT: lens / caustic / multi-chain perturbations.

TPU-native counterpart of the reference's ``mlt`` plugin and its
path-space mutation strategies (/root/reference/src/integrators/mlt/
mlt.cpp, src/libbidir/mut_lens.cpp, mut_caustic.cpp, mut_mchain.cpp).
The reference mutates one path per worker thread through pointer-based
Path objects; here THOUSANDS of chains run as wavefront lanes, the path
state is a fixed-depth SoA vertex table, and every mutation step is one
jitted wavefront retrace (SURVEY §2.6 P7 chain parallelism).

State space: camera paths terminated at their first emitter hit
(unidirectional, no NEE), over the hybrid measure (screen position,
solid angles at non-specular vertices — equivalently areas; specular
chains are deterministic functions of their anchor).  In this
parameterization the stationary density is the raw factor product

    P(x) = prod_i [ fs_i cos_i  |  F_i (delta weight) ] * Le

with NO geometry terms (they are absorbed by the forward
parameterization) except at a reconnection edge, where the fixed suffix
vertex contributes its area->solid-angle conversion G explicitly (Veach
thesis §10.3.2: the lens perturbation's transition density lives in
screen space, so only the reconnection edge's G survives in the
acceptance ratio).

The unified perturbation (one kernel serves lens + caustic + multi-chain):
  1. pick an anchor uniformly among {lens} + {non-specular interior
     vertices};
  2. perturb — lens: exponentially-distributed annulus offset of the
     image point (mut_lens.cpp:103); interior: exponential cone rotation
     of the outgoing direction (mut_caustic.cpp:111);
  3. re-propagate deterministically through the (possibly empty)
     specular chain that follows, requiring the SAME lobe structure
     (type + reflect/refract choice — mut_caustic.cpp's mode matching);
  4. land on the first non-specular slot j:
     - j == path end: must hit an emitter (caustic-style acceptance,
       ratio = lum P'/lum P);
     - j <  path end: reconnect to the fixed suffix vertex v_{j+1}
       (lens/multi-chain-style; ratio gains G'/G of the reconnection
       edge and a visibility test).
Large steps (fresh forward traces, Kelemen-style acceptance W'/W) keep
the chains ergodic.

Supported: all smooth BSDF families via models/bsdf.eval_pdf_raw;
delta chains through CONDUCTOR and DIELECTRIC surfaces.  Untextured,
surface-only, perspective sensor (the reference's mutators carry the
same restrictions in spirit: manifold/lens mutations assume a
perspective camera, mut_lens.cpp:71).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.accel.traverse import (
    intersect_brute,
    intersect_bvh,
    occluded,
)
from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.math import (
    Frame,
    dot,
    fresnel_conductor,
    fresnel_dielectric,
    normalize,
    reflect_local,
    refract_local,
)
from mitsuba_path_guiding_tpu.core.spectrum import luminance
from mitsuba_path_guiding_tpu.core.warp import square_to_cosine_hemisphere
from mitsuba_path_guiding_tpu.film.film import splat_raw
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.models.bsdf import eval_pdf_raw, gather_params
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t
from mitsuba_path_guiding_tpu.scene.types import BSDFType, SceneData

INF = 3.0e38
P_TRANSMIT_SIDE = 0.1   # two-sided cosine: transmit-side probability


class MLTState(NamedTuple):
    """SoA chain state; V = max surface vertices (static)."""

    vp: jnp.ndarray     # (V+1, 3, N) positions; row 0 = camera
    ns: jnp.ndarray     # (V, 3, N) shading normals (BSDF frames)
    ng: jnp.ndarray     # (V, 3, N) geometric normals (measure/G terms)
    prim: jnp.ndarray   # (V, N) int32 triangle ids (-1 unused)
    spec: jnp.ndarray   # (V, N) bool — delta vertex
    lobe: jnp.ndarray   # (V, N) bool — dielectric: True = reflect
    plen: jnp.ndarray   # (N,) int32 — emitter vertex index; 0 = dead chain
    P: jnp.ndarray      # (N, 3) raw factor product (stationary density)
    pdffw: jnp.ndarray  # (N,) forward-sampling density (large steps)
    xy: jnp.ndarray     # (N, 2) film position


def _shade_rows(geo, prim):
    """(mid, eid, ns_fn(u,v), ng) decode via one packed row-gather
    (Geometry.shade_packed layout, see integrators/path.py)."""
    row = gather_rows_t(geo.shade_packed, jnp.maximum(prim, 0))
    ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
    mid = row[18].astype(jnp.int32)
    eid_f = row[19]

    def ns_at(u, v):
        b0 = 1.0 - u - v
        ns = normalize(jnp.stack([
            b0 * row[3] + u * row[6] + v * row[9],
            b0 * row[4] + u * row[7] + v * row[10],
            b0 * row[5] + u * row[8] + v * row[11],
        ], axis=-1))
        return ns

    return mid, eid_f, ns_at, ng


def _is_delta_type(t):
    return (
        (t == BSDFType.CONDUCTOR) | (t == BSDFType.DIELECTRIC)
        | (t == BSDFType.THINDIELECTRIC)
    )


def _spec_propagate(p, wi_l, lobe):
    """Deterministic delta interaction: (wo_l, factor (N,3), pdf_lobe, ok).

    Mirrors models/bsdf._sample_families' CONDUCTOR/DIELECTRIC branches,
    but the branch choice comes from the stored ``lobe`` instead of a
    uniform (the retrace must follow the SAME lobe structure)."""
    cz = wi_l[..., 2]
    # conductor
    F_c = fresnel_conductor(cz, p.eta, p.k)
    wo_c = reflect_local(wi_l)
    fac_c = p.spec * F_c
    # dielectric (signed wi: one-sided physics)
    eta_s = jnp.maximum(p.eta[..., 0], 1e-3)
    F_d = fresnel_dielectric(cz, eta_s)
    wo_refr, tir = refract_local(wi_l, eta_s)
    rel_eta = jnp.where(cz > 0.0, eta_s, 1.0 / eta_s)
    wo_d = jnp.where(lobe[..., None], reflect_local(wi_l), wo_refr)
    fac_d = jnp.where(
        lobe[..., None],
        p.spec * F_d[..., None],
        p.spec * ((1.0 - F_d) / jnp.maximum(rel_eta * rel_eta, 1e-8))[..., None],
    )
    pdf_d = jnp.where(lobe, F_d, 1.0 - F_d)
    ok_d = lobe | ~tir

    is_diel = p.type == BSDFType.DIELECTRIC
    wo = jnp.where(is_diel[..., None], wo_d, wo_c)
    fac = jnp.where(is_diel[..., None], fac_d, fac_c)
    pdf = jnp.where(is_diel, pdf_d, jnp.ones_like(pdf_d))
    ok = jnp.where(is_diel, ok_d, jnp.ones_like(ok_d))

    # thin dielectric (thindielectric.cpp): reflect lobe with the
    # TIR-summed R' = 2R/(1+R), else pass straight through
    F_t = fresnel_dielectric(jnp.abs(cz), eta_s)
    Rp = jnp.where(F_t < 1.0, 2.0 * F_t / (1.0 + F_t), jnp.ones_like(F_t))
    wo_t = jnp.where(lobe[..., None], reflect_local(wi_l), -wi_l)
    fac_t = p.spec * jnp.where(lobe, Rp, 1.0 - Rp)[..., None]
    is_thin = p.type == BSDFType.THINDIELECTRIC
    wo = jnp.where(is_thin[..., None], wo_t, wo)
    fac = jnp.where(is_thin[..., None], fac_t, fac)
    pdf = jnp.where(is_thin, jnp.where(lobe, Rp, 1.0 - Rp), pdf)
    ok = jnp.where(is_thin, lobe | (Rp < 1.0), ok)
    return wo, fac, pdf, ok


def _smooth_factor(mats, mid, wi_l, wo_l, types):
    """(factor = fs*cos (N,3), pdf_dir) for the two-sided cosine sampler."""
    f, _ = eval_pdf_raw(mats, mid, wi_l, wo_l, types)
    same_side = (wi_l[..., 2] * wo_l[..., 2]) > 0.0
    p_side = jnp.where(same_side, 1.0 - P_TRANSMIT_SIDE, P_TRANSMIT_SIDE)
    pdf_dir = p_side * jnp.abs(wo_l[..., 2]) / jnp.pi
    return f, jnp.maximum(pdf_dir, 1e-12)


def _statics(scene, cfg):
    from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    use_bvh = cfg.use_bvh
    if use_bvh is None:
        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS
    return (kinds_present(scene.emitters), types_present(scene.mats),
            bool(use_bvh), int(scene.sensor.kind))


def _intersect(scene, use_bvh, o, d):
    if use_bvh:
        t, prim, u, v, valid = intersect_bvh(scene.geo, scene.bvh, o, d, None)
    else:
        t, prim, u, v, valid = intersect_brute(scene.geo, o, d, None)
    return t, prim, u, v, valid


def _trace_path(scene, cfg, u_mat, statics):
    """Forward-trace a full wavefront of paths from PSS coordinates.

    u_mat: (2 + 3V, N) — rows 0:2 screen, then (u1, u2, u_sel) per bounce.
    Returns an MLTState batch."""
    em_kinds, mat_types, use_bvh, sensor_kind = statics
    V = cfg.max_depth
    n = u_mat.shape[1]
    w, h = cfg.width, cfg.height

    fx, fy = u_mat[0] * w, u_mat[1] * h
    ix = jnp.clip(fx.astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(fy.astype(jnp.int32), 0, h - 1)
    pid = iy * w + ix
    jitter = jnp.stack([fx - ix, fy - iy], axis=-1)
    o, d, film_xy = generate_rays(scene.sensor, w, h, pid, jitter,
                                  kind=sensor_kind)

    vp = jnp.zeros((V + 1, 3, n))
    vp = vp.at[0].set(o.T)
    ns_t = jnp.zeros((V, 3, n))
    ng_t = jnp.zeros((V, 3, n))
    prim_t = jnp.full((V, n), -1, jnp.int32)
    spec_t = jnp.zeros((V, n), bool)
    lobe_t = jnp.zeros((V, n), bool)
    plen = jnp.zeros((n,), jnp.int32)
    P = jnp.ones((n, 3))
    pdffw = jnp.ones((n,))
    alive = jnp.ones((n,), bool)

    for i in range(1, V + 1):
        t, prim, hu, hv, hvalid = _intersect(scene, use_bvh, o, d)
        valid = alive & hvalid
        p = o + jnp.where(hvalid, t, 1.0)[..., None] * d
        mid, eid_f, ns_at, ng = _shade_rows(scene.geo, prim)
        ns = ns_at(hu, hv)
        ns = jnp.where(dot(ns, ng)[..., None] < 0.0, -ns, ns)
        is_em = valid & (eid_f >= 0.0)
        Le = em_mod.eval_hit(scene.emitters, scene.geo,
                             eid_f.astype(jnp.int32), d, prim)
        P = jnp.where(is_em[..., None], P * Le, P)
        plen = jnp.where(is_em, i, plen)

        vp = vp.at[i].set(jnp.where(valid, p.T, vp[i]))
        ns_t = ns_t.at[i - 1].set(jnp.where(valid, ns.T, ns_t[i - 1]))
        ng_t = ng_t.at[i - 1].set(jnp.where(valid, ng.T, ng_t[i - 1]))
        prim_t = prim_t.at[i - 1].set(jnp.where(valid, prim, prim_t[i - 1]))

        if i == V:
            alive = jnp.zeros_like(alive)
            break

        params = gather_params(scene.mats, mid)
        is_spec = _is_delta_type(params.type)
        fr = Frame.from_normal(ns)
        wi_l = fr.to_local(-d)
        u1, u2, usel = u_mat[2 + 3 * (i - 1)], u_mat[3 + 3 * (i - 1)], u_mat[4 + 3 * (i - 1)]

        lobe = usel < fresnel_dielectric(wi_l[..., 2],
                                         jnp.maximum(params.eta[..., 0], 1e-3))
        wo_s, fac_s, pdf_s, ok_s = _spec_propagate(params, wi_l, lobe)

        wo_cos = square_to_cosine_hemisphere(jnp.stack([u1, u2], axis=-1))
        side = jnp.where(usel < P_TRANSMIT_SIDE, -1.0, 1.0)
        sgn = jnp.sign(jnp.where(wi_l[..., 2] == 0.0, 1.0, wi_l[..., 2]))
        wo_d = wo_cos * jnp.stack(
            [jnp.ones_like(side), jnp.ones_like(side), side * sgn], axis=-1)
        fac_d, pdf_d = _smooth_factor(scene.mats, mid, wi_l, wo_d, mat_types)

        wo_l = jnp.where(is_spec[..., None], wo_s, wo_d)
        fac = jnp.where(is_spec[..., None], fac_s, fac_d)
        pdfstep = jnp.where(is_spec, pdf_s, pdf_d)
        ok = jnp.where(is_spec, ok_s, jnp.ones_like(ok_s))

        cont = valid & ~is_em & ok
        P = jnp.where(cont[..., None], P * fac, P)
        pdffw = jnp.where(cont, pdffw * jnp.maximum(pdfstep, 1e-12), pdffw)
        spec_t = spec_t.at[i - 1].set(jnp.where(cont, is_spec, spec_t[i - 1]))
        lobe_t = lobe_t.at[i - 1].set(jnp.where(cont, lobe, lobe_t[i - 1]))
        alive = cont & (luminance(P) > 0.0)
        wo_w = fr.to_world(wo_l)
        o = jnp.where(cont[..., None], p, o)
        d = jnp.where(cont[..., None], wo_w, d)

    dead = plen == 0
    P = jnp.where(dead[..., None], 0.0, P)
    return MLTState(vp, ns_t, ng_t, prim_t, spec_t, lobe_t, plen, P,
                    jnp.maximum(pdffw, 1e-30), film_xy)


def _eval_chain(scene, st: MLTState, cfg, statics):
    """Recompute (P, pdffw) from the vertex table — the single source of
    truth used for proposals (no incremental drift)."""
    em_kinds, mat_types, use_bvh, _ = statics
    V = cfg.max_depth
    n = st.plen.shape[0]
    P = jnp.ones((n, 3))
    pdffw = jnp.ones((n,))
    for i in range(1, V + 1):
        on_path = i <= st.plen
        win = normalize(st.vp[i].T - st.vp[i - 1].T)
        prim = st.prim[i - 1]
        mid, eid_f, _, _ = _shade_rows(scene.geo, prim)
        at_end = on_path & (i == st.plen)
        Le = em_mod.eval_hit(scene.emitters, scene.geo,
                             eid_f.astype(jnp.int32), win, prim)
        P = jnp.where(at_end[..., None], P * Le, P)

        interior = on_path & (i < st.plen)
        if i == V:
            break
        wout = normalize(st.vp[i + 1].T - st.vp[i].T)
        fr = Frame.from_normal(st.ns[i - 1].T)
        wi_l = fr.to_local(-win)
        wo_l = fr.to_local(wout)
        params = gather_params(scene.mats, mid)
        wo_s, fac_s, pdf_s, ok_s = _spec_propagate(params, wi_l, st.lobe[i - 1])
        fac_d, pdf_d = _smooth_factor(scene.mats, mid, wi_l, wo_l, mat_types)
        is_spec = st.spec[i - 1]
        fac = jnp.where(is_spec[..., None], fac_s, fac_d)
        pstep = jnp.where(is_spec, pdf_s, pdf_d)
        P = jnp.where(interior[..., None], P * fac, P)
        pdffw = jnp.where(interior, pdffw * jnp.maximum(pstep, 1e-12), pdffw)
    P = jnp.where((st.plen == 0)[..., None], 0.0, P)
    return P, jnp.maximum(pdffw, 1e-30)


def _rotate_about(d, theta, phi):
    """Rotate unit d by angle theta toward azimuth phi in d's tangent
    frame (the caustic-perturbation cone, mut_caustic.cpp:111)."""
    fr = Frame.from_normal(d)
    local = jnp.stack([
        jnp.sin(theta) * jnp.cos(phi),
        jnp.sin(theta) * jnp.sin(phi),
        jnp.cos(theta),
    ], axis=-1)
    return fr.to_world(local)


def _perturb(scene, cfg, statics, st: MLTState, u):
    """Unified lens/caustic/multi-chain perturbation for all chains.

    u: (8, N) uniforms.  Returns (proposal MLTState, accept-ratio (N,),
    valid (N,))."""
    em_kinds, mat_types, use_bvh, sensor_kind = statics
    V = cfg.max_depth
    w, h = cfg.width, cfg.height
    n = st.plen.shape[0]
    vi = jnp.arange(V)[:, None]                       # (V, 1)

    # ---- anchor selection: uniform over {lens} + non-spec interior verts
    interior_ok = (vi + 1 < st.plen[None, :]) & ~st.spec      # (V, N)
    n_anchor = 1 + jnp.sum(interior_ok, axis=0)
    pick = (u[0] * n_anchor).astype(jnp.int32)        # 0 = lens
    # index of the pick-th non-spec interior vertex (1-based vertex id)
    csum = jnp.cumsum(interior_ok, axis=0)            # (V, N)
    m_idx = jnp.argmax((csum == pick[None, :]) & interior_ok, axis=0) + 1
    is_lens = pick == 0
    anchor = jnp.where(is_lens, 0, m_idx)             # vertex index of anchor

    # ---- the specular chain after the anchor ends at the first non-spec
    # slot j > anchor (slot j == plen means endpoint/caustic mode)
    after = vi + 1 > anchor[None, :]                  # (V, N) slots > anchor
    nonspec_slot = after & ~st.spec & (vi + 1 <= st.plen[None, :])
    has_j = jnp.any(nonspec_slot, axis=0)
    j = jnp.where(has_j, jnp.argmax(nonspec_slot, axis=0) + 1, st.plen)

    # ---- perturbed start ray
    # lens: exponential annulus in screen space (mut_lens.cpp r1/r2)
    r1, r2 = 0.25, 0.05 * min(w, h)
    rr = r2 * jnp.exp(-jnp.log(r2 / r1) * u[1])
    phi = 2.0 * jnp.pi * u[2]
    s_new = st.xy + rr[..., None] * jnp.stack(
        [jnp.cos(phi), jnp.sin(phi)], axis=-1)
    in_img = ((s_new[:, 0] >= 0) & (s_new[:, 0] < w)
              & (s_new[:, 1] >= 0) & (s_new[:, 1] < h))
    sx = jnp.clip(s_new[:, 0], 0.0, w - 1e-3)
    sy = jnp.clip(s_new[:, 1], 0.0, h - 1e-3)
    pid = sy.astype(jnp.int32) * w + sx.astype(jnp.int32)
    jit = jnp.stack([sx - jnp.floor(sx), sy - jnp.floor(sy)], axis=-1)
    o_l, d_l, xy_l = generate_rays(scene.sensor, w, h, pid, jit,
                                   kind=sensor_kind)
    # interior: exponential cone rotation (mut_caustic theta1/theta2)
    th1, th2 = 0.0001, 0.1
    theta = th2 * jnp.exp(-jnp.log(th2 / th1) * u[3])
    def vp_at(idx):
        ix = jnp.broadcast_to(idx[None, None, :], (1, 3, n))
        return jnp.take_along_axis(st.vp, ix, axis=0)[0].T  # (N, 3)

    av = vp_at(anchor)                                 # anchor position
    nxt = vp_at(anchor + 1)
    d_old = normalize(nxt - av)
    d_c = _rotate_about(d_old, theta, 2.0 * jnp.pi * u[4])

    o = jnp.where(is_lens[..., None], o_l, av)
    d = jnp.where(is_lens[..., None], d_l, d_c)
    xy_new = jnp.where(is_lens[..., None], xy_l, st.xy)
    ok = jnp.where(is_lens, in_img, jnp.ones_like(in_img))
    ok &= st.plen > 0

    # old types along the path (for mode matching)
    old_mid, _, _, _ = _shade_rows(scene.geo, st.prim.reshape(-1))
    old_type = gather_params(scene.mats, old_mid).type.reshape(V, n)

    # ---- re-propagate slots anchor+1 .. j
    vp_n, ns_n, ng_n, prim_n = st.vp, st.ns, st.ng, st.prim
    j_pos = jnp.zeros((n, 3))
    j_ns = jnp.zeros((n, 3))
    j_mid = jnp.zeros((n,), jnp.int32)
    j_eid = jnp.full((n,), -1.0)
    for i in range(1, V + 1):
        act = ok & (i > anchor) & (i <= j)
        t, prim, hu, hv, hvalid = _intersect(scene, use_bvh, o, d)
        p = o + jnp.where(hvalid, t, 1.0)[..., None] * d
        mid, eid_f, ns_at, ng = _shade_rows(scene.geo, prim)
        ns = ns_at(hu, hv)
        ns = jnp.where(dot(ns, ng)[..., None] < 0.0, -ns, ns)
        params = gather_params(scene.mats, mid)
        new_spec = _is_delta_type(params.type)

        in_chain = act & (i < j)
        at_j = act & (i == j)
        # chain slots must keep the SAME delta type; slot j must be
        # non-specular (or an emitter in endpoint mode — checked below)
        ok &= ~in_chain | (hvalid & new_spec & (params.type == old_type[i - 1]))
        ok &= ~at_j | hvalid

        upd = in_chain | at_j
        vp_n = vp_n.at[i].set(jnp.where(upd, p.T, vp_n[i]))
        ns_n = ns_n.at[i - 1].set(jnp.where(upd, ns.T, ns_n[i - 1]))
        ng_n = ng_n.at[i - 1].set(jnp.where(upd, ng.T, ng_n[i - 1]))
        prim_n = prim_n.at[i - 1].set(jnp.where(upd, prim, prim_n[i - 1]))
        j_pos = jnp.where(at_j[..., None], p, j_pos)
        j_ns = jnp.where(at_j[..., None], ns, j_ns)
        j_mid = jnp.where(at_j, mid, j_mid)
        j_eid = jnp.where(at_j, eid_f, j_eid)

        # deterministic delta propagation for chain slots
        fr = Frame.from_normal(ns)
        wi_l = fr.to_local(-d)
        wo_s, _, _, ok_prop = _spec_propagate(params, wi_l, st.lobe[i - 1])
        ok &= ~in_chain | ok_prop
        wo_w = fr.to_world(wo_s)
        o = jnp.where(in_chain[..., None], p, o)
        d = jnp.where(in_chain[..., None], wo_w, d)

    endpoint = j == st.plen
    # endpoint mode: slot j must be an emitter; reconnect mode: a
    # non-specular, non-emissive surface with the suffix vertex visible
    j_params = gather_params(scene.mats, j_mid)
    ok &= jnp.where(endpoint, j_eid >= 0.0,
                    (j_eid < 0.0) & ~_is_delta_type(j_params.type))
    vj1 = vp_at(jnp.minimum(j + 1, V))                 # suffix vertex (N, 3)
    to_suf = vj1 - j_pos
    rlen = jnp.sqrt(jnp.maximum(dot(to_suf, to_suf), 1e-12))
    sdir = to_suf / rlen[..., None]
    vis = ~occluded(scene.geo, scene.bvh, j_pos + 1e-4 * sdir, sdir,
                    rlen - 2e-4, use_bvh=use_bvh)
    ok &= endpoint | vis

    # reconnection-edge G ratio (only the area-measure suffix edge keeps
    # an explicit geometry factor; everything else is parameterized away)
    old_jpos = vp_at(j)
    suf_ng_prim = jnp.take_along_axis(st.prim, jnp.minimum(j, V - 1)[None, :],
                                      axis=0)[0]
    _, _, _, suf_ng = _shade_rows(scene.geo, suf_ng_prim)

    def edge_G(a, b, nb):
        # Suffix-side cosine only: the cosine at the (moving) reconnect
        # vertex j is already inside P via _eval_chain (eval_pdf_raw
        # returns f*cos(wo)); including |dot(na, dn)| here would double
        # count it and bias the stationary distribution for lens /
        # multi-chain reconnections (ref mut_lens.cpp counts each
        # endpoint's fs*cos exactly once on the reconnection edge).
        v = b - a
        r2_ = jnp.maximum(dot(v, v), 1e-12)
        dn = v / jnp.sqrt(r2_)[..., None]
        return jnp.abs(dot(nb, dn)) / r2_

    G_new = edge_G(j_pos, vj1, suf_ng)
    G_old = edge_G(old_jpos, vj1, suf_ng)
    g_ratio = jnp.where(endpoint, 1.0,
                        G_new / jnp.maximum(G_old, 1e-20))

    prop = MLTState(vp_n, ns_n, ng_n, prim_n, st.spec, st.lobe, st.plen,
                    st.P, st.pdffw, xy_new)
    return prop, g_ratio, ok


@partial(jax.jit, static_argnames=("cfg", "statics", "n_steps", "large_every"))
def _chain_steps(scene, cfg, statics, st: MLTState, keys, step0, acc,
                 n_steps, large_every=4):
    """n_steps mutations for all chains; cycle of kernels (one large step
    every ``large_every`` steps, perturbations otherwise)."""
    w, h = cfg.width, cfg.height
    V = cfg.max_depth
    D = 2 + 3 * V

    def splat_both(acc, st, xy_p, P_p, a):
        I_cur = jnp.maximum(luminance(st.P), 1e-12)
        I_p = jnp.maximum(luminance(P_p), 1e-12)
        acc = splat_raw(acc, st.xy, st.P * ((1.0 - a) / I_cur)[..., None], w, h)
        acc = splat_raw(acc, xy_p, P_p * (a / I_p)[..., None], w, h)
        return acc

    def large_step(st, k, acc):
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (D + 1,)))(k).T
        prop = _trace_path(scene, cfg, u[:D], statics)
        W_cur = luminance(st.P) / st.pdffw
        W_p = luminance(prop.P) / prop.pdffw
        a = jnp.clip(W_p / jnp.maximum(W_cur, 1e-30), 0.0, 1.0)
        acc = splat_both(acc, st, prop.xy, prop.P, a)
        takeN = u[D] < a
        new = MLTState(
            jnp.where(takeN[None, None, :], prop.vp, st.vp),
            jnp.where(takeN[None, None, :], prop.ns, st.ns),
            jnp.where(takeN[None, None, :], prop.ng, st.ng),
            jnp.where(takeN[None, :], prop.prim, st.prim),
            jnp.where(takeN[None, :], prop.spec, st.spec),
            jnp.where(takeN[None, :], prop.lobe, st.lobe),
            jnp.where(takeN, prop.plen, st.plen),
            jnp.where(takeN[..., None], prop.P, st.P),
            jnp.where(takeN, prop.pdffw, st.pdffw),
            jnp.where(takeN[..., None], prop.xy, st.xy),
        )
        return new, acc

    def pert_step(st, k, acc):
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (9,)))(k).T
        prop, g_ratio, okv = _perturb(scene, cfg, statics, st, u)
        P_p, pdffw_p = _eval_chain(scene, prop, cfg, statics)
        lum_p = luminance(P_p)
        a = jnp.clip(
            lum_p / jnp.maximum(luminance(st.P), 1e-30) * g_ratio, 0.0, 1.0)
        a = jnp.where(okv & (lum_p > 0.0), a, 0.0)
        acc = splat_both(acc, st, prop.xy, P_p, a)
        takeN = u[8] < a
        new = MLTState(
            jnp.where(takeN[None, None, :], prop.vp, st.vp),
            jnp.where(takeN[None, None, :], prop.ns, st.ns),
            jnp.where(takeN[None, None, :], prop.ng, st.ng),
            jnp.where(takeN[None, :], prop.prim, st.prim),
            st.spec, st.lobe, st.plen,
            jnp.where(takeN[..., None], P_p, st.P),
            jnp.where(takeN, pdffw_p, st.pdffw),
            jnp.where(takeN[..., None], prop.xy, st.xy),
        )
        return new, acc

    def step(carry, i):
        st, acc = carry
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, step0 + i)
        st, acc = jax.lax.cond(
            (step0 + i) % large_every == 0,
            lambda st, k, acc: large_step(st, k, acc),
            lambda st, k, acc: pert_step(st, k, acc),
            st, k, acc,
        )
        return (st, acc), None

    (st, acc), _ = jax.lax.scan(step, (st, acc), jnp.arange(n_steps))
    return st, acc


def render_mlt(scene: SceneData, cfg, n_chains: int = 4096,
               mutations_per_pixel: int | None = None,
               bootstrap_factor: int = 4, large_every: int = 4):
    """Path-space MLT render (reference mlt.cpp work flow: bootstrap ->
    seed chains proportional to luminance -> mutate + splat)."""
    w, h = cfg.width, cfg.height
    statics = _statics(scene, cfg)
    V = cfg.max_depth
    D = 2 + 3 * V
    mpp = mutations_per_pixel or cfg.spp
    n_steps_total = max(w * h * mpp // n_chains, 1)

    key = jax.random.PRNGKey(cfg.seed)
    kb, kseed, kchain = jax.random.split(key, 3)
    n_boot = bootstrap_factor * n_chains
    u_boot = jax.random.uniform(kb, (D, n_boot))
    boot = _trace_path(scene, cfg, u_boot, statics)
    W_boot = luminance(boot.P) / boot.pdffw
    b = float(jnp.mean(W_boot))
    if b <= 0.0:
        return jnp.zeros((h, w, 3))
    probs = W_boot / jnp.maximum(jnp.sum(W_boot), 1e-30)
    idx = jax.random.choice(kseed, n_boot, shape=(n_chains,), p=probs)
    # chain axis is LAST for the SoA tables, FIRST for P / pdffw / xy
    st = MLTState(
        boot.vp[:, :, idx], boot.ns[:, :, idx], boot.ng[:, :, idx],
        boot.prim[:, idx], boot.spec[:, idx], boot.lobe[:, idx],
        boot.plen[idx], boot.P[idx], boot.pdffw[idx], boot.xy[idx],
    )

    chain_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        kchain, jnp.arange(n_chains))
    acc = jnp.zeros((h * w, 3), jnp.float32)
    block, done = 32, 0
    while done < n_steps_total:
        m = min(block, n_steps_total - done)
        st, acc = _chain_steps(scene, cfg, statics, st, chain_keys,
                               done, acc, m, large_every)
        done += m
    n_samples = n_steps_total * n_chains
    return acc.reshape(h, w, 3) * (b * (w * h) / n_samples)
