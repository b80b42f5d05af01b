"""Volumetric wavefront path tracer: homogeneous media + phase functions.

TPU-native counterpart of the reference's volumetric path tracers
(/root/reference/src/integrators/path/volpath.cpp:104-429 and the fork's
progressive_volpath.cpp with its ``useNee`` toggle :82 and avg-path-length
stats :26,371), restricted in round 1 to one global homogeneous medium
(src/medium/homogeneous.cpp): closed-form transmittance, per-channel
distance sampling with balance-heuristic channel MIS, NEE from both medium
and surface vertices with attenuated visibility
(Scene::evalTransmittance / sampleAttenuatedEmitterDirect analogues,
scene.h:290,598), and isotropic/HG phase sampling.

Same wavefront structure as path.py: lax.scan over a fixed bounce budget,
alive masks, one uniform block per bounce.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh, occluded
from mitsuba_path_guiding_tpu.core.math import (
    Frame,
    dot,
    normalize,
    power_heuristic,
)
from mitsuba_path_guiding_tpu.core.rng import bounce_uniform
from mitsuba_path_guiding_tpu.integrators.path import INFD, PathAux, _offset_ray
from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.models.medium import (
    _track_keys,
    sample_free_flight,
    transmittance_ratio,
)
from mitsuba_path_guiding_tpu.models.phase import phase_eval_kind, phase_sample_kind_w
from mitsuba_path_guiding_tpu.scene.types import BSDFType, SceneData
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

# rng fold-in salts for the tracking loops (distinct from bounce tags,
# core/rng.py TAG_* space)
TAG_TRACK_DIST = 2 << 20
TAG_TRACK_NEE = 3 << 20


def transmittance(sigma_t: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """(N,) distances -> (N,3) closed-form homogeneous transmittance.
    ``sigma_t``: (3,) constant or (N,3) per-lane (directional media)."""
    d = jnp.minimum(dist, 1e7)  # exp(-sigma*inf) underflow guard
    st = sigma_t if sigma_t.ndim > 1 else sigma_t[None, :]
    return jnp.exp(-st * d[..., None])


def _distance_pdfs(sigma_t: jnp.ndarray, t: jnp.ndarray):
    """Balance-heuristic channel-averaged pdfs for sampled distance t:
    (pdf_medium(t), P_surface_beyond(t)) — homogeneous.cpp's per-channel
    sampling strategies combined with equal channel weights.
    ``sigma_t``: (3,) or (N,3)."""
    st = sigma_t if sigma_t.ndim > 1 else sigma_t[None, :]
    ex = jnp.exp(-st * jnp.minimum(t, 1e7)[..., None])  # (N, 3)
    pdf_t = jnp.mean(st * ex, axis=-1)
    p_pass = jnp.mean(ex, axis=-1)
    return pdf_t, p_pass


@partial(
    jax.jit,
    static_argnames=("max_depth", "rr_depth", "use_nee", "use_bvh", "guide", "em_kinds", "mat_types", "record_paths", "hetero", "phase_kind", "guide_distance"),
)
def trace_vol(
    scene: SceneData,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    rkeys,
    max_depth: int = 8,
    rr_depth: int = 8,
    use_nee: bool = True,
    use_bvh: bool = False,
    guide=None,
    guide_state=None,
    em_kinds=em_mod.ALL_KINDS,
    mat_types=bsdf_mod.ALL_TYPES,
    record_paths: bool = False,
    hetero: bool = False,
    phase_kind: int = 0,
    guide_distance: bool = False,
):
    """Returns (L (N,3), PathAux, PathRecord|None).  max_depth counts
    collisions (surface or medium); records cover both event types so the
    guiding cache trains on volumetric transport too."""
    n = ray_o.shape[0]
    geo, bvh, mats, em, med = scene.geo, scene.bvh, scene.mats, scene.emitters, scene.medium
    sigma_t = med.sigma_a + med.sigma_s
    sigma_s = med.sigma_s
    g_hg = med.phase_g

    # microflake media have DIRECTIONAL extinction: sigma_t(w) scales with
    # the flakes' projected area along w (reference microflake.cpp's
    # sigmaT coupling through Medium; phase tables in models/phase.py).
    # The factor is normalized by the direction-averaged sigma (aux[3]) so
    # user-specified sigma_a/sigma_s keep their mean meaning.
    from mitsuba_path_guiding_tpu.models.phase import PhaseKind, _mf_sigma_t

    directional = (
        phase_kind == PhaseKind.MICROFLAKE
        and not hetero
        and med.sigt_table is not None
    )

    def dir_factor(w):
        cosw = jnp.abs(dot(w, jnp.broadcast_to(med.orientation, w.shape)))
        return _mf_sigma_t(med.sigt_table, cosw) / jnp.maximum(
            med.phase_aux[3], 1e-9
        )

    def intersect(o, d):
        return intersect_bvh(geo, bvh, o, d) if use_bvh else intersect_brute(geo, o, d)

    transparent_shadows = (BSDFType.NULL in mat_types) or (BSDFType.MASK in mat_types)

    def vis_transmittance(o, d, dist, depth):
        """Attenuated visibility for shadow rays (Scene::evalTransmittance,
        scene.h:290): surface term (boolean, or transparency-aware when
        null/mask materials exist) x medium transmittance (closed form for
        homogeneous media; unbiased ratio tracking for grids)."""
        if transparent_shadows:
            from mitsuba_path_guiding_tpu.accel.traverse import shadow_transmittance

            vis = shadow_transmittance(
                geo, bvh, mats.packed, o, d, dist, use_bvh=use_bvh
            )[..., None]
        else:
            vis = (~occluded(geo, bvh, o, d, dist, use_bvh=use_bvh))[..., None]
        if hetero:
            tkn = _track_keys(rkeys, depth, TAG_TRACK_NEE)
            tr = transmittance_ratio(med, o, d, dist, tkn)
        elif directional:
            tr = transmittance(sigma_t[None, :] * dir_factor(d)[..., None], dist)
        else:
            tr = transmittance(sigma_t, dist)
        return vis * tr

    L0 = jnp.zeros((n, 3))
    T0 = jnp.ones((n, 3))
    alive0 = jnp.ones((n,), dtype=bool)
    prev_pdf0 = jnp.full((n,), INFD)
    prev_delta0 = jnp.ones((n,), dtype=bool)
    aux0 = PathAux(
        albedo=jnp.zeros((n, 3)),
        normal=jnp.zeros((n, 3)),
        depth_t=jnp.zeros((n,)),
        n_bounces=jnp.zeros((n,), jnp.int32),
        first_le=jnp.zeros((n, 3)),
    )

    # guided distance sampling state (guiding/distance.py; BASELINE
    # config 4): a per-cell scalar flux proxy computed ONCE per wavefront
    # from the fitted cache, used to build piecewise-constant collision
    # densities along each medium ray inside the bounce loop
    use_guided_dist = (
        guide_distance and (guide is not None) and not hetero
        and phase_kind != 3  # PhaseKind.MICROFLAKE: directional sigma_t
    )
    use_guided_dist_het = (
        guide_distance and (guide is not None) and hetero and phase_kind != 3
    )
    if use_guided_dist or use_guided_dist_het:
        from mitsuba_path_guiding_tpu.guiding.distance import cell_flux

        dist_flux = cell_flux(guide_state)

    def bounce(carry, depth):
        o, d, L, T, alive, prev_pdf, prev_delta, t_acc, aux = carry
        u = bounce_uniform(rkeys, depth, 12)

        hit = intersect(o, d)
        t_surf = jnp.where(hit.valid, hit.t, INFD)

        if hetero:
            # --- weighted delta tracking against the grid majorant
            # (heterogeneous.cpp Woodcock tracking, re-designed as one
            # wave-uniform while_loop; models/medium.py)
            tkd = _track_keys(rkeys, depth, TAG_TRACK_DIST)
            t_med, is_med_ev, w_ff = sample_free_flight(med, o, d, t_surf, tkd)
            if use_guided_dist_het:
                # --- guided distance sampling in heterogeneous media
                # (zero-variance-walk reduction, Herholz 2019): sample the
                # collision distance from the radiance-weighted piecewise
                # density with GRID optical depth, decide surface
                # continuation with probability ~ Tr(t_surf), and weight
                # with an unbiased ratio-tracking transmittance — any
                # positive density is a valid estimator, so no MIS against
                # the tracker is needed.  Cold-cache lanes fall back to
                # the tracker result above.
                from mitsuba_path_guiding_tpu.guiding.distance import (
                    guided_distance_weights_hetero,
                    piecewise_pdf,
                    piecewise_sample,
                )
                from mitsuba_path_guiding_tpu.models.medium import (
                    density_at,
                    transmittance_ratio,
                )

                t1 = jnp.minimum(t_surf, jnp.max(scene.aabb_max - scene.aabb_min) * 1.74)
                w_seg, dt_seg, tot_seg, tr_end = guided_distance_weights_hetero(
                    guide_state, dist_flux, med, o, d, t1,
                )
                m_cont = tot_seg * dt_seg
                ok_g = (m_cont > 1e-10) & (dt_seg > 1e-9)
                p_surf = jnp.clip(tr_end, 0.05, 0.95)
                go_surf = u[..., 11] < p_surf
                t_g = piecewise_sample(w_seg, dt_seg, tot_seg, u[..., 10])
                pdf_c = piecewise_pdf(w_seg, dt_seg, tot_seg, t_g)
                t_ev = jnp.where(go_surf, jnp.minimum(t_surf, t1 * 4.0), t_g)
                tkd2 = _track_keys(rkeys, depth, TAG_TRACK_DIST + 7)
                tr_hat = transmittance_ratio(med, o, d, t_ev, tkd2)
                x_ev = o + t_g[..., None] * d
                ss_ev = density_at(med, x_ev)[..., None] * med.sigma_s
                w_med_g = ss_ev * tr_hat / jnp.maximum(
                    ((1.0 - p_surf) * pdf_c)[..., None], 1e-30
                )
                w_srf_g = tr_hat / p_surf[..., None]
                use_g = ok_g
                t_med = jnp.where(use_g, jnp.where(go_surf, INFD, t_g), t_med)
                is_med_ev = jnp.where(use_g, ~go_surf, is_med_ev)
                w_ff = jnp.where(
                    use_g[..., None],
                    jnp.where(go_surf[..., None], w_srf_g, w_med_g),
                    w_ff,
                )
            is_medium = alive & is_med_ev
            is_surface = alive & hit.valid & ~is_medium
            escaped = alive & ~hit.valid & ~is_medium
            # w_ff already contains sigma_s/(maj p_real) on medium events
            # and the accumulated null ratios on pass-through
            T = jnp.where(
                (is_medium | is_surface | escaped)[..., None], T * w_ff, T
            )
        else:
            # --- homogeneous distance sampling with channel balance
            # heuristic: pick channel uniformly, invert its exponential CDF
            ch = jnp.clip((u[..., 9] * 3.0).astype(jnp.int32), 0, 2)
            if directional:
                st_eff = sigma_t[None, :] * dir_factor(d)[..., None]  # (N,3)
                ss_eff = sigma_s[None, :] * dir_factor(d)[..., None]
                st_ch = jnp.maximum(
                    jnp.take_along_axis(st_eff, ch[:, None], axis=1)[:, 0], 1e-12
                )
            else:
                st_eff, ss_eff = sigma_t, sigma_s[None, :]
                st_ch = jnp.maximum(sigma_t[ch], 1e-12)
            t_med = -jnp.log(jnp.maximum(1.0 - u[..., 10], 1e-12)) / st_ch
            medium_on = jnp.max(sigma_t) > 0.0
            t_med = jnp.where(medium_on, t_med, INFD)

            if use_guided_dist:
                # --- guided distance sampling: one-sample MIS between the
                # analytic channel-exponential sampler above and a
                # radiance-weighted piecewise-constant density built from
                # the guiding cache (guiding/distance.py).  The analytic
                # component keeps full support, so the mixture is unbiased
                # even where the cache is cold/wrong.
                from mitsuba_path_guiding_tpu.guiding.distance import (
                    guided_distance_weights,
                    piecewise_pdf,
                    piecewise_sample,
                )

                sigma_bar = jnp.mean(sigma_t)
                # clip the guided range where Tr ~ 1e-4; beyond it the
                # analytic sampler rules
                t_clip = 9.2 / jnp.maximum(sigma_bar, 1e-12)
                t1 = jnp.minimum(t_surf, t_clip)
                w_seg, dt_seg, tot_seg = guided_distance_weights(
                    guide_state, dist_flux, o, d, t1,
                    jnp.broadcast_to(sigma_bar, (n,)),
                )
                beta = jnp.where(
                    medium_on & (tot_seg > 1e-12) & (dt_seg > 1e-9), 0.5, 0.0
                )
                use_g = u[..., 11] < beta
                t_g = piecewise_sample(w_seg, dt_seg, tot_seg, u[..., 10])
                t_med = jnp.where(use_g, t_g, t_med)
                is_medium = alive & (use_g | (t_med < t_surf))
            else:
                is_medium = alive & (t_med < t_surf)
            is_surface = alive & hit.valid & ~is_medium
            escaped = alive & ~hit.valid & ~is_medium

            # throughput updates for the sampled event (balance heuristic
            # over the three per-channel exponential strategies,
            # volpath.cpp:104): medium events weight by pdf(t_med); surface
            # events weight by the probability that the sampled distance
            # passed t_surf
            pdf_t, _ = _distance_pdfs(st_eff, t_med)
            tr_surf = transmittance(st_eff, t_surf)
            _, p_pass = _distance_pdfs(st_eff, t_surf)
            if use_guided_dist:
                # mixture density for the realized medium event; only the
                # analytic branch can pass the surface, so the pass
                # probability picks up the (1 - beta) selection factor
                pdf_g_t = piecewise_pdf(w_seg, dt_seg, tot_seg, t_med)
                pdf_t = beta * pdf_g_t + (1.0 - beta) * pdf_t
                p_pass = (1.0 - beta) * p_pass
            tr_med = transmittance(st_eff, t_med)
            w_medium = ss_eff * tr_med / jnp.maximum(pdf_t, 1e-30)[..., None]
            w_surface = tr_surf / jnp.maximum(p_pass, 1e-30)[..., None]
            T = jnp.where(
                is_medium[..., None],
                T * w_medium,
                jnp.where((is_surface | escaped)[..., None], T * w_surface, T),
            )
            # escaped: w_surface with t=INF -> 0 unless sigma_t == 0

        # --- environment on escape
        env_L = em_mod.eval_env(em, d, kinds=em_kinds)
        if use_nee:
            w_env = jnp.where(
                prev_delta,
                1.0,
                power_heuristic(
                    prev_pdf,
                    jnp.broadcast_to(em_mod.pdf_env(em, d, kinds=em_kinds), prev_pdf.shape),
                ),
            )
        else:
            w_env = jnp.ones_like(prev_pdf)
        L = jnp.where(escaped[..., None], L + T * env_L * w_env[..., None], L)

        # --- surface shading point (single packed row gather, see Geometry)
        prim = jnp.maximum(hit.prim, 0)
        # sanitized hit distance (miss lanes: INF would NaN-poison AD)
        t_hit = jnp.where(hit.valid, hit.t, 1.0)
        p_surf = o + t_hit[..., None] * d
        row = gather_rows_t(geo.shade_packed, prim)  # (32, N)
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
        mid = row[18].astype(jnp.int32)
        is_emitter = row[19] >= 0.0

        # emissive surface hit (MIS vs NEE; NEE pdf does not include medium
        # attenuation — both strategies share the same Tr factor)
        cos_l = dot(ng, -d)
        Le = jnp.where(
            (is_emitter & (cos_l > 0.0))[..., None],
            jnp.stack([row[20], row[21], row[22]], axis=-1),
            0.0,
        )
        if use_nee:
            d_mis = t_hit + t_acc  # distance through straight pass-throughs
            d2h = d_mis * d_mis
            pdf_nee_hit = row[23] * d2h / jnp.maximum(
                jnp.abs(cos_l) * jnp.maximum(row[25], 1e-12), 1e-12
            )
            pdf_nee_hit = jnp.where(is_emitter, pdf_nee_hit, 0.0)
            w_hit = jnp.where(prev_delta, 1.0, power_heuristic(prev_pdf, pdf_nee_hit))
        else:
            w_hit = jnp.ones_like(prev_pdf)
        L = jnp.where(is_surface[..., None], L + T * Le * w_hit[..., None], L)

        p_med = o + t_med[..., None] * d
        p_event = jnp.where(is_medium[..., None], p_med, p_surf)

        frame = Frame.from_normal(ns)
        wi_local = frame.to_local(-d)

        first = (is_surface | is_medium) & (aux.depth_t == 0.0)
        aux = PathAux(
            albedo=jnp.where(
                first[..., None],
                jnp.where(
                    is_medium[..., None],
                    sigma_s / jnp.maximum(jnp.max(sigma_t), 1e-6),
                    bsdf_mod.albedo(mats, mid),
                ),
                aux.albedo,
            ),
            normal=jnp.where(first[..., None], jnp.where(is_medium[..., None], -d, ns), aux.normal),
            depth_t=jnp.where(first, jnp.where(is_medium, t_med, hit.t), aux.depth_t),
            n_bounces=aux.n_bounces + (is_surface | is_medium).astype(jnp.int32),
            first_le=jnp.where(
                (first & is_surface)[..., None], Le, aux.first_le),
        )

        # --- NEE from the event point (attenuated: volpath.cpp:125-314)
        if use_nee:
            ds = em_mod.sample_direct_jit(em, geo, p_event, u[..., 0:3], kinds=em_kinds)
            # phase / bsdf value toward the light
            ph = phase_eval_kind(-d, ds.direction, g_hg, phase_kind, med)
            wo_local_nee = frame.to_local(ds.direction)
            f_surf, pdf_b_surf = bsdf_mod.eval_pdf(mats, mid, wi_local, wo_local_nee, types=mat_types)
            f_nee = jnp.where(
                is_medium[..., None], ph[..., None] * jnp.ones((1, 3)), f_surf
            )
            pdf_fwd = jnp.where(is_medium, ph, pdf_b_surf)  # phase: pdf == eval
            if guide is not None:
                # MIS against the ACTUAL guided direction strategy (see
                # path.py round-4 bias fix): combined density at the
                # light direction on both surface and medium legs
                from mitsuba_path_guiding_tpu.guiding.grid import (
                    _gather_cells,
                    _mixture_pdf,
                    cell_index,
                )

                pdf_surf_c = guide.pdf_at(
                    guide_state, mats, mid, p_surf, frame, ds.direction,
                    pdf_b_surf)
                alpha_g = getattr(guide, "alpha", 0.5)
                cid_n = cell_index(guide_state, p_med)
                params_n = _gather_cells(guide_state, cid_n)
                a_n = jnp.where(params_n[-1], alpha_g, 0.0)
                pdf_med_c = a_n * _mixture_pdf(params_n, ds.direction) \
                    + (1.0 - a_n) * ph
                pdf_fwd = jnp.where(is_medium, pdf_med_c, pdf_surf_c)
            o_sh = jnp.where(
                is_medium[..., None], p_event, _offset_ray(p_surf, ng, ds.direction)
            )
            t_sh = jnp.where(ds.distance >= INFD, INFD, ds.distance * (1.0 - 1e-3))
            tr_vis = vis_transmittance(o_sh, ds.direction, t_sh, depth)
            w_mis = jnp.where(ds.is_delta, 1.0, power_heuristic(ds.pdf, pdf_fwd))
            contrib = (
                T * f_nee * tr_vis * ds.radiance * (w_mis / jnp.maximum(ds.pdf, 1e-12))[..., None]
            )
            good = (is_medium | is_surface) & (ds.pdf > 0.0)
            L = jnp.where(good[..., None], L + contrib, L)

        # --- continuation sampling: phase (medium) or BSDF (surface),
        # both optionally mixed with the spatio-directional guiding cache
        # (config 4: guided directional sampling in media; distance
        # sampling stays analytic in round 1)
        wo_phase, pdf_phase, w_phase = phase_sample_kind_w(
            -d, g_hg, u[..., 3:5], phase_kind, med
        )
        if guide is None:
            bs = bsdf_mod.sample(mats, mid, wi_local, u[..., 3:6], types=mat_types)
            wo_surf_world = frame.to_world(bs.wo)
            surf_pdf, surf_w, surf_delta = bs.pdf, bs.weight, bs.is_delta
            wo_med, pdf_med = wo_phase, pdf_phase
            w_med = w_phase[..., None] * jnp.ones((1, 3))
        else:
            wo_surf_world, surf_pdf, surf_w, surf_delta = guide(
                guide_state, mats, mid, p_surf, frame, wi_local,
                u[..., 3:6], u[..., 6], u[..., 7],
            )
            # medium: one-sample MIS between phase and the vMF mixture
            from mitsuba_path_guiding_tpu.guiding.grid import (
                _gather_cells,
                _mixture_pdf,
                _mixture_sample,
                cell_index,
            )

            alpha_g = getattr(guide, "alpha", 0.5)
            cid_m = cell_index(guide_state, p_med)
            params_m = _gather_cells(guide_state, cid_m)
            a_m = jnp.where(params_m[-1], alpha_g, 0.0)
            d_gm = _mixture_sample(params_m, u[..., 7], u[..., 3:5])
            take_gm = u[..., 6] < a_m
            wo_med = jnp.where(take_gm[..., None], d_gm, wo_phase)
            ph_val = phase_eval_kind(-d, wo_med, g_hg, phase_kind, med)
            pdf_med = a_m * _mixture_pdf(params_m, wo_med) + (1.0 - a_m) * ph_val
            w_med = (ph_val / jnp.maximum(pdf_med, 1e-8))[..., None] * jnp.ones((1, 3))

        d_next = jnp.where(is_medium[..., None], wo_med, wo_surf_world)
        next_pdf = jnp.where(is_medium, pdf_med, surf_pdf)
        next_delta = jnp.where(is_medium, False, surf_delta)
        T_new = jnp.where(is_medium[..., None], T * w_med, T * surf_w)

        cont = (is_medium | is_surface) & (jnp.max(jnp.abs(T_new), axis=-1) > 0.0) & (
            next_pdf > 0.0
        )

        rr_active = depth >= rr_depth
        q = jnp.clip(jnp.max(T_new, axis=-1), 0.05, 0.95)
        rr_pass = u[..., 8] < q
        T_new = jnp.where(
            (rr_active & cont)[..., None], T_new / jnp.maximum(q, 1e-6)[..., None], T_new
        )
        cont = cont & jnp.where(rr_active, rr_pass, True)

        # straight pass-throughs keep the last real vertex's MIS state
        # (see path.py; null/mask transmission)
        if transparent_shadows:
            straight = next_delta & (dot(d_next, d) > 1.0 - 1e-6)
            next_pdf_c = jnp.where(straight, prev_pdf, next_pdf)
            next_delta_c = jnp.where(straight, prev_delta, next_delta)
            t_acc_new = jnp.where(straight, t_acc + t_hit, 0.0)
        else:
            next_pdf_c, next_delta_c = next_pdf, next_delta
            t_acc_new = jnp.zeros_like(t_acc)

        o_next = jnp.where(
            is_medium[..., None], p_event, _offset_ray(p_surf, ng, wo_surf_world)
        )
        new_carry = (
            jnp.where(cont[..., None], o_next, o),
            jnp.where(cont[..., None], d_next, d),
            L,
            jnp.where(cont[..., None], T_new, T),
            cont,
            jnp.where(cont, next_pdf_c, prev_pdf),
            jnp.where(cont, next_delta_c, prev_delta),
            jnp.where(cont, t_acc_new, t_acc),
            aux,
        )
        if record_paths:
            from mitsuba_path_guiding_tpu.core.spectrum import luminance

            rec = (
                jnp.stack([p_event[..., 0], p_event[..., 1], p_event[..., 2]], axis=0),
                jnp.stack([d_next[..., 0], d_next[..., 1], d_next[..., 2]], axis=0),
                luminance(L),
                luminance(jnp.where(cont[..., None], T_new, T)),
                next_pdf,
                (is_medium | is_surface) & ~next_delta,
            )
        else:
            rec = None
        return new_carry, rec

    carry0 = (
        ray_o, ray_d, L0, T0, alive0, prev_pdf0, prev_delta0,
        jnp.zeros((n,)), aux0,
    )
    carry, recs = jax.lax.scan(bounce, carry0, jnp.arange(max_depth))
    _, _, L, _, _, _, _, _, aux = carry
    record = None
    if record_paths:
        from mitsuba_path_guiding_tpu.core.spectrum import luminance
        from mitsuba_path_guiding_tpu.integrators.path import PathRecord

        rec_pos, rec_dir, rec_lumL, rec_lumT, rec_pdf, rec_valid = recs
        lum_final = luminance(L)[None, :]
        li = jnp.maximum(lum_final - rec_lumL, 0.0) / jnp.maximum(rec_lumT, 1e-6)
        record = PathRecord(pos=rec_pos, dir=rec_dir, li=li, pdf=rec_pdf, valid=rec_valid)
    return L, aux, record
