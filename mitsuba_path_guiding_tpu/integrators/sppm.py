"""Stochastic progressive photon mapping (SPPM), wavefront + grid gather.

TPU-native counterpart of the reference's sppm plugin
(/root/reference/src/integrators/photonmapper/sppm.cpp:414, building on the
photon-shooting infra of gatherproc.h + the kNN PhotonMap, photonmap.h:34).
Re-design per SURVEY §7 step 10 / NEXT.md item 11 — the pointer-chasing
kNN lookups become a *uniform spatial hash*: photons are binned into cells
of twice the initial gather radius, sorted by cell key (one device sort),
and every per-pixel hitpoint scans the 2x2x2 cell neighborhood around its
nearest cell corner with a static per-cell tap budget — all gathers and
segment scans, no dynamic structures.

Per-pixel statistics follow Hachisuka & Jensen 2009: after a pass finding
M new photons within radius R,  N' = N + alpha*M,  R' = R*sqrt(N'/(N+M)),
tau' = (tau + phi) * N'/(N+M); the radiance estimate is
L = L_emitted_avg + tau / (n_total_emitted * pi * R^2).

Hitpoints sit at the first non-delta vertex of each camera path (specular
chains are followed, like the reference's sppm camera pass).  The gather
evaluates the FULL smooth BSDF (sppm.cpp:414 evaluates bsdf->eval per
photon) along two routes:
  - wide/diffuse hitpoints: photon flux is binned into K incident
    directions in the hitpoint frame during the grid scan, then ONE BSDF
    evaluation per (hitpoint, bin) weights the binned flux (K=16: 2
    cos-theta bands x 8 azimuth sectors; diffuse reduces exactly to
    albedo/pi),
  - glossy hitpoints (ROUGH_CONDUCTOR/PHONG/WARD/ROUGH_PLASTIC families):
    TRUE per-photon evaluation — the single-lobe family evals run inside
    the tap scan on pre-gathered hitpoint params (VERDICT r3 item 8; the
    binned route misrepresents lobes narrower than a bin, and the old
    continue-as-specular dodge under MIN_GATHER_ALPHA biased the sampler
    instead of fixing the estimator).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh
from mitsuba_path_guiding_tpu.core.math import Frame, dot, normalize
from mitsuba_path_guiding_tpu.core.rng import bounce_uniform, event_uniform
from mitsuba_path_guiding_tpu.integrators.path import INFD, _offset_ray
from mitsuba_path_guiding_tpu.integrators.ptracer import TAG_EMITTER_RAY
from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.types import BSDFType, SceneData
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

MAX_CELL_TAPS = 32  # photons examined per cell (x8 cells per hitpoint)
GRID_MAX = 512      # cells per axis cap (key fits int32)
N_COS_BANDS = 2     # incident-direction bins for the glossy gather:
N_AZIMUTH = 8       # cos-theta bands x azimuth sectors in the hp frame
N_DIR_BINS = N_COS_BANDS * N_AZIMUTH
# families whose hitpoints use the per-photon eval route (every rough
# single-lobe family; nested/coated families fall back to the bins)
PER_PHOTON_FAMILIES = (
    BSDFType.ROUGH_CONDUCTOR, BSDFType.PHONG, BSDFType.WARD,
    BSDFType.ROUGH_PLASTIC, BSDFType.ROUGH_DIELECTRIC,
    BSDFType.ROUGH_DIFFUSE,
)


def _dir_bin_centers():
    """(K, 3) local-frame unit centers of the incident-direction bins."""
    ct = (np.arange(N_COS_BANDS) + 0.5) / N_COS_BANDS   # cos-theta bands
    # sector s covers az in [-pi + s*2pi/N, ...) — must match gather's
    # (az/2pi + 0.5) mapping
    ph = ((np.arange(N_AZIMUTH) + 0.5) / N_AZIMUTH - 0.5) * 2.0 * np.pi
    ctg, phg = np.meshgrid(ct, ph, indexing="ij")
    st = np.sqrt(np.maximum(1.0 - ctg**2, 0.0))
    return np.stack(
        [st * np.cos(phg), st * np.sin(phg), ctg], axis=-1
    ).reshape(N_DIR_BINS, 3).astype(np.float32)


@partial(jax.jit, static_argnames=("max_depth", "use_bvh", "em_kinds", "mat_types", "width", "height", "sensor_kind"))
def camera_pass(scene, rkeys, width, height, u_pos, pixel_id,
                max_depth=4, use_bvh=False,
                em_kinds=em_mod.ALL_KINDS, mat_types=bsdf_mod.ALL_TYPES,
                sensor_kind=0):
    """Trace camera rays through specular chains to the first non-delta
    vertex.  Returns (hp_pos, hp_ns, hp_albedo, hp_T, hp_valid, L_direct)."""
    geo, bvh, mats, em = scene.geo, scene.bvh, scene.mats, scene.emitters
    o, d, _ = generate_rays(
        scene.sensor, width, height, pixel_id, u_pos, kind=sensor_kind
    )

    def intersect(o_, d_):
        return intersect_bvh(geo, bvh, o_, d_) if use_bvh else intersect_brute(geo, o_, d_)

    n = o.shape[0]
    state = dict(
        o=o, d=d, T=jnp.ones((n, 3)), alive=jnp.ones((n,), bool),
        hp_pos=jnp.zeros((n, 3)), hp_ns=jnp.zeros((n, 3)),
        hp_alb=jnp.zeros((n, 3)), hp_T=jnp.zeros((n, 3)),
        hp_valid=jnp.zeros((n,), bool), L=jnp.zeros((n, 3)),
        hp_mid=jnp.zeros((n,), jnp.int32), hp_wol=jnp.zeros((n, 3)),
    )

    def bounce(carry, depth):
        s = dict(carry)
        u = bounce_uniform(rkeys, depth, 9)
        hit = intersect(s["o"], s["d"])
        act = s["alive"] & hit.valid
        env_L = em_mod.eval_env(em, s["d"], kinds=em_kinds)
        s["L"] = jnp.where(
            (s["alive"] & ~hit.valid)[..., None], s["L"] + s["T"] * env_L, s["L"]
        )
        t_hit = jnp.where(hit.valid, hit.t, 1.0)
        p = s["o"] + t_hit[..., None] * s["d"]
        row = gather_rows_t(geo.shade_packed, jnp.maximum(hit.prim, 0))
        ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
        b0 = 1.0 - hit.u - hit.v
        ns = normalize(jnp.stack([
            b0 * row[3] + hit.u * row[6] + hit.v * row[9],
            b0 * row[4] + hit.u * row[7] + hit.v * row[10],
            b0 * row[5] + hit.u * row[8] + hit.v * row[11]], axis=-1))
        ns = jnp.where(dot(ns, ng)[..., None] < 0.0, -ns, ns)
        mid = row[18].astype(jnp.int32)
        # emission on hit (visible lights + through specular chains)
        cos_l = dot(ng, -s["d"])
        Le = jnp.where(((row[19] >= 0.0) & (cos_l > 0.0))[..., None],
                       jnp.stack([row[20], row[21], row[22]], axis=-1), 0.0)
        s["L"] = jnp.where(act[..., None], s["L"] + s["T"] * Le, s["L"])

        mtype = mats.packed[mid, 0].astype(jnp.int32)
        is_delta_mat = (
            (mtype == BSDFType.CONDUCTOR)
            | (mtype == BSDFType.DIELECTRIC)
            | (mtype == BSDFType.NULL)
            | (mtype == BSDFType.THINDIELECTRIC)
        )
        # record hitpoint at the first smooth vertex (glossy lobes of any
        # width become hitpoints — the gather evaluates them per photon,
        # sppm.cpp:414; no continue-as-specular dodge)
        frame = Frame.from_normal(ns)
        wi_local = frame.to_local(-s["d"])
        rec = act & ~is_delta_mat & ~s["hp_valid"]
        s["hp_pos"] = jnp.where(rec[..., None], p, s["hp_pos"])
        s["hp_ns"] = jnp.where(rec[..., None], ns, s["hp_ns"])
        s["hp_alb"] = jnp.where(rec[..., None], bsdf_mod.albedo_raw(mats, mid), s["hp_alb"])
        s["hp_T"] = jnp.where(rec[..., None], s["T"], s["hp_T"])
        s["hp_mid"] = jnp.where(rec, mid, s["hp_mid"])
        s["hp_wol"] = jnp.where(rec[..., None], wi_local, s["hp_wol"])
        s["hp_valid"] = s["hp_valid"] | rec

        # continue only through delta materials
        bs = bsdf_mod.sample_raw(mats, mid, wi_local, u[..., 3:6], types=mat_types)
        wo_world = frame.to_world(bs.wo)
        cont = act & is_delta_mat & (jnp.max(jnp.abs(bs.weight), axis=-1) > 0.0)
        s["T"] = jnp.where(cont[..., None], s["T"] * bs.weight, s["T"])
        s["o"] = jnp.where(cont[..., None], _offset_ray(p, ng, wo_world), s["o"])
        s["d"] = jnp.where(cont[..., None], wo_world, s["d"])
        s["alive"] = cont
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth))
    return (state["hp_pos"], state["hp_ns"], state["hp_alb"], state["hp_T"],
            state["hp_valid"], state["L"], state["hp_mid"], state["hp_wol"])


@partial(jax.jit, static_argnames=("max_depth", "use_bvh", "em_kinds", "mat_types"))
def photon_pass(scene, rkeys, max_depth=5, use_bvh=False,
                em_kinds=em_mod.ALL_KINDS, mat_types=bsdf_mod.ALL_TYPES):
    """Shoot one wavefront of photons; returns per-deposit arrays
    (pos (D*M, 3), wi (D*M, 3) incident dir, power (D*M, 3), valid,
    caustic (D*M,) — deposit reached through >= 1 all-specular chain,
    the classic photonmapper's caustic-map membership test
    (photonmapper.cpp's separate caustic GatherPhotonProcess)."""
    geo, bvh, mats, em = scene.geo, scene.bvh, scene.mats, scene.emitters

    def intersect(o_, d_):
        return intersect_bvh(geo, bvh, o_, d_) if use_bvh else intersect_brute(geo, o_, d_)

    u0 = event_uniform(rkeys, TAG_EMITTER_RAY, 5)
    rs = em_mod.sample_ray(em, scene.aabb_min, scene.aabb_max, u0, kinds=em_kinds)

    def bounce(carry, depth):
        o, d, T, alive, all_spec = carry
        u = bounce_uniform(rkeys, depth, 9)
        hit = intersect(o, d)
        act = alive & hit.valid
        t_hit = jnp.where(hit.valid, hit.t, 1.0)
        p = o + t_hit[..., None] * d
        row = gather_rows_t(geo.shade_packed, jnp.maximum(hit.prim, 0))
        ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
        b0 = 1.0 - hit.u - hit.v
        ns = normalize(jnp.stack([
            b0 * row[3] + hit.u * row[6] + hit.v * row[9],
            b0 * row[4] + hit.u * row[7] + hit.v * row[10],
            b0 * row[5] + hit.u * row[8] + hit.v * row[11]], axis=-1))
        ns = jnp.where(dot(ns, ng)[..., None] < 0.0, -ns, ns)
        mid = row[18].astype(jnp.int32)
        mtype = mats.packed[mid, 0].astype(jnp.int32)
        is_delta_mat = (
            (mtype == BSDFType.CONDUCTOR)
            | (mtype == BSDFType.DIELECTRIC)
            | (mtype == BSDFType.NULL)
            | (mtype == BSDFType.THINDIELECTRIC)
        )
        # deposit on smooth surfaces (photonmap stores at diffuse hits)
        deposit = act & ~is_delta_mat
        out = (p, -d, T, deposit, all_spec & (depth > 0))

        frame = Frame.from_normal(ns)
        wi_local = frame.to_local(-d)
        bs = bsdf_mod.sample_raw(mats, mid, wi_local, u[..., 3:6], types=mat_types)
        wo_world = frame.to_world(bs.wo)
        T_new = T * bs.weight
        # RR keeps photon powers bounded (gatherproc-style)
        q = jnp.clip(jnp.max(bs.weight, axis=-1), 0.05, 0.95)
        rr = u[..., 8] < q
        T_new = T_new / jnp.maximum(q, 1e-6)[..., None]
        cont = act & rr & (bs.pdf > 0.0) & (jnp.max(jnp.abs(T_new), axis=-1) > 0.0)
        carry_new = (
            jnp.where(cont[..., None], _offset_ray(p, ng, wo_world), o),
            jnp.where(cont[..., None], wo_world, d),
            jnp.where(cont[..., None], T_new, T),
            cont,
            all_spec & bs.is_delta,
        )
        return carry_new, out

    carry0 = (rs.o, rs.d, jnp.where(rs.valid[..., None], rs.weight, 0.0),
              rs.valid, jnp.ones_like(rs.valid))
    _, outs = jax.lax.scan(bounce, carry0, jnp.arange(max_depth))
    pos, wi, pw, ok, caus = outs
    D, M = ok.shape
    return (pos.reshape(D * M, 3), wi.reshape(D * M, 3),
            pw.reshape(D * M, 3), ok.reshape(D * M), caus.reshape(D * M))


def _cell_coords(p, lo, inv_cell, G):
    c = jnp.floor((p - lo) * inv_cell).astype(jnp.int32)
    return jnp.clip(c, 0, G - 1)


def _cell_key(c, G):
    return (c[..., 0] * G + c[..., 1]) * G + c[..., 2]


@partial(jax.jit, static_argnames=("G", "narrow_types"))
def gather(hp_pos, hp_ns, hp_R, ph_pos, ph_wi, ph_pw, ph_ok, lo, inv_cell, G,
           hp_p=None, hp_wol=None, narrow_types=()):
    """Per-hitpoint photon gather.  Returns (M_count (N,), phi (N,K,3),
    phi_pp (N,3)) — photon count, flux sums binned by incident direction
    in the hitpoint frame (K = N_DIR_BINS), and the per-photon-evaluated
    f-weighted flux for the ``narrow_types`` families (sppm.cpp:414
    bsdf->eval per photon; ``hp_p`` is the pre-gathered material row as a
    bsdf._P, ``hp_wol`` the camera direction in the hitpoint frame)."""
    from mitsuba_path_guiding_tpu.models.bsdf import (
        _eval_smooth,
        _flip_two_sided,
    )
    key_ph = jnp.where(ph_ok, _cell_key(_cell_coords(ph_pos, lo, inv_cell, G), G), jnp.int32(2**30))
    # randomize within-cell order (stable argsort would put depth-0
    # deposits first, breaking the exchangeability the subsample reweight
    # needs — direct photons carry systematically different power)
    m = key_ph.shape[0]
    perm = jax.random.permutation(jax.random.PRNGKey(17), m)
    key_ph = key_ph[perm]
    ph_pos = ph_pos[perm]
    ph_wi = ph_wi[perm]
    ph_pw = ph_pw[perm]
    order = jnp.argsort(key_ph)
    skeys = key_ph[order]
    sp_pos = ph_pos[order]
    sp_wi = ph_wi[order]
    sp_pw = ph_pw[order]

    # 2x2x2 neighborhood around the nearest cell corner (cell size 2R_init
    # guarantees the R-ball fits in those 8 cells)
    base = jnp.floor((hp_pos - lo) * inv_cell - 0.5).astype(jnp.int32)
    n_hp = hp_pos.shape[0]
    count = jnp.zeros(n_hp, jnp.float32)
    phi = jnp.zeros((n_hp, N_DIR_BINS, 3), jnp.float32)
    phi_pp = jnp.zeros((n_hp, 3), jnp.float32)
    hp_frame = Frame.from_normal(hp_ns)
    bin_ids = jnp.arange(N_DIR_BINS)
    if narrow_types:
        # hoisted two-sided flip for the in-scan family evals
        wi2_pp, s_pp = _flip_two_sided(hp_p, hp_wol)
    r2 = hp_R * hp_R
    m_total = skeys.shape[0]
    seen_keys = []
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                c = jnp.clip(base + jnp.asarray([ox, oy, oz]), 0, G - 1)
                key = _cell_key(c, G)
                # clipping at grid borders can collapse two offsets onto
                # the same cell — scanning it twice would double count
                dup = jnp.zeros(key.shape, bool)
                for prev in seen_keys:
                    dup = dup | (key == prev)
                seen_keys.append(key)
                key = jnp.where(dup, jnp.int32(-1), key)
                start = jnp.searchsorted(skeys, key, side="left")
                end = jnp.searchsorted(skeys, key, side="right")
                cell_n = (end - start).astype(jnp.float32)
                # dense cells: scan the first K deposits and reweight by
                # cell_n/K — the prefix is exchangeable with the rest
                # (photon order is independent of position inside a cell),
                # so the subsample estimate stays unbiased
                scale = jnp.maximum(cell_n / MAX_CELL_TAPS, 1.0)
                for j in range(MAX_CELL_TAPS):
                    idx = jnp.minimum(start + j, m_total - 1)
                    okk = (start + j < end) & (start + j < m_total)
                    dp = sp_pos[idx] - hp_pos
                    d2 = jnp.sum(dp * dp, axis=-1)
                    front = dot(hp_ns, sp_wi[idx]) > 0.0
                    # disc gather: reject photons off the tangent plane
                    # (photonmap.h's kNN over surface photons implicitly
                    # does this via normal-aware lookups; a 3D ball would
                    # over-count at corners)
                    planar = jnp.abs(dot(dp, hp_ns)) <= 0.1 * hp_R
                    sel = okk & (d2 <= r2) & front & planar
                    count = count + jnp.where(sel, scale, 0.0)
                    # bin by incident direction in the hitpoint frame
                    wil = hp_frame.to_local(sp_wi[idx])
                    band = jnp.clip(
                        (wil[..., 2] * N_COS_BANDS).astype(jnp.int32),
                        0, N_COS_BANDS - 1)
                    az = jnp.arctan2(wil[..., 1], wil[..., 0])
                    sector = jnp.clip(
                        ((az / (2.0 * jnp.pi) + 0.5) * N_AZIMUTH).astype(jnp.int32),
                        0, N_AZIMUTH - 1)
                    b = band * N_AZIMUTH + sector
                    onehot = (b[:, None] == bin_ids[None, :])  # (N, K)
                    contrib = (sp_pw[idx] * scale[..., None])[:, None, :]
                    phi = phi + jnp.where(
                        (sel[:, None] & onehot)[..., None], contrib, 0.0)
                    if narrow_types:
                        # per-photon eval: f(camera, photon) on the
                        # single-lobe rough families; _eval_smooth
                        # returns f*cos(wo) — divide the photon-side
                        # cosine back out (flux carries arrival geometry)
                        wo2 = jnp.stack(
                            [wil[..., 0], wil[..., 1], wil[..., 2] * s_pp],
                            axis=-1)
                        f_pp, _ = _eval_smooth(hp_p, wi2_pp, wo2,
                                               narrow_types)
                        f_pp = f_pp / jnp.maximum(
                            jnp.abs(wil[..., 2]), 1e-3)[..., None]
                        phi_pp = phi_pp + jnp.where(
                            sel[..., None],
                            f_pp * sp_pw[idx] * scale[..., None], 0.0)
    return count, phi, phi_pp


def render_sppm(scene: SceneData, cfg, n_iterations: int = 8,
                photons_per_iter: int = 1 << 17, alpha: float = 0.7,
                r_init: float | None = None):
    """Full SPPM render; returns (H, W, 3)."""
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
    if r_init is None:
        r_init = 2.5 * extent / max(w, h)
    cell = 2.0 * r_init
    G = min(int(np.ceil(extent / cell)) + 1, GRID_MAX)
    inv_cell = 1.0 / cell

    N_stat = jnp.zeros((n_pix,))
    R_stat = jnp.full((n_pix,), r_init)
    tau = jnp.zeros((n_pix, 3))
    L_direct = jnp.zeros((n_pix, 3))
    key = rng.base_key(cfg.seed)
    pix = jnp.arange(n_pix, dtype=jnp.int32)

    for it in range(n_iterations):
        rk_cam = rng.ray_keys(key, pix, jnp.full((n_pix,), it, jnp.int32))
        u_pos = event_uniform(rk_cam, 1 << 20, 2)
        (hp_pos, hp_ns, hp_alb, hp_T, hp_valid, L_em,
         hp_mid, hp_wol) = camera_pass(
            scene, rk_cam, w, h, u_pos, pix,
            max_depth=cfg.max_depth, use_bvh=use_bvh,
            em_kinds=em_kinds, mat_types=mat_types,
            sensor_kind=int(scene.sensor.kind),
        )
        L_direct = L_direct + L_em

        rk_ph = rng.ray_keys(
            key,
            jnp.arange(photons_per_iter, dtype=jnp.int32) + (1 << 24),
            jnp.full((photons_per_iter,), it, jnp.int32),
        )
        ph_pos, ph_wi, ph_pw, ph_ok, _ = photon_pass(
            scene, rk_ph, max_depth=cfg.max_depth, use_bvh=use_bvh,
            em_kinds=em_kinds, mat_types=mat_types,
        )
        narrow_types = tuple(
            t for t in PER_PHOTON_FAMILIES if t in mat_types
        )
        hp_p = bsdf_mod.gather_params(scene.mats, hp_mid) \
            if narrow_types else None
        M_new, phi, phi_pp = gather(
            hp_pos, hp_ns, R_stat, ph_pos, ph_wi, ph_pw, ph_ok,
            lo, inv_cell, G,
            hp_p=hp_p, hp_wol=hp_wol, narrow_types=narrow_types,
        )
        M_new = jnp.where(hp_valid, M_new, 0.0)
        # full-BSDF gather: one smooth-lobe evaluation per direction bin
        # against the camera direction (sppm.cpp:414 bsdf->eval), applied
        # to the binned flux.  eval_pdf_raw returns f*cos(wo); divide by
        # the bin center's cos to get plain f (flux already carries the
        # arrival geometry).
        centers = jnp.asarray(_dir_bin_centers())
        phi_f = jnp.zeros((n_pix, 3))
        for k in range(N_DIR_BINS):
            ck = jnp.broadcast_to(centers[k], hp_wol.shape)
            fk, _ = bsdf_mod.eval_pdf_raw(
                scene.mats, hp_mid, hp_wol, ck, types=mat_types)
            phi_f = phi_f + fk / centers[k, 2] * phi[:, k, :]
        if narrow_types:
            # glossy families take the per-photon route (sppm.cpp:414)
            mtype_hp = scene.mats.packed[hp_mid, 0].astype(jnp.int32)
            use_pp = jnp.zeros_like(hp_valid)
            for t in narrow_types:
                use_pp = use_pp | (mtype_hp == t)
            phi_f = jnp.where(use_pp[..., None], phi_pp, phi_f)
        phi = jnp.where(
            hp_valid[..., None], hp_T * phi_f / photons_per_iter, 0.0,
        )
        # Hachisuka-Jensen statistics update
        N_new = N_stat + alpha * M_new
        denom = jnp.maximum(N_stat + M_new, 1e-8)
        ratio = jnp.where(M_new > 0, N_new / denom, 1.0)
        R_stat = R_stat * jnp.sqrt(ratio)
        tau = (tau + phi) * ratio[..., None]

    L_ind = tau / (jnp.pi * (R_stat * R_stat)[..., None] * n_iterations)
    img = (L_direct / n_iterations + L_ind).reshape(h, w, 3)
    return img
