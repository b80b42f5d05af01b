"""Fused path-tracing megakernel for VMEM-resident scenes.

The TPU answer to the reference's megakernel ``Li()`` recursion
(/root/reference/src/integrators/path/path.cpp:119-290): for scenes whose
tables fit VMEM (tris, materials, emitters, guiding grid), the ENTIRE
bounce loop runs inside ONE pallas kernel over lane tiles.  The wavefront
XLA path (integrators/path.py) splits each bounce into ~30 separate
fusions, each streaming full [N]-sized intermediates through HBM — the
round-4/5 profiles put the Cornell headline wave at 12% of HBM peak and
0.1% of flop peak, i.e. pure fusion-fragmentation overhead.  Here the
per-bounce state (o, d, L, T, pdf flags) never leaves VMEM; per-wave HBM
traffic collapses to one read of the input rays and one write of the
radiance/aux rows.

Hot-op mapping (pallas_guide.md):
  - ray-triangle intersection  -> ONE f32 (TILE,16)x(16,5T) MXU matmul per
    bounce (Moeller-Trumbore factored through Pluecker coordinates, same
    bilinear decomposition as ops/intersect_pairs.py's 'plk' engine), with
    the winner re-evaluated exactly by classic MT in-kernel;
  - shadow rays                -> a second any-hit matmul;
  - winner/material/emitter row fetches -> one-hot MXU matmuls at
    precision=HIGHEST (exact; the round-4 bf16-quantization lesson,
    ops/gather_pallas.py);
  - guiding-cache row fetch    -> chunked bf16 one-hot matmul against the
    (41, C) packed mixture table (bf16 x {0,1} one-hot accumulated in f32
    is exact for bf16-stored parameters);
  - everything else (frames, BSDF, vMF mixture, MIS, RR) -> VPU math on
    (TILE,) lanes.

RNG: raw threefry2x32-20 on the per-ray keys produced by core.rng.ray_keys
(counter-based, device-placement-free), drawn per (depth, dim-pair) — the
same logical stream structure as core/rng.bounce_uniform, not bit-identical
to jax.random's padding conventions (tests compare images statistically;
tests/test_fused_path.py pins the threefry bits against a NumPy oracle).

Scope (``fused_supported``): diffuse-only materials, area emitters only,
no participating medium, no env light, optional vMF guiding at refinement
level 0.  Everything else stays on the general wavefront path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_path_guiding_tpu.scene.types import BSDFType, EmitterKind, SceneData

TILE = 1024          # lanes per grid step
EPS_T = 1e-4         # matches accel.traverse.EPS_T
INFD = 3.0e37          # python floats: jnp scalars would be captured consts
INF = float("inf")
GUIDE_CHUNK = 2048    # one-hot rows per guide-gather matmul chunk

# output row layout (see trace_fused)
_OUT_ROWS = 16


# ---------------------------------------------------------------------------
# threefry2x32-20 (Salmon et al. 2011), vector u32 lanes
# ---------------------------------------------------------------------------

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1, rounds: int = 20):
    """Threefry-2x32 of counter (x0,x1) under key (k0,k1).

    20 rounds = the crypto-strength default (matches jax.random);
    13 rounds = Salmon et al. 2011's recommended statistical minimum
    (passes BigCrush) — the kernel's per-bounce draws use it (~0.5ms/wave
    cheaper at 524k lanes with no measurable estimator change)."""
    ks0, ks1 = k0, k1
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)
    x0 = x0 + ks0
    x1 = x1 + ks1
    for d in range((rounds + 3) // 4):
        for i in range(min(4, rounds - 4 * d)):
            r = _ROT[(d % 2) * 4 + i]
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(d + 1) % 3]
        x1 = x1 + ks[(d + 2) % 3] + jnp.uint32(d + 1)
    return x0, x1


def _bits_to_unit(bits):
    """uint32 -> float32 in [0, 1) (mantissa trick, as jax.random)."""
    f = jax.lax.bitcast_convert_type(
        jnp.uint32(0x3F800000) | (bits >> jnp.uint32(9)), jnp.float32
    )
    return f - 1.0


# ---------------------------------------------------------------------------
# kernel-local vector helpers: vectors are triples of (TILE,) f32 arrays
# ---------------------------------------------------------------------------

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _normalize3(v):
    inv = jax.lax.rsqrt(jnp.maximum(_dot3(v, v), 1e-30))
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def _where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _scale3(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul3(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _frame(n):
    """Duff et al. branchless ONB (core.math.Frame.from_normal)."""
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    s = (1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0])
    t = (b, sign + n[1] * n[1] * a, -n[1])
    return s, t, n


def _to_local(s, t, n, v):
    return (_dot3(v, s), _dot3(v, t), _dot3(v, n))


def _to_world(s, t, n, v):
    return (
        v[0] * s[0] + v[1] * t[0] + v[2] * n[0],
        v[0] * s[1] + v[1] * t[1] + v[2] * n[1],
        v[0] * s[2] + v[1] * t[2] + v[2] * n[2],
    )


def _power_heuristic(pa, pb):
    a2 = pa * pa
    w = a2 / jnp.maximum(a2 + pb * pb, 1e-30)
    return jnp.where(pa > 0.0, w, 0.0)


def _cosine_hemisphere(u0, u1):
    """Shirley-Chiu concentric disk + Malley (core.warp)."""
    x = 2.0 * u0 - 1.0
    y = 2.0 * u1 - 1.0
    zero = (x == 0.0) & (y == 0.0)
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    sdiv = lambda a, b: a / jnp.where(jnp.abs(b) < 1e-12, 1.0, b)
    phi = jnp.where(
        use_x,
        (jnp.pi / 4.0) * sdiv(y, x),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * sdiv(x, y),
    )
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    px = r * jnp.cos(phi)
    py = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - px * px - py * py, 0.0))
    return (px, py, z)


def _vmf_pdf(t, kappa):
    """Exp-normalized vMF pdf at cos angle t (guiding.grid._vmf_pdf_kn).
    expm1 has no Mosaic lowering; 1-exp is adequate here (kappa >= ~1 in
    fitted cells, and the kappa->0 branch is handled by the norm select)."""
    kk = jnp.clip(kappa, 0.0, 1e4)
    denom = 2.0 * jnp.pi * (1.0 - jnp.exp(-2.0 * kk))
    norm = jnp.where(kk > 1e-6, kk / jnp.maximum(denom, 1e-30),
                     jnp.float32(1.0 / (4.0 * np.pi)))
    return norm * jnp.exp(kk * (jnp.clip(t, -1.0, 1.0) - 1.0))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _onehot_gather(table_ref, idx, n_rows, out_rows, dtype=jnp.float32,
                   chunk=None):
    """rows (out_rows, TILE) = table (out_rows, n_rows) @ onehot(n_rows, TILE).

    f32 tables use precision=HIGHEST (exact row selection — the round-4
    bf16-quantization bug class); bf16 tables are exact at one pass."""
    tile = idx.shape[0]
    if chunk is None or chunk >= n_rows:
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (n_rows, tile), 0)
            == idx[None, :]
        ).astype(dtype)
        return jax.lax.dot_general(
            table_ref[...], oh, (((1,), (0,)), ((), ())),
            precision=(jax.lax.Precision.HIGHEST if dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT),
            preferred_element_type=jnp.float32,
        )
    acc = jnp.zeros((table_ref.shape[0], tile), jnp.float32)
    for c in range(0, n_rows, chunk):
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, tile), 0)
            == (idx[None, :] - c)
        ).astype(dtype)
        acc = acc + jax.lax.dot_general(
            table_ref[:, c : c + chunk], oh, (((1,), (0,)), ((), ())),
            precision=(jax.lax.Precision.HIGHEST if dtype == jnp.float32
                       else jax.lax.Precision.DEFAULT),
            preferred_element_type=jnp.float32,
        )
    return acc


def _intersect_mxu(tri_cols_ref, o, d, tmax, n_tri, t_pad, any_hit):
    """One MXU matmul intersection of TILE rays against all triangles.

    tri_cols (16, 5*t_pad): the 'plk' bilinear factorization
    (accel/pairs.py:181-201).  Returns (t_best, prim, valid) or occluded.

    Layout rule (measured 3x on this kernel): the matmul output keeps RAYS
    ON THE LANE AXIS — (5*t_pad, TILE), candidates on sublanes — so every
    epilogue op that mixes per-candidate rows with per-lane state
    (tmax, t_best) broadcasts along sublanes for free.  The transposed
    orientation ((TILE, 5T)) makes each of those a lane<->sublane shuffle.
    The winner is found with ONE packed-key min-reduce: the candidate tid
    is stuffed into the low 6 mantissa bits of t (ranking error < 2^-17
    relative, settled by the exact in-kernel MT re-eval of the winner)."""
    tile = o[0].shape[0]
    m = _cross3(o, d)  # moment o x d
    one = jnp.ones((tile,), jnp.float32)
    zero = jnp.zeros((tile,), jnp.float32)
    pd16 = jnp.stack(
        [d[0], d[1], d[2], m[0], m[1], m[2], o[0], o[1], o[2], one,
         zero, zero, zero, zero, zero, zero], axis=0,
    )  # (16, TILE)
    acc = jax.lax.dot_general(
        tri_cols_ref[...], pd16, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (5*t_pad, TILE) — candidates on sublanes, rays on lanes
    s0 = acc[0 * t_pad : 1 * t_pad]
    s1 = acc[1 * t_pad : 2 * t_pad]
    s2 = acc[2 * t_pad : 3 * t_pad]
    num = acc[3 * t_pad : 4 * t_pad]
    den = acc[4 * t_pad : 5 * t_pad]
    smin = jnp.minimum(jnp.minimum(s0, s1), s2)
    smax = jnp.maximum(jnp.maximum(s0, s1), s2)
    if any_hit:
        inside = (smin >= 0.0) | (smax <= 0.0)
    else:
        eps = 1e-6 * (jnp.abs(s0) + jnp.abs(s1) + jnp.abs(s2))
        inside = (smin >= -eps) | (smax <= eps)
    ok_den = den != 0.0
    t = num / jnp.where(ok_den, den, 1.0)
    tid_real = (
        jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 0) < n_tri
    )
    hit = inside & ok_den & (t > EPS_T) & (t < tmax[None, :]) & tid_real
    if any_hit:
        return jnp.any(hit, axis=0)
    t = jnp.where(hit, t, INF)
    # packed-key winner: low ceil(log2(t_pad)) mantissa bits carry the
    # candidate id (t > EPS_T > 0, so int order == float order)
    bits = max((t_pad - 1).bit_length(), 1)
    lo_mask = (1 << bits) - 1
    tid = jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 0)
    key = (
        (jax.lax.bitcast_convert_type(t, jnp.int32) & jnp.int32(~lo_mask))
        | tid
    )
    key_best = jnp.min(key, axis=0)
    t_best = jax.lax.bitcast_convert_type(
        key_best & jnp.int32(~lo_mask), jnp.float32
    )
    prim = key_best & jnp.int32(lo_mask)
    valid = t_best < INF
    return jnp.where(valid, t_best, INF), jnp.where(valid, prim, -1), valid


def _mt_exact(tri, o, d):
    """Classic Moeller-Trumbore for the WINNING triangle rows (exact f32;
    the matmul's candidate t is only used for the argmin).  tri rows:
    0:3 p0, 3:6 e1, 6:9 e2."""
    p0 = (tri[0], tri[1], tri[2])
    e1 = (tri[3], tri[4], tri[5])
    e2 = (tri[6], tri[7], tri[8])
    pvec = _cross3(d, e2)
    det = _dot3(e1, pvec)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    tvec = _sub3(o, p0)
    u = _dot3(tvec, pvec) * inv
    qvec = _cross3(tvec, e1)
    v = _dot3(d, qvec) * inv
    t = _dot3(e2, qvec) * inv
    return t, u, v


def _make_kernel(max_depth, rr_depth, n_tri, t_pad, n_em, e_pad, n_mat,
                 m_pad, guided, alpha, n_cells, use_rr):
    """Builds the fused kernel closure (all sizes static)."""

    def kernel(meta_ref, rays_ref, keys_ref, tri_cols_ref, tri_shade_ref,
               em_ref, mat_ref, guide_ref, out_ref):
        tile = rays_ref.shape[1]
        o = (rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
        d = (rays_ref[3, :], rays_ref[4, :], rays_ref[5, :])
        k0 = keys_ref[0, :]
        k1 = keys_ref[1, :]

        L = (jnp.zeros((tile,)),) * 3
        T = (jnp.ones((tile,)),) * 3
        alive = rays_ref[6, :] > 0.0
        prev_pdf = jnp.full((tile,), INFD)
        prev_delta = jnp.ones((tile,), bool)
        a_alb = (jnp.zeros((tile,)),) * 3
        a_nrm = (jnp.zeros((tile,)),) * 3
        a_dep = jnp.zeros((tile,))
        a_nb = jnp.zeros((tile,))
        a_fle = (jnp.zeros((tile,)),) * 3

        # guiding-grid meta (SMEM): aabb_min, scale = res/extent, res
        g_lo = (meta_ref[0], meta_ref[1], meta_ref[2])
        g_sc = (meta_ref[3], meta_ref[4], meta_ref[5])
        g_res = meta_ref[6]

        for depth in range(max_depth):
            # --- 10 uniforms (5 threefry blocks) for this bounce; dims
            # 0:3 NEE, 3:6 BSDF, 6 guide-select, 7 guide-lobe, 8 RR
            u = []
            for blk in range(5):
                b0, b1 = threefry2x32(
                    k0, k1,
                    jnp.full((tile,), depth, jnp.uint32),
                    jnp.full((tile,), blk, jnp.uint32),
                    rounds=13,
                )
                u.append(_bits_to_unit(b0))
                u.append(_bits_to_unit(b1))

            # --- closest hit (one MXU matmul + exact winner re-eval)
            tmax = jnp.where(alive, INFD, -1.0)
            t_mm, prim, valid = _intersect_mxu(
                tri_cols_ref, o, d, tmax, n_tri, t_pad, any_hit=False
            )
            act = alive & valid
            prim_c = jnp.maximum(prim, 0)
            srow = _onehot_gather(tri_shade_ref, prim_c, t_pad, 32)
            t_ex, hu, hv = _mt_exact(srow[0:9], o, d)
            t_hit = jnp.where(valid, jnp.maximum(t_ex, EPS_T), 1.0)
            p = _add3(o, _scale3(d, t_hit))
            ng = (srow[9], srow[10], srow[11])
            b0c = 1.0 - hu - hv
            ns = _normalize3((
                b0c * srow[12] + hu * srow[15] + hv * srow[18],
                b0c * srow[13] + hu * srow[16] + hv * srow[19],
                b0c * srow[14] + hu * srow[17] + hv * srow[20],
            ))
            ns = _where3(_dot3(ns, ng) < 0.0, _scale3(ns, -1.0), ns)
            mid = srow[21].astype(jnp.int32)
            is_em = srow[22] >= 0.0
            le = (srow[23], srow[24], srow[25])
            em_pmf = srow[26]
            area = srow[27]

            # --- emissive hit MIS (path.py:379-400)
            cos_l = _dot3(ng, _scale3(d, -1.0))
            emit = is_em & (cos_l > 0.0)
            dist2 = t_hit * t_hit
            pdf_nee_hit = em_pmf * dist2 / jnp.maximum(
                jnp.abs(cos_l) * jnp.maximum(area, 1e-12), 1e-12
            )
            pdf_nee_hit = jnp.where(is_em, pdf_nee_hit, 0.0)
            w_hit = jnp.where(prev_delta, 1.0,
                              _power_heuristic(prev_pdf, pdf_nee_hit))
            gain = jnp.where(act & emit, w_hit, 0.0)
            L = _add3(L, _mul3(T, _scale3(le, gain)))

            # --- material row + first-hit AOVs
            mrow = _onehot_gather(mat_ref, jnp.clip(mid, 0, n_mat - 1),
                                  m_pad, 8)
            refl = (mrow[1], mrow[2], mrow[3])
            first = act & (a_dep == 0.0)
            a_alb = _where3(first, refl, a_alb)
            a_nrm = _where3(first, ns, a_nrm)
            a_dep = jnp.where(first, t_hit, a_dep)
            a_nb = a_nb + act.astype(jnp.float32)
            a_fle = _where3(first, _scale3(le, emit.astype(jnp.float32)),
                            a_fle)

            fs, ft, fn = _frame(ns)
            wi_l = _to_local(fs, ft, fn, _scale3(d, -1.0))

            # --- guiding-cache row fetch (one chunked bf16 one-hot/bounce)
            if guided:
                qx = jnp.clip((p[0] - g_lo[0]) * g_sc[0], 0.0, g_res - 1.0)
                qy = jnp.clip((p[1] - g_lo[1]) * g_sc[1], 0.0, g_res - 1.0)
                qz = jnp.clip((p[2] - g_lo[2]) * g_sc[2], 0.0, g_res - 1.0)
                cid = (
                    (qx.astype(jnp.int32) * jnp.int32(g_res)
                     + qy.astype(jnp.int32)) * jnp.int32(g_res)
                    + qz.astype(jnp.int32)
                )
                grow = _onehot_gather(guide_ref, cid, n_cells, 41,
                                      dtype=jnp.bfloat16, chunk=GUIDE_CHUNK)
                K = 8
                gmx, gmy, gmz = grow[0:K], grow[K:2 * K], grow[2 * K:3 * K]
                gkap = grow[3 * K:4 * K]
                glogw = grow[4 * K:5 * K]
                gvalid = grow[5 * K] > 0.5
                g_ascale = grow[5 * K + 1]
                wmax = jnp.max(glogw, axis=0, keepdims=True)
                we = jnp.exp(glogw - wmax)
                gw = we / jnp.maximum(jnp.sum(we, axis=0, keepdims=True),
                                      1e-30)

                def mix_pdf(dv):
                    t = (gmx * dv[0][None] + gmy * dv[1][None]
                         + gmz * dv[2][None])
                    pdf = jnp.sum(gw * _vmf_pdf(t, gkap), axis=0)
                    return jnp.where(gvalid, pdf,
                                     jnp.float32(1.0 / (4.0 * np.pi)))

                a_g = jnp.where(gvalid, jnp.float32(alpha) * g_ascale, 0.0)
            else:
                mix_pdf = None
                a_g = jnp.zeros((tile,))

            # --- NEE (area emitters only; emitter.py sample_direct).
            # CDF inversion as a dense compare-sum (emitter._pick_emitter):
            # pad rows carry cdf = 2.0 so they never count.
            cdf_row = em_ref[31, :]  # (e_pad,)
            eid = jnp.sum(
                (cdf_row[:, None] <= u[0][None, :]).astype(jnp.int32), axis=0
            )
            eid = jnp.clip(eid, 0, n_em - 1)
            erow = _onehot_gather(em_ref, eid, e_pad, 32)
            # uniform point on the emissive triangle
            su = jnp.sqrt(jnp.maximum(u[1], 0.0))
            tb0 = 1.0 - su
            tb1 = u[2] * su
            q = (
                erow[14] + tb0 * erow[17] + tb1 * erow[20],
                erow[15] + tb0 * erow[18] + tb1 * erow[21],
                erow[16] + tb0 * erow[19] + tb1 * erow[22],
            )
            eng = (erow[23], erow[24], erow[25])
            to_q = _sub3(q, p)
            nee_d2 = jnp.maximum(_dot3(to_q, to_q), 1e-12)
            nee_dist = jnp.sqrt(nee_d2)
            nee_dir = _scale3(to_q, 1.0 / nee_dist)
            cos_e = _dot3(eng, _scale3(nee_dir, -1.0))
            e_area = jnp.maximum(erow[13], 1e-12)
            nee_pdf = erow[1] * nee_d2 / jnp.maximum(
                jnp.abs(cos_e) * e_area, 1e-12
            )
            nee_rad_on = (cos_e > 0.0).astype(jnp.float32)
            nee_rad = _scale3((erow[2], erow[3], erow[4]), nee_rad_on)
            # diffuse eval at the NEE direction
            wo_nee_l = _to_local(fs, ft, fn, nee_dir)
            up_nee = (wi_l[2] > 0.0) & (wo_nee_l[2] > 0.0)
            f_nee = _scale3(
                refl,
                jnp.where(up_nee, jnp.maximum(wo_nee_l[2], 0.0) / jnp.pi,
                          0.0),
            )
            pdf_b_nee = jnp.where(up_nee,
                                  jnp.maximum(wo_nee_l[2], 0.0) / jnp.pi,
                                  0.0)
            if guided:
                pdf_dir_nee = a_g * mix_pdf(nee_dir) + (1.0 - a_g) * pdf_b_nee
            else:
                pdf_dir_nee = pdf_b_nee
            # shadow ray (any-hit matmul)
            off = jnp.where(_dot3(ng, nee_dir) >= 0.0, 1e-4, -1e-4)
            o_sh = _add3(p, _scale3(ng, off))
            t_sh = jnp.where(act, nee_dist * (1.0 - 1e-3), -1.0)
            occ = _intersect_mxu(tri_cols_ref, o_sh, nee_dir, t_sh, n_tri,
                                 t_pad, any_hit=True)
            vis = 1.0 - occ.astype(jnp.float32)
            w_mis = _power_heuristic(nee_pdf, pdf_dir_nee)
            gain_nee = vis * w_mis / jnp.maximum(nee_pdf, 1e-12)
            good = act & (vis > 0.0) & (nee_pdf > 0.0)
            gain_nee = jnp.where(good, gain_nee, 0.0)
            L = _add3(L, _mul3(T, _mul3(f_nee, _scale3(nee_rad, gain_nee))))

            # --- BSDF / guided direction sampling (guiding.sampler.guide)
            wo_cos = _cosine_hemisphere(u[3], u[4])
            pdf_cos = jnp.maximum(wo_cos[2], 0.0) / jnp.pi
            if guided:
                # pick the lobe by CDF inversion over gw, vMF-sample it
                # cumsum has no Mosaic lowering; unroll over K=8 rows
                cdf_rows = []
                run = jnp.zeros_like(gw[0])
                for kk_i in range(K):
                    run = run + gw[kk_i]
                    cdf_rows.append(run)
                cdf = jnp.stack(cdf_rows, axis=0)
                ksel = jnp.sum((u[7][None, :] > cdf).astype(jnp.int32),
                               axis=0)
                ksel = jnp.clip(ksel, 0, K - 1)
                onehot_k = (
                    jax.lax.broadcasted_iota(jnp.int32, gw.shape, 0)
                    == ksel[None, :]
                ).astype(jnp.float32)
                mu_k = (
                    jnp.sum(onehot_k * gmx, axis=0),
                    jnp.sum(onehot_k * gmy, axis=0),
                    jnp.sum(onehot_k * gmz, axis=0),
                )
                kap_k = jnp.sum(onehot_k * gkap, axis=0)
                # vmf_sample (core/vmf.py): stable inverse-CDF in w
                KAPPA_MIN = 1e-3
                kk = jnp.clip(kap_k, 0.0, 1e4)
                u0c = jnp.clip(u[3], 1e-7, 1.0 - 1e-7)
                safe_k = jnp.maximum(kk, KAPPA_MIN)
                wz = 1.0 + jnp.log(
                    u0c + (1.0 - u0c) * jnp.exp(-2.0 * safe_k)
                ) / safe_k
                wz = jnp.where(kk > KAPPA_MIN, wz, 1.0 - 2.0 * u0c)
                wz = jnp.clip(wz, -1.0, 1.0)
                rr_ = jnp.sqrt(jnp.maximum(1.0 - wz * wz, 0.0))
                phi_v = 2.0 * jnp.pi * u[4]
                vloc = (rr_ * jnp.cos(phi_v), rr_ * jnp.sin(phi_v), wz)
                ms, mt_, mn = _frame(_normalize3(mu_k))
                d_vmf = _to_world(ms, mt_, mn, vloc)
                # invalid cells: uniform-sphere fallback (grid.py:222-228)
                zu = 1.0 - 2.0 * u[3]
                ru = jnp.sqrt(jnp.maximum(1.0 - zu * zu, 0.0))
                d_uni = (ru * jnp.cos(phi_v), ru * jnp.sin(phi_v), zu)
                d_guided = _where3(gvalid, d_vmf, d_uni)
                wo_g_l = _to_local(fs, ft, fn, d_guided)
                take_g = u[6] < a_g
                wo_l = _where3(take_g, wo_g_l, wo_cos)
                wo_w = _to_world(fs, ft, fn, wo_l)
                # combined density + weight at the ONE chosen direction
                up = (wi_l[2] > 0.0) & (wo_l[2] > 0.0)
                f_sel = jnp.where(up, jnp.maximum(wo_l[2], 0.0) / jnp.pi,
                                  0.0)
                pdf_b = f_sel  # diffuse: pdf == cos/pi == f/refl scale
                pdf_g = mix_pdf(wo_w)
                pdf_comb = a_g * pdf_g + (1.0 - a_g) * pdf_b
                ok = pdf_comb > 1e-9
                wsc = jnp.where(ok, f_sel / jnp.maximum(pdf_comb, 1e-8),
                                0.0)
                native = a_g <= 0.0
                next_w = _where3(native, refl, _scale3(refl, wsc))
                next_pdf = jnp.where(native, pdf_cos, pdf_comb)
            else:
                wo_w = _to_world(fs, ft, fn, wo_cos)
                next_w = refl
                next_pdf = pdf_cos

            T_new = _mul3(T, next_w)
            tmax_t = jnp.maximum(jnp.maximum(jnp.abs(T_new[0]),
                                             jnp.abs(T_new[1])),
                                 jnp.abs(T_new[2]))
            cont = act & (tmax_t > 0.0) & (next_pdf > 0.0)

            if use_rr and depth >= rr_depth:
                qrr = jnp.clip(jnp.maximum(jnp.maximum(T_new[0], T_new[1]),
                                           T_new[2]), 0.05, 0.95)
                rr_pass = u[8] < qrr
                inv_q = 1.0 / jnp.maximum(qrr, 1e-6)
                T_new = _where3(cont, _scale3(T_new, inv_q), T_new)
                cont = cont & rr_pass

            offn = jnp.where(_dot3(ng, wo_w) >= 0.0, 1e-4, -1e-4)
            o_next = _add3(p, _scale3(ng, offn))
            o = _where3(cont, o_next, o)
            d = _where3(cont, wo_w, d)
            T = _where3(cont, T_new, T)
            prev_pdf = jnp.where(cont, next_pdf, prev_pdf)
            prev_delta = prev_delta & ~cont
            alive = cont

        out_ref[0, :] = L[0]
        out_ref[1, :] = L[1]
        out_ref[2, :] = L[2]
        out_ref[3, :] = a_alb[0]
        out_ref[4, :] = a_alb[1]
        out_ref[5, :] = a_alb[2]
        out_ref[6, :] = a_nrm[0]
        out_ref[7, :] = a_nrm[1]
        out_ref[8, :] = a_nrm[2]
        out_ref[9, :] = a_dep
        out_ref[10, :] = a_nb
        out_ref[11, :] = a_fle[0]
        out_ref[12, :] = a_fle[1]
        out_ref[13, :] = a_fle[2]
        out_ref[14, :] = jnp.zeros((tile,))
        out_ref[15, :] = jnp.zeros((tile,))

    return kernel


# ---------------------------------------------------------------------------
# host-side packing + entry
# ---------------------------------------------------------------------------

def _pack_tri_cols(p0, e1, e2, t_pad):
    """(16, 5*t_pad) Pluecker column table (accel/pairs.py:181-201)."""
    t = p0.shape[0]
    v0, v1, v2 = p0, p0 + e1, p0 + e2
    nvec = np.cross(e1, e2)
    cols = np.zeros((t_pad, 5, 16), np.float32)
    for g, (a, b) in enumerate(((v0, v1), (v1, v2), (v2, v0))):
        cols[:t, g, 0:3] = np.cross(a, b)
        cols[:t, g, 3:6] = b - a
    cols[:t, 3, 6:9] = -nvec
    cols[:t, 3, 9] = (nvec * v0).sum(-1)
    cols[:t, 4, 0:3] = nvec
    return np.ascontiguousarray(
        cols.transpose(2, 1, 0).reshape(16, 5 * t_pad)
    )


def _pack_tri_shade(scene: SceneData, t_pad):
    """(32, t_pad): rows 0:9 p0/e1/e2, 9:12 gn, 12:21 n0/n1/n2,
    21 mid, 22 emitter flag, 23:26 emission, 26 pmf, 27 area."""
    sp = np.asarray(scene.geo.shade_packed)
    t = sp.shape[0]
    out = np.zeros((32, t_pad), np.float32)
    out[0:3, :t] = np.asarray(scene.geo.p0).T
    out[3:6, :t] = np.asarray(scene.geo.e1).T
    out[6:9, :t] = np.asarray(scene.geo.e2).T
    out[9:12, :t] = sp[:, 0:3].T
    out[12:21, :t] = sp[:, 3:12].T
    out[21, :t] = sp[:, 18]
    out[22, :t] = sp[:, 19]
    out[22, t:] = -1.0
    out[23:26, :t] = sp[:, 20:23].T
    out[26, :t] = sp[:, 23]
    out[27, :t] = sp[:, 25]
    return out


def fused_supported(scene: SceneData, record_paths: bool = False,
                    levels: int = 0) -> bool:
    """Host-side gate: True when this scene can take the megakernel path."""
    if record_paths or levels != 0:
        return False
    if scene.medium is not None and bool(scene.medium.enabled):
        return False
    mt = set(np.asarray(scene.mats.type).tolist())
    if mt - {int(BSDFType.DIFFUSE)}:
        return False
    ek = set(np.asarray(scene.emitters.kind).tolist())
    if ek - {int(EmitterKind.AREA)}:
        return False
    if scene.geo.p0.shape[0] > 2048:   # tri_cols (16, 5T) must fit VMEM
        return False
    if scene.emitters.kind.shape[0] > 32:
        return False
    return True


class FusedTables:
    """Host-packed scene constants for the megakernel (build once per
    scene; pass to trace_fused).  Plain attribute bag — deliberately NOT a
    pytree so jit treats tables as closure constants is avoided; fields are
    jnp arrays passed as regular arguments."""

    def __init__(self, tri_cols, tri_shade, em_tab, mat_tab, n_tri, n_em,
                 n_mat):
        self.tri_cols = tri_cols
        self.tri_shade = tri_shade
        self.em_tab = em_tab
        self.mat_tab = mat_tab
        self.n_tri = n_tri
        self.n_em = n_em
        self.n_mat = n_mat


def build_fused_tables(scene: SceneData) -> FusedTables:
    """Pack the scene into the kernel's VMEM table layouts (host-side)."""
    n_tri = int(scene.geo.p0.shape[0])
    t_pad = max(((n_tri + 7) // 8) * 8, 8)
    n_em = int(scene.emitters.kind.shape[0])
    e_pad = 8 * ((n_em + 7) // 8)
    n_mat = int(scene.mats.type.shape[0])
    m_pad = 8 * ((n_mat + 7) // 8)
    tri_cols = jnp.asarray(_pack_tri_cols(
        np.asarray(scene.geo.p0), np.asarray(scene.geo.e1),
        np.asarray(scene.geo.e2), t_pad,
    ))
    tri_shade = jnp.asarray(_pack_tri_shade(scene, t_pad))
    epk = np.zeros((32, e_pad), np.float32)
    epk[:, :n_em] = np.asarray(scene.emitters.packed).T
    cdf = np.asarray(scene.emitters.cdf, np.float32)
    epk[31, :n_em] = cdf
    epk[31, n_em:] = 2.0  # beyond any u — pads never picked
    em_tab = jnp.asarray(epk)
    mpk = np.zeros((8, m_pad), np.float32)
    mpk[0, :n_mat] = np.asarray(scene.mats.type, np.float32)
    mpk[1:4, :n_mat] = np.asarray(scene.mats.reflectance).T
    mat_tab = jnp.asarray(mpk)
    return FusedTables(tri_cols, tri_shade, em_tab, mat_tab, n_tri, n_em,
                       n_mat)


def _pack_guide(grid):
    """Traceable guide-table packing: (48, cpad) bf16 + (8,) f32 meta."""
    c, k = grid.kappa.shape
    assert k == 8, "fused kernel compiled for K=8 lobes"
    n_cells = int(grid.mu.shape[0])  # level-0: all root cells (res0^3 == C)
    a_row = (grid.alpha_scale if grid.alpha_scale is not None
             else jnp.ones((grid.mu.shape[0],)))
    packed = jnp.concatenate(
        [
            grid.mu[..., 0].T, grid.mu[..., 1].T, grid.mu[..., 2].T,
            grid.kappa.T, grid.log_weight.T,
            grid.valid[None, :].astype(jnp.float32),
            a_row[None, :].astype(jnp.float32),
        ], axis=0,
    ).astype(jnp.bfloat16)  # (42, C): row 41 = learned per-cell alpha scale
    cpad = ((n_cells + GUIDE_CHUNK - 1) // GUIDE_CHUNK) * GUIDE_CHUNK
    guide_tab = jnp.zeros((48, cpad), jnp.bfloat16).at[:42, :n_cells].set(
        packed
    )
    res = jnp.round(jnp.float32(n_cells) ** (1.0 / 3.0))
    sc = res / jnp.maximum(grid.aabb_max - grid.aabb_min, 1e-6)
    meta = jnp.concatenate(
        [grid.aabb_min.astype(jnp.float32), sc.astype(jnp.float32),
         res[None], jnp.zeros((1,), jnp.float32)]
    )
    return guide_tab, meta, cpad


@partial(jax.jit, static_argnames=("tables", "max_depth", "rr_depth",
                                   "guided", "alpha", "interpret"))
def trace_fused(tables: FusedTables, ray_o, ray_d, rkeys, grid=None,
                max_depth: int = 5, rr_depth: int = 5, guided: bool = False,
                alpha: float = 0.5, interpret: bool = False):
    """Fused megakernel trace.  Same contract as integrators.path.trace
    for the supported scene class; returns (L (N,3), PathAux, None).

    ``tables``: build_fused_tables(scene) — static (object identity keys
    the jit cache, like the guide callback in integrators.path).
    ``rkeys``: (N, 2) uint32 per-ray threefry keys (core.rng.ray_keys).
    ``grid``: GuidingGrid (level-0) when ``guided``."""
    from mitsuba_path_guiding_tpu.integrators.path import PathAux

    n = ray_o.shape[0]
    n_tri = tables.n_tri
    t_pad = tables.tri_cols.shape[1] // 5
    n_em = tables.n_em
    e_pad = tables.em_tab.shape[1]
    n_mat = tables.n_mat
    m_pad = tables.mat_tab.shape[1]
    tri_cols, tri_shade = tables.tri_cols, tables.tri_shade
    em_tab, mat_tab = tables.em_tab, tables.mat_tab

    if guided:
        assert grid is not None
        guide_tab, meta, n_cells_pad = _pack_guide(grid)
    else:
        guide_tab = jnp.zeros((48, GUIDE_CHUNK), jnp.bfloat16)
        meta = jnp.zeros((8,), jnp.float32)
        n_cells_pad = GUIDE_CHUNK

    npad = ((n + TILE - 1) // TILE) * TILE
    rays = jnp.zeros((8, npad), jnp.float32)
    rays = rays.at[0:3, :n].set(ray_o.T)
    rays = rays.at[3:6, :n].set(ray_d.T)
    rays = rays.at[6, :n].set(1.0)  # alive flag
    keys = jnp.zeros((2, npad), jnp.uint32).at[:, :n].set(
        rkeys.astype(jnp.uint32).T
    )

    kernel = _make_kernel(
        max_depth, rr_depth, n_tri, t_pad, n_em, e_pad, n_mat, m_pad,
        guided, alpha, n_cells_pad, use_rr=(rr_depth < max_depth),
    )
    out = pl.pallas_call(
        kernel,
        grid=(npad // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 5 * t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, e_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, n_cells_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_OUT_ROWS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, npad), jnp.float32),
        interpret=interpret,
    )(meta, rays, keys, tri_cols, tri_shade, em_tab, mat_tab, guide_tab)

    out = out[:, :n]
    L = out[0:3].T
    aux = PathAux(
        albedo=out[3:6].T,
        normal=out[6:9].T,
        depth_t=out[9],
        n_bounces=out[10].astype(jnp.int32),
        first_le=out[11:14].T,
    )
    return L, aux, None
