"""SpecularManifold walks (integrators/manifold.py) vs the reference's
libbidir manifold layer (manifold.cpp): Newton convergence, AD
generalized-geometry term vs finite differences, and manifold-NEE
irradiance through a wavy refractive interface vs brute-force Monte
Carlo — the underwater-caustics setting manifold walks exist for."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute
from mitsuba_path_guiding_tpu.integrators.manifold import (
    fresnel_transmittance,
    generalized_geometry,
    specular_manifold_walk,
)
from mitsuba_path_guiding_tpu.scene.types import Geometry

ETA_WATER = 1.33


def _surface_geo(amp=0.05, res=48, span=3.0):
    """Wavy 'water' surface y = 1 + amp sin(pi x) sin(pi z), y-up, with
    analytic smooth vertex normals."""
    xs = np.linspace(-span, span, res + 1)
    zs = np.linspace(-span, span, res + 1)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    H = 1.0 + amp * np.sin(np.pi * X) * np.sin(np.pi * Z)
    V = np.stack([X, H, Z], axis=-1).reshape(-1, 3)
    dhdx = amp * np.pi * np.cos(np.pi * X) * np.sin(np.pi * Z)
    dhdz = amp * np.pi * np.sin(np.pi * X) * np.cos(np.pi * Z)
    N = np.stack([-dhdx, np.ones_like(H), -dhdz], axis=-1)
    N /= np.linalg.norm(N, axis=-1, keepdims=True)
    N = N.reshape(-1, 3)

    idx = np.arange((res + 1) * (res + 1)).reshape(res + 1, res + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[:-1, 1:].ravel()
    d = idx[1:, 1:].ravel()
    faces = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([b, d, c], -1)]
    )
    p0 = V[faces[:, 0]]
    e1 = V[faces[:, 1]] - p0
    e2 = V[faces[:, 2]] - p0
    n0, n1, n2 = N[faces[:, 0]], N[faces[:, 1]], N[faces[:, 2]]

    t = len(faces)
    sp = np.zeros((t, 32), np.float32)
    gn = np.cross(e1, e2)
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True)
    sp[:, 0:3] = gn
    sp[:, 3:6] = n0
    sp[:, 6:9] = n1
    sp[:, 9:12] = n2
    z3, z2 = jnp.zeros((t, 3)), jnp.zeros((t, 2))
    return Geometry(
        p0=jnp.asarray(p0, jnp.float32), e1=jnp.asarray(e1, jnp.float32),
        e2=jnp.asarray(e2, jnp.float32),
        n0=jnp.asarray(n0, jnp.float32), n1=jnp.asarray(n1, jnp.float32),
        n2=jnp.asarray(n2, jnp.float32),
        uv0=z2, uv1=z2, uv2=z2,
        mat_id=jnp.zeros((t,), jnp.int32),
        emitter_id=jnp.zeros((t,), jnp.int32),
        shade_packed=jnp.asarray(sp),
    )


def _walk_setup(geo, x, y, eta_x_val=ETA_WATER, eta_y_val=1.0):
    isect = lambda o, d: intersect_brute(geo, o, d)
    n = x.shape[0]
    d0 = np.array(y - x)
    d0 = d0 / np.linalg.norm(d0, axis=-1, keepdims=True)
    h0 = isect(x, jnp.asarray(d0))
    eta_x = jnp.full((n,), eta_x_val)
    eta_y = jnp.full((n,), eta_y_val)
    wr = specular_manifold_walk(
        geo, isect, x, y, h0.prim, h0.u, h0.v, eta_x, eta_y
    )
    return wr, eta_x, eta_y, h0


def test_walk_converges_wavy():
    geo = _surface_geo()
    rs = np.random.default_rng(0)
    n = 256
    x = jnp.asarray(
        np.stack([rs.uniform(-1.5, 1.5, n), np.zeros(n), rs.uniform(-1.5, 1.5, n)], -1),
        jnp.float32,
    )
    y = jnp.asarray(
        np.stack([rs.uniform(-0.4, 0.4, n), np.full(n, 3.0), rs.uniform(-0.4, 0.4, n)], -1),
        jnp.float32,
    )
    wr, *_ = _walk_setup(geo, x, y)
    frac = float(jnp.mean(wr.converged))
    assert frac > 0.95, f"only {frac:.2f} of walks converged"
    # Snell holds at the solution: eta_x sin(i) == eta_y sin(o)
    wi = np.array(x - wr.z)
    wo = np.array(y - wr.z)
    wi = wi / np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = wo / np.linalg.norm(wo, axis=-1, keepdims=True)
    nrm = np.asarray(wr.normal)
    sin_i = np.linalg.norm(np.cross(wi, nrm), axis=-1)
    sin_o = np.linalg.norm(np.cross(wo, nrm), axis=-1)
    m = np.asarray(wr.converged)
    np.testing.assert_allclose(
        ETA_WATER * sin_i[m], 1.0 * sin_o[m], rtol=2e-3, atol=2e-4
    )


def test_flat_mirror_matches_image_method():
    """Reflection (eta_x = eta_y = 1) off a FLAT surface: the generalized
    geometry term must equal the mirror-image result
    cos(theta at the image) / |y' - x|^2 with y' = y mirrored in the
    plane (reference manifold.cpp G() sanity case)."""
    geo = _surface_geo(amp=0.0)
    rs = np.random.default_rng(1)
    n = 128
    # both endpoints ABOVE the surface plane y = 1
    x = jnp.asarray(
        np.stack([rs.uniform(-1, 1, n), np.full(n, 2.0), rs.uniform(-1, 1, n)], -1),
        jnp.float32,
    )
    y = jnp.asarray(
        np.stack([rs.uniform(-0.5, 0.5, n), np.full(n, 3.0), rs.uniform(-0.5, 0.5, n)], -1),
        jnp.float32,
    )
    # initial guess: aim at the surface point below the midpoint
    mid = np.array((x + y) / 2.0)
    mid[:, 1] = 1.0
    d0 = mid - np.asarray(x)
    d0 = d0 / np.linalg.norm(d0, axis=-1, keepdims=True)
    isect = lambda o, d: intersect_brute(geo, o, d)
    h0 = isect(x, jnp.asarray(d0.astype(np.float32)))
    ones = jnp.ones((n,))
    wr = specular_manifold_walk(geo, isect, x, y, h0.prim, h0.u, h0.v, ones, ones)
    assert float(jnp.mean(wr.converged)) > 0.99
    light_n = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    dens, w = generalized_geometry(geo, wr, x, y, light_n, ones, ones)
    y_img = np.array(y)
    y_img[:, 1] = 2.0 - y_img[:, 1]  # mirror across plane y = 1
    diff = y_img - np.asarray(x)
    r2 = np.sum(diff**2, -1)
    cos_img = np.abs(diff[:, 1]) / np.sqrt(r2)  # mirrored light normal (0,1,0)
    expect = cos_img / r2
    np.testing.assert_allclose(np.asarray(dens), expect, rtol=1e-2)


def test_generalized_geometry_matches_finite_differences():
    """AD density vs re-running the walk at perturbed light positions."""
    geo = _surface_geo(amp=0.04)
    n = 64
    rs = np.random.default_rng(2)
    x = jnp.asarray(
        np.stack([rs.uniform(-1, 1, n), np.zeros(n), rs.uniform(-1, 1, n)], -1),
        jnp.float32,
    )
    y = jnp.asarray(
        np.stack([rs.uniform(-0.3, 0.3, n), np.full(n, 3.0), rs.uniform(-0.3, 0.3, n)], -1),
        jnp.float32,
    )
    wr, ex, ey, _ = _walk_setup(geo, x, y)
    light_n = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    dens, w0 = generalized_geometry(geo, wr, x, y, light_n, ex, ey)

    eps = 1e-3
    t1 = jnp.asarray([1.0, 0.0, 0.0])
    t2 = jnp.asarray([0.0, 0.0, 1.0])
    ws = []
    for t in (t1, t2):
        wr_p, *_ = _walk_setup(geo, x, y + eps * t)
        wr_m, *_ = _walk_setup(geo, x, y - eps * t)
        wp = np.array(wr_p.z - x)
        wp = wp / np.linalg.norm(wp, axis=-1, keepdims=True)
        wm = np.array(wr_m.z - x)
        wm = wm / np.linalg.norm(wm, axis=-1, keepdims=True)
        ws.append((wp - wm) / (2 * eps))
    # project FD direction derivatives on a frame normal to w0
    w0n = np.asarray(w0)
    up = np.where(np.abs(w0n[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    b1 = np.cross(w0n, up)
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = np.cross(w0n, b1)
    m11 = np.sum(b1 * ws[0], -1)
    m12 = np.sum(b1 * ws[1], -1)
    m21 = np.sum(b2 * ws[0], -1)
    m22 = np.sum(b2 * ws[1], -1)
    fd = np.abs(m11 * m22 - m12 * m21)
    ok = np.asarray(wr.converged)
    rel = np.abs(np.asarray(dens)[ok] - fd[ok]) / np.maximum(fd[ok], 1e-9)
    assert np.median(rel) < 0.05, np.median(rel)


@pytest.mark.slow
def test_manifold_nee_matches_brute_force():
    """Irradiance on the pool floor through the wavy interface: manifold
    NEE (deterministic connection x light samples) vs brute cosine-sampled
    refraction Monte Carlo."""
    geo = _surface_geo(amp=0.04, res=40)
    isect = lambda o, d: intersect_brute(geo, o, d)
    le = 40.0
    half = 0.5  # light half-extent, plane y = 3
    area = (2 * half) ** 2

    xs = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.4, 0.0, -0.2], [-0.6, 0.0, 0.5]], jnp.float32
    )

    # --- manifold NEE estimate
    rs = np.random.default_rng(3)
    m = 512
    est_m = []
    for xi in range(xs.shape[0]):
        x = jnp.broadcast_to(xs[xi], (m, 3))
        ypts = np.stack(
            [rs.uniform(-half, half, m), np.full(m, 3.0), rs.uniform(-half, half, m)],
            -1,
        ).astype(np.float32)
        y = jnp.asarray(ypts)
        wr, ex, ey, _ = _walk_setup(geo, x, y)
        light_n = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (m, 3))
        dens, w = generalized_geometry(geo, wr, x, y, light_n, ex, ey)
        # Fresnel at z: incidence measured on the AIR side (wo)
        wo = jax.vmap(lambda a, b: a - b)(y, wr.z)
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        cos_air = jnp.abs(jnp.sum(wo * wr.normal, -1))
        ft = fresnel_transmittance(cos_air, 1.0 / ETA_WATER)
        cos_x = jnp.clip(w[:, 1], 0.0, 1.0)  # floor normal +y
        contrib = jnp.where(
            wr.converged, le * ft * dens * cos_x * area, 0.0
        )
        est_m.append(float(jnp.mean(contrib)))

    # --- brute force: cosine-hemisphere directions, refract, hit light?
    nb = 80_000
    est_b = []
    for xi in range(xs.shape[0]):
        u1 = rs.random(nb)
        u2 = rs.random(nb)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        d = np.stack(
            [r * np.cos(phi), np.sqrt(1 - u1), r * np.sin(phi)], -1
        ).astype(np.float32)
        x = jnp.broadcast_to(xs[xi], (nb, 3))
        h = isect(x, jnp.asarray(d))
        nrm = np.asarray(geo.shade_packed[np.maximum(np.asarray(h.prim), 0)])
        u, v = np.asarray(h.u), np.asarray(h.v)
        ns = (1 - u - v)[:, None] * nrm[:, 3:6] + u[:, None] * nrm[:, 6:9] + v[:, None] * nrm[:, 9:12]
        ns = ns / np.linalg.norm(ns, axis=-1, keepdims=True)
        wi = -d  # pointing back toward x... incident dir = d upward
        ci = np.sum(d * ns, -1)
        eta = 1.0 / ETA_WATER  # water -> air
        # refract d through ns (d on water side)
        sin2t = (ETA_WATER ** 2) * (1 - ci ** 2)
        tir = sin2t >= 1.0
        ct = np.sqrt(np.maximum(1 - sin2t, 0.0))
        # refracted = eta_ratio * (-d) inverted ... standard refract:
        refr = (ETA_WATER) * (-d) + (ETA_WATER * ci - ct)[:, None] * ns
        refr = -refr
        refr = refr / np.maximum(np.linalg.norm(refr, axis=-1, keepdims=True), 1e-12)
        ft = np.asarray(fresnel_transmittance(jnp.asarray(ci), jnp.float32(ETA_WATER)))
        z = np.asarray(h.t)[:, None] * d + np.asarray(x)
        tpl = (3.0 - z[:, 1]) / np.where(np.abs(refr[:, 1]) < 1e-9, 1e-9, refr[:, 1])
        py = z + tpl[:, None] * refr
        hit_l = (
            np.asarray(h.valid)
            & ~tir
            & (refr[:, 1] > 0)
            & (np.abs(py[:, 0]) < half)
            & (np.abs(py[:, 2]) < half)
        )
        est_b.append(float(np.mean(np.where(hit_l, np.pi * ft * le, 0.0))))

    for a, b in zip(est_m, est_b):
        assert abs(a / b - 1.0) < 0.08, (est_m, est_b)
