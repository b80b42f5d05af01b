"""Specular manifold walks — TPU-native replacement for the reference's
SpecularManifold (/root/reference/src/libbidir/manifold.cpp, 1,000 LoC of
Newton iterations through specular chains using forward-mode autodiff
autodiff.h).

The reference moves a chain of specular vertices so the reflection/
refraction constraints stay satisfied when an endpoint moves; here the
same Newton solve runs BATCHED over a whole wavefront of connections,
with the 2x2 tangent Jacobians taken by ``jax.jvp`` (no hand-derived
derivatives) and re-projection onto the surface by the scene's own
vectorized intersector.

Two consumers:
  * ``manifold_nee`` — manifold next-event estimation (Hanika et al.
    2015): connect a shading point to a light THROUGH a refractive
    interface, with the generalized geometry term computed by the
    implicit-function theorem (again pure jvps).  This is the caustics
    capability the reference reaches via mut_manifold.cpp.
  * ``mlt``-class manifold perturbations (integrators/pssmlt.py chains
    can propose walk-based moves; see tests for the direct use).

Constraint formulation (vertex z on a triangle, barycentric (u, v)):
  wi = normalize(x - z), wo = normalize(y - z)
  H  = eta_x * wi + eta_y * wo            (away-from-z convention)
  c(u, v) = (H_hat . t1(z), H_hat . t2(z)) = 0   with (t1, t2) the
  tangent frame of the interpolated shading normal.  eta_x = eta_y = 1
  gives mirror reflection; unequal etas give Snell refraction.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import dot, normalize

EPS_T = 1e-4


def _onb(n):
    """Branchless orthonormal basis (Frisvad/Duff)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    t2 = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t1, t2


def _tri_rows(geo, prim):
    rows = geo.shade_packed[prim]
    return (
        geo.p0[prim], geo.e1[prim], geo.e2[prim],
        rows[:, 3:6], rows[:, 6:9], rows[:, 9:12],
    )


def _vertex(geo, prim, u, v):
    p0, e1, e2, n0, n1, n2 = _tri_rows(geo, prim)
    z = p0 + u[:, None] * e1 + v[:, None] * e2
    ns = normalize(
        (1.0 - u - v)[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2
    )
    return z, ns


def _constraint(geo, prim, u, v, x, y, eta_x, eta_y):
    """(c1, c2) tangent-plane components of the generalized half vector."""
    z, ns = _vertex(geo, prim, u, v)
    t1, t2 = _onb(ns)
    wi = normalize(x - z)
    wo = normalize(y - z)
    h = eta_x[:, None] * wi + eta_y[:, None] * wo
    h = normalize(h)
    return dot(h, t1), dot(h, t2)


class WalkResult(NamedTuple):
    prim: jnp.ndarray   # (N,) int32 final triangle
    u: jnp.ndarray      # (N,)
    v: jnp.ndarray      # (N,)
    z: jnp.ndarray      # (N, 3) final vertex
    normal: jnp.ndarray  # (N, 3) shading normal at z
    converged: jnp.ndarray  # (N,) bool
    residual: jnp.ndarray   # (N,) |c| at the end


def specular_manifold_walk(
    geo,
    intersect_fn,
    x,
    y,
    prim0,
    u0,
    v0,
    eta_x,
    eta_y,
    n_iters: int = 12,
    step_clamp: float = 0.5,
    tol: float = 1e-4,
) -> WalkResult:
    """Batched Newton walk of one specular vertex (chain length 1).

    ``intersect_fn(o, d) -> Hit`` re-projects proposals onto the surface
    (crossing triangle boundaries the way the reference's manifold walk
    re-traces rays).  Rays whose proposal escapes keep their previous
    vertex; convergence is judged by the final constraint residual."""
    n = x.shape[0]

    def c_uv(u, v, prim, yv):
        c1, c2 = _constraint(geo, prim, u, v, x, yv, eta_x, eta_y)
        return c1, c2

    def body(state, _):
        prim, u, v = state
        ones = jnp.ones_like(u)
        zeros = jnp.zeros_like(u)
        (c1, c2), (a, c_) = jax.jvp(
            lambda uu, vv: c_uv(uu, vv, prim, y), (u, v), (ones, zeros)
        )
        _, (b, d_) = jax.jvp(
            lambda uu, vv: c_uv(uu, vv, prim, y), (u, v), (zeros, ones)
        )
        det = a * d_ - b * c_
        safe = jnp.abs(det) > 1e-18
        inv = jnp.where(safe, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        du = (-c1 * d_ + c2 * b) * inv
        dv = (-c2 * a + c1 * c_) * inv
        # clamp the barycentric step (trust region)
        mag = jnp.sqrt(du * du + dv * dv)
        sc = jnp.where(mag > step_clamp, step_clamp / jnp.maximum(mag, 1e-12), 1.0)
        u_n = u + du * sc
        v_n = v + dv * sc

        # re-project through the scene: trace x -> proposal
        p0, e1, e2, *_ = _tri_rows(geo, prim)
        z_prop = p0 + u_n[:, None] * e1 + v_n[:, None] * e2
        d_dir = normalize(z_prop - x)
        hit = intersect_fn(x + d_dir * EPS_T, d_dir)
        ok = hit.valid & safe
        prim = jnp.where(ok, hit.prim, prim)
        u = jnp.where(ok, hit.u, u)
        v = jnp.where(ok, hit.v, v)
        return (prim, u, v), None

    (prim, u, v), _ = jax.lax.scan(
        body, (prim0, u0, v0), None, length=n_iters
    )
    c1, c2 = _constraint(geo, prim, u, v, x, y, eta_x, eta_y)
    res = jnp.sqrt(c1 * c1 + c2 * c2)
    z, ns = _vertex(geo, prim, u, v)
    return WalkResult(
        prim=prim, u=u, v=v, z=z, normal=ns,
        converged=res < tol, residual=res,
    )


def generalized_geometry(geo, wr: WalkResult, x, y, light_n, eta_x, eta_y):
    """|d omega_x / dA_y| for the converged chain — the manifold
    replacement of NEE's cos(theta_y)/r^2 (reference manifold.cpp G()
    and multiG()), via the implicit-function theorem:

      duv/dy = -J_uv^{-1} J_y,   domega/dy = J_omega_uv . duv/dy,
      density = |det of domega/dy in an orthonormal frame normal to omega|

    All Jacobian columns are jax.jvp directional derivatives."""
    prim, u, v = wr.prim, wr.u, wr.v
    ones = jnp.ones_like(u)
    zeros = jnp.zeros_like(u)

    def c_of_uv(uu, vv):
        return _constraint(geo, prim, uu, vv, x, y, eta_x, eta_y)

    _, (a, c_) = jax.jvp(c_of_uv, (u, v), (ones, zeros))
    _, (b, d_) = jax.jvp(c_of_uv, (u, v), (zeros, ones))

    ty1, ty2 = _onb(light_n)

    def c_of_y(yv):
        return _constraint(geo, prim, u, v, x, yv, eta_x, eta_y)

    _, (e1c, e2c) = jax.jvp(c_of_y, (y,), (ty1,))
    _, (f1c, f2c) = jax.jvp(c_of_y, (y,), (ty2,))

    det_uv = a * d_ - b * c_
    inv = 1.0 / jnp.where(jnp.abs(det_uv) < 1e-18, 1.0, det_uv)
    # duv/dy columns: k-th column = -J_uv^{-1} [dc/dy_k]
    du_dy1 = -(d_ * e1c - b * e2c) * inv
    dv_dy1 = -(-c_ * e1c + a * e2c) * inv
    du_dy2 = -(d_ * f1c - b * f2c) * inv
    dv_dy2 = -(-c_ * f1c + a * f2c) * inv

    def omega(uu, vv):
        p0, e1, e2, *_ = _tri_rows(geo, prim)
        z = p0 + uu[:, None] * e1 + vv[:, None] * e2
        return normalize(z - x)

    w, dw_du = jax.jvp(omega, (u, v), (ones, zeros))
    _, dw_dv = jax.jvp(omega, (u, v), (zeros, ones))

    dw_dy1 = dw_du * du_dy1[:, None] + dw_dv * dv_dy1[:, None]
    dw_dy2 = dw_du * du_dy2[:, None] + dw_dv * dv_dy2[:, None]

    b1, b2 = _onb(w)
    m11 = dot(b1, dw_dy1)
    m12 = dot(b1, dw_dy2)
    m21 = dot(b2, dw_dy1)
    m22 = dot(b2, dw_dy2)
    dens = jnp.abs(m11 * m22 - m12 * m21)
    bad = jnp.abs(det_uv) < 1e-18
    return jnp.where(bad, 0.0, dens), w


def fresnel_transmittance(cos_i, eta_rel):
    """Unpolarized Fresnel transmittance entering a medium with relative
    IOR eta_rel (reference libcore fresnelDielectricExt)."""
    ci = jnp.abs(cos_i)
    sin2_t = (1.0 - ci * ci) / (eta_rel * eta_rel)
    tir = sin2_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    rs = (ci - eta_rel * ct) / (ci + eta_rel * ct)
    rp = (eta_rel * ci - ct) / (eta_rel * ci + ct)
    r = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 0.0, 1.0 - r)
