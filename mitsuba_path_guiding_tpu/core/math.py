"""Vector math, shading frames, and geometric helpers.

TPU-native counterpart of the reference's linear-algebra headers
(/root/reference/include/mitsuba/core/{vector.h,point.h,frame.h,ray.h,
transform.h}).  Vectors are plain ``(..., 3)`` jnp arrays (SoA-friendly);
a shading frame is a pytree of three such arrays.  Everything is pure,
jit-safe, and batched along leading axes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-6
INF = jnp.inf


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize; zero vectors map to zero."""
    l2 = jnp.maximum(dot(v, v), 1e-30)
    return v * jax.lax.rsqrt(l2)[..., None]


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_rcp(x: jnp.ndarray) -> jnp.ndarray:
    """Signed reciprocal clamped to +-1e20 (finite, for ray-slab tests)."""
    sign = jnp.where(x >= 0.0, 1.0, -1.0)
    return sign / jnp.maximum(jnp.abs(x), 1e-20)


def lerp(a, b, t):
    return a + (b - a) * t


class Frame(NamedTuple):
    """Orthonormal shading frame (reference frame.h:38-132).

    ``n`` is the z-axis; ``s``/``t`` span the tangent plane.
    """

    s: jnp.ndarray
    t: jnp.ndarray
    n: jnp.ndarray

    @staticmethod
    def from_normal(n: jnp.ndarray) -> "Frame":
        """Duff et al. branchless ONB construction (stable for all n)."""
        sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
        a = -1.0 / (sign + n[..., 2])
        b = n[..., 0] * n[..., 1] * a
        s = jnp.stack(
            [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
            axis=-1,
        )
        t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack([dot(v, self.s), dot(v, self.t), dot(v, self.n)], axis=-1)

    def to_world(self, v: jnp.ndarray) -> jnp.ndarray:
        return (
            v[..., 0:1] * self.s + v[..., 1:2] * self.t + v[..., 2:3] * self.n
        )


# Local-frame trigonometry (reference frame.h:77-132): wi/wo given in a frame
# where the surface normal is +z.
def cos_theta(v):
    return v[..., 2]


def abs_cos_theta(v):
    return jnp.abs(v[..., 2])


def sin_theta2(v):
    return jnp.maximum(0.0, 1.0 - v[..., 2] * v[..., 2])


def sin_theta(v):
    return safe_sqrt(sin_theta2(v))


def tan_theta(v):
    return sin_theta(v) / jnp.where(jnp.abs(v[..., 2]) < 1e-12, 1e-12, v[..., 2])


def tan_theta2(v):
    c2 = v[..., 2] * v[..., 2]
    return sin_theta2(v) / jnp.maximum(c2, 1e-20)


def sphdir(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Spherical (theta from +z, phi about z) to cartesian."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def reflect_local(wi: jnp.ndarray) -> jnp.ndarray:
    """Specular reflection in the local frame (negate x,y)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def reflect(w: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction ``w`` (pointing away from surface) about normal."""
    return 2.0 * dot(w, n)[..., None] * n - w


def refract_local(wi: jnp.ndarray, eta: jnp.ndarray):
    """Refraction in the local frame; ``eta`` = int/ext IOR ratio.

    Returns (wt, total_internal_reflection_mask). Mirrors the reference's
    ``refract`` in util.h / dielectric.cpp:62-92.
    """
    rel_eta = jnp.where(cos_theta(wi) > 0.0, eta, 1.0 / eta)
    c2 = 1.0 - (1.0 - wi[..., 2] * wi[..., 2]) / (rel_eta * rel_eta)
    tir = c2 <= 0.0
    ct_t = safe_sqrt(c2) * -jnp.sign(wi[..., 2])
    scale = -1.0 / rel_eta
    wt = jnp.stack([wi[..., 0] * scale, wi[..., 1] * scale, ct_t], axis=-1)
    return wt, tir


def fresnel_dielectric(cos_i: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Unpolarized Fresnel reflectance for a dielectric (util.cpp fresnelDielectricExt)."""
    rel_eta = jnp.where(cos_i > 0.0, eta, 1.0 / eta)
    ci = jnp.abs(cos_i)
    st2 = jnp.maximum(0.0, 1.0 - ci * ci) / (rel_eta * rel_eta)
    tir = st2 >= 1.0
    ct = safe_sqrt(1.0 - st2)
    r_s = (ci - rel_eta * ct) / jnp.maximum(ci + rel_eta * ct, 1e-12)
    r_p = (rel_eta * ci - ct) / jnp.maximum(rel_eta * ci + ct, 1e-12)
    f = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_i: jnp.ndarray, eta: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Approximate unpolarized conductor Fresnel (per channel eta,k).

    cos_i: (...,), eta/k: (..., 3) -> (..., 3).  Matches the reference's
    fresnelConductorExact (util.cpp) formulation.
    """
    ci = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)[..., None]
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2, k2 = eta * eta, k * k
    t0 = eta2 - k2 - si2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * eta2 * k2)
    t1 = a2b2 + ci2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def face_forward(n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Flip n so it lies in the same hemisphere as d."""
    return jnp.where(dot(n, d)[..., None] < 0.0, -n, n)


def spherical_phi_theta(d: jnp.ndarray):
    """Cartesian -> (phi in [0,2pi), theta in [0,pi])."""
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return phi, theta


def power_heuristic(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (beta=2) MIS weight for strategy a
    (reference path.cpp:296 miWeight)."""
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30)
    return jnp.where(pdf_a > 0.0, w, 0.0)
