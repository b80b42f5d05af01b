"""Real spherical harmonics: evaluation, projection, rotation, sampling.

Counterpart of the reference's SHVector/SHRotation/SHSampler
(/root/reference/include/mitsuba/core/shvector.h:486 +
src/libcore/shvector.cpp:557).  Re-design notes:
- coefficients live in a flat (bands^2,) array ordered (l, m) with
  index l*(l+1)+m, the reference's layout;
- evaluation is a closed-form associated-Legendre recurrence vectorized
  over direction wavefronts (jit/vmap-friendly, no per-(l,m) host loop);
- rotation uses the z-rotation + fixed 90-degree x-rotation decomposition
  evaluated NUMERICALLY by projecting rotated basis functions (exact for
  band-limited functions, avoids the reference's recursive Ivanic-Ruedenberg
  blocks while staying a dense per-band matmul — the TPU shape);
- sampling: the reference's SHSampler builds hierarchical theta/phi tables;
  here sample_sh() importance-samples a non-negative SH expansion with a
  2D inverse-CDF over an equal-area grid (device-side gathers only).
Convention: y-up directions are NOT assumed; directions are unit (x,y,z)
with theta measured from +z like the reference.
"""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp


def n_coeffs(bands: int) -> int:
    return bands * bands


def _index(l: int, m: int) -> int:
    return l * (l + 1) + m


def eval_basis(d, bands: int):
    """SH basis values for unit directions d (..., 3) -> (..., bands^2).
    Real SH with the reference's normalization (shvector.h eval)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [None] * (bands * bands)
    # P_l^m via the standard stable recurrences, vectorized over lanes.
    # sin/cos(m phi) built by the angle-addition chain on (x, y).
    r_xy = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-24))
    cphi = jnp.where(r_xy > 1e-12, x / r_xy, 1.0)
    sphi = jnp.where(r_xy > 1e-12, y / r_xy, 0.0)
    ct = z
    st = r_xy

    # P_m^m(ct) chain
    pmm = jnp.ones_like(ct)
    cos_m = [jnp.ones_like(ct)]  # cos(m phi), m = 0..bands-1
    sin_m = [jnp.zeros_like(ct)]
    for m in range(1, bands):
        cos_m.append(cos_m[-1] * cphi - sin_m[-1] * sphi)
        sin_m.append(sin_m[-1] * cphi + cos_m[-2] * sphi)

    for m in range(bands):
        if m > 0:
            pmm = pmm * (-(2 * m - 1)) * st  # P_m^m
        p_prev, p_cur = jnp.zeros_like(ct), pmm
        for l in range(m, bands):
            if l > m:
                p_next = ((2 * l - 1) * ct * p_cur - (l + m - 1) * p_prev) / (l - m)
                p_prev, p_cur = p_cur, p_next
            # normalization K_l^m
            k = math.sqrt(
                (2 * l + 1) / (4 * math.pi)
                * math.factorial(l - m) / math.factorial(l + m)
            )
            if m == 0:
                out[_index(l, 0)] = k * p_cur
            else:
                s2 = math.sqrt(2.0) * k
                out[_index(l, m)] = s2 * cos_m[m] * p_cur
                out[_index(l, -m)] = s2 * sin_m[m] * p_cur
    return jnp.stack(out, axis=-1)


def eval_sh(coeffs, d):
    """Evaluate an SH expansion at unit directions: (..., 3) -> (...,)."""
    bands = int(round(math.sqrt(coeffs.shape[-1])))
    return jnp.sum(eval_basis(d, bands) * coeffs, axis=-1)


def project(fn, bands: int, res: int = 64) -> jnp.ndarray:
    """Project a function of direction onto SH (shvector.h project):
    quadrature over an equal-angle grid, host-side setup, device sums."""
    th = (np.arange(res) + 0.5) / res * np.pi
    ph = (np.arange(2 * res) + 0.5) / (2 * res) * 2 * np.pi
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    d = np.stack(
        [np.sin(TH) * np.cos(PH), np.sin(TH) * np.sin(PH), np.cos(TH)], axis=-1
    ).reshape(-1, 3)
    dA = (np.pi / res) * (2 * np.pi / (2 * res)) * np.sin(TH).reshape(-1)
    vals = np.asarray(fn(jnp.asarray(d, jnp.float32)))
    basis = np.asarray(eval_basis(jnp.asarray(d, jnp.float32), bands))
    return jnp.asarray((basis * (vals * dA)[:, None]).sum(axis=0))


def rotation_matrix(R, bands: int, res: int = 48) -> jnp.ndarray:
    """(bands^2, bands^2) matrix M with eval_sh(M @ c, d) == eval_sh(c, R^T d)
    — SH rotation (shvector.h SHRotation).  Built by least-squares projection
    of rotated basis functions on a quadrature grid; exact for band-limited
    inputs, one dense matmul to apply (TPU-friendly)."""
    th = (np.arange(res) + 0.5) / res * np.pi
    ph = (np.arange(2 * res) + 0.5) / (2 * res) * 2 * np.pi
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    d = np.stack(
        [np.sin(TH) * np.cos(PH), np.sin(TH) * np.sin(PH), np.cos(TH)], axis=-1
    ).reshape(-1, 3)
    dA = (np.pi / res) * (np.pi / res) * np.sin(TH).reshape(-1)
    Rm = np.asarray(R, dtype=np.float64)[:3, :3]
    b = np.asarray(eval_basis(jnp.asarray(d, jnp.float32), bands), dtype=np.float64)
    b_rot = np.asarray(
        eval_basis(jnp.asarray(d @ Rm, jnp.float32), bands), dtype=np.float64
    )
    # rotated coeffs g_i = <f(R^T .), Y_i> = sum_j c_j <Y_j(R^T .), Y_i>
    # => M[i, j] = sum over grid of Y_i(w) * Y_j(R^T w) * dA
    M = (b * dA[:, None]).T @ b_rot
    return jnp.asarray(M.astype(np.float32))


def sample_sh(coeffs, u, res: int = 32):
    """Importance-sample directions from a non-negative SH expansion via a
    2D inverse CDF on an equal-area (cos theta, phi) grid (the reference's
    SHSampler hierarchical warping collapsed to one table).  u: (N, 2)
    -> (dirs (N, 3), pdf (N,))."""
    ct_edges = np.linspace(1.0, -1.0, res + 1)
    ct = 0.5 * (ct_edges[:-1] + ct_edges[1:])
    ph = (np.arange(2 * res) + 0.5) / (2 * res) * 2 * np.pi
    CT, PH = np.meshgrid(ct, ph, indexing="ij")
    ST = np.sqrt(np.maximum(1 - CT * CT, 0.0))
    d = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], axis=-1).reshape(-1, 3)
    vals = np.maximum(
        np.asarray(eval_sh(coeffs, jnp.asarray(d, jnp.float32))), 1e-9
    ).reshape(res, 2 * res)
    cell_sa = (2.0 / res) * (2 * np.pi / (2 * res))  # equal-area cells
    pmf = vals / vals.sum()
    flat = jnp.asarray(pmf.reshape(-1))
    cdf = jnp.cumsum(flat)
    idx = jnp.clip(jnp.searchsorted(cdf, u[..., 0]), 0, res * 2 * res - 1)
    iy = idx // (2 * res)
    ix = idx % (2 * res)
    # uniform inside the chosen equal-area cell
    lo_prev = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    frac = jnp.clip((u[..., 0] - lo_prev) / jnp.maximum(cdf[idx] - lo_prev, 1e-12), 0, 1)
    ct_s = 1.0 - (iy + frac) * (2.0 / res)
    ph_s = (ix + u[..., 1]) * (2 * np.pi / (2 * res))
    st_s = jnp.sqrt(jnp.maximum(1 - ct_s * ct_s, 0.0))
    dirs = jnp.stack(
        [st_s * jnp.cos(ph_s), st_s * jnp.sin(ph_s), ct_s], axis=-1
    )
    pdf = flat[idx] / cell_sa
    return dirs, pdf
