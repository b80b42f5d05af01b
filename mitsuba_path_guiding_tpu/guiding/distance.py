"""Guided distance sampling in participating media.

The volumetric half of path guiding (BASELINE config 4; the capability the
fork's medium point queries exist to serve — reference
/root/reference/src/medium/heterogeneous.cpp:403-423 expose sigma_* at
arbitrary points precisely so an out-of-tree guided integrator can build
distance distributions).  Design follows the zero-variance-walk idea
(Herholz et al. 2019, "Volume Path Guiding Based on Zero-Variance Random
Walk Theory") reduced to its TPU-friendly core:

  the ideal collision-distance density is  p*(t) ∝ Tr(t) σs L_in(x(t));
  we approximate L_in with a per-cell scalar radiance estimate derived
  from the already-fitted guiding cache (sum of vMF-lobe flux statistics
  per cell), build a PIECEWISE-CONSTANT density over S static segments of
  the ray (one cell gather per segment — pure VPU work, no divergence),
  and one-sample-MIS it against the analytic per-channel exponential
  sampler so the estimator stays unbiased wherever the cache is cold.

All functions are shape-static: S is a compile-time constant, arrays are
laid out (S, N) with the ray axis in the 128-lane dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.guiding.grid import GuidingGrid, cell_index

N_SEGMENTS = 16


def cell_flux(grid: GuidingGrid) -> jnp.ndarray:
    """(C,) scalar incident-radiance proxy per cell: mean fitted sample
    weight (li/pdf), i.e. an estimate of the total incident flux the cell
    has seen.  Zero for unvisited cells."""
    total = jnp.sum(grid.s_w, axis=-1)
    return total / jnp.maximum(grid.s_count, 1.0)


def guided_distance_weights(
    grid: GuidingGrid,
    flux: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t1: jnp.ndarray,
    sigma_bar: jnp.ndarray,
    n_seg: int = N_SEGMENTS,
    levels: int = 0,
):
    """Piecewise-constant importance over [0, t1] split into ``n_seg``
    equal segments: w_i = Tr(t_mid_i) * flux(cell(x(t_mid_i))).

    Returns (w (S, N), dt (N,), total (N,)).  ``total`` == 0 means the
    cache has no data along this ray (callers must fall back to analytic
    sampling there)."""
    n = o.shape[0]
    dt = jnp.maximum(t1, 0.0) / n_seg
    i_mid = jnp.arange(n_seg, dtype=jnp.float32) + 0.5           # (S,)
    t_mid = i_mid[:, None] * dt[None, :]                          # (S, N)
    # positions at segment midpoints, component-major to keep N in lanes
    px = o[:, 0][None] + t_mid * d[:, 0][None]
    py = o[:, 1][None] + t_mid * d[:, 1][None]
    pz = o[:, 2][None] + t_mid * d[:, 2][None]
    pos = jnp.stack([px, py, pz], axis=-1).reshape(n_seg * n, 3)
    cid = cell_index(grid, pos, levels=levels)
    v = flux[cid].reshape(n_seg, n)
    tr = jnp.exp(-sigma_bar[None, :] * t_mid)
    w = tr * v
    total = jnp.sum(w, axis=0)
    return w, dt, total


def guided_distance_weights_hetero(
    grid: GuidingGrid,
    flux: jnp.ndarray,
    med,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t1: jnp.ndarray,
    n_seg: int = N_SEGMENTS,
    levels: int = 0,
):
    """Heterogeneous variant of ``guided_distance_weights``: the
    transmittance factor comes from a midpoint-Riemann optical depth of
    the DENSITY GRID along the ray (the capability the fork's medium
    point queries serve, heterogeneous.cpp:403-423) instead of the
    homogeneous closed form.

    Returns (w (S, N), dt (N,), total (N,), tr_end (N,)) where ``tr_end``
    approximates Tr(t1) — the natural surface-continuation probability."""
    from mitsuba_path_guiding_tpu.models.medium import density_at

    n = o.shape[0]
    dt = jnp.maximum(t1, 0.0) / n_seg
    i_mid = jnp.arange(n_seg, dtype=jnp.float32) + 0.5
    t_mid = i_mid[:, None] * dt[None, :]
    px = o[:, 0][None] + t_mid * d[:, 0][None]
    py = o[:, 1][None] + t_mid * d[:, 1][None]
    pz = o[:, 2][None] + t_mid * d[:, 2][None]
    pos = jnp.stack([px, py, pz], axis=-1).reshape(n_seg * n, 3)
    cid = cell_index(grid, pos, levels=levels)
    v = flux[cid].reshape(n_seg, n)
    base_t = jnp.mean(med.sigma_a + med.sigma_s)
    sig = (density_at(med, pos) * base_t).reshape(n_seg, n)  # (S, N)
    step_tau = sig * dt[None, :]
    tau_before = jnp.cumsum(step_tau, axis=0) - step_tau
    tr_mid = jnp.exp(-(tau_before + 0.5 * step_tau))
    tr_end = jnp.exp(-jnp.sum(step_tau, axis=0))
    w = tr_mid * v
    total = jnp.sum(w, axis=0)
    return w, dt, total, tr_end


def piecewise_pdf(w, dt, total, t):
    """Density of the piecewise-constant distribution at distances t (N,).
    Zero outside [0, S*dt) and when total == 0."""
    s = w.shape[0]
    seg = jnp.clip(jnp.floor(t / jnp.maximum(dt, 1e-20)), 0, s - 1).astype(jnp.int32)
    onehot = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) == seg[None, :]
    w_t = jnp.sum(jnp.where(onehot, w, 0.0), axis=0)
    pdf = w_t / jnp.maximum(total * dt, 1e-30)
    in_range = (t >= 0.0) & (t < s * dt) & (total > 0.0)
    return jnp.where(in_range, pdf, 0.0)


def piecewise_sample(w, dt, total, u):
    """Invert the piecewise-constant CDF with a single uniform: pick the
    segment by scaled-CDF search, place the sample by the leftover
    fraction.  Returns t (N,); garbage when total == 0 (callers gate on
    it via the selection probability)."""
    target = u * jnp.maximum(total, 1e-30)                        # (N,)
    cdf = jnp.cumsum(w, axis=0)                                   # (S, N)
    seg = jnp.sum((target[None, :] >= cdf).astype(jnp.int32), axis=0)
    seg = jnp.clip(seg, 0, w.shape[0] - 1)
    onehot = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) == seg[None, :]
    cdf_prev = jnp.sum(jnp.where(onehot, cdf - w, 0.0), axis=0)
    w_seg = jnp.sum(jnp.where(onehot, w, 0.0), axis=0)
    frac = jnp.clip((target - cdf_prev) / jnp.maximum(w_seg, 1e-30), 0.0, 1.0 - 1e-6)
    return (seg.astype(jnp.float32) + frac) * dt
