"""Spatio-directional guiding cache: uniform spatial grid x K-lobe vMF
mixtures.

The TPU-native counterpart of the OpenPGL-style guiding field the reference
fork exists to host (SURVEY.md §0: the fork provides every hook a guided
progressive path tracer needs; §7 step 6 specifies this design): fixed
topology per iteration — a uniform grid over the scene AABB — with a
K-lobe von Mises-Fisher mixture per cell ("Robust Fitting of Parallax-Aware
Mixtures for Path Guiding"-family directional model, vMF building block
/root/reference/include/mitsuba/core/vmf.h:44-68).

All state is flat arrays: lookups are index math + gathers, mixture
eval/sample is batched VPU work, and fitting statistics psum across devices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import Frame, normalize
from mitsuba_path_guiding_tpu.core.vmf import vmf_pdf, vmf_sample
from mitsuba_path_guiding_tpu.core.warp import INV_FOURPI


class GuidingGrid(NamedTuple):
    """Mixture parameters per cell (C = res^3 cells, K lobes)."""

    mu: jnp.ndarray        # (C, K, 3) lobe directions
    kappa: jnp.ndarray     # (C, K)
    log_weight: jnp.ndarray  # (C, K) unnormalized log mixture weights
    valid: jnp.ndarray     # (C,) bool — enough data to trust this cell
    # EMA sufficient statistics across progressions (psum-able)
    s_w: jnp.ndarray       # (C, K) sum of responsibilities x sample weight
    s_dir: jnp.ndarray     # (C, K, 3) weighted direction sums
    s_count: jnp.ndarray   # (C,) raw sample counts
    aabb_min: jnp.ndarray  # (3,)
    aabb_max: jnp.ndarray  # (3,)


def make_grid(aabb_min, aabb_max, res: int = 16, n_lobes: int = 8, seed: int = 0) -> GuidingGrid:
    """Cold-start grid: lobes spread quasi-uniformly, small kappa."""
    c = res**3
    key = jax.random.PRNGKey(seed)
    mu = normalize(jax.random.normal(key, (c, n_lobes, 3)))
    return GuidingGrid(
        mu=mu,
        kappa=jnp.full((c, n_lobes), 1.0),
        log_weight=jnp.zeros((c, n_lobes)),
        valid=jnp.zeros((c,), dtype=bool),
        s_w=jnp.zeros((c, n_lobes)),
        s_dir=jnp.zeros((c, n_lobes, 3)),
        s_count=jnp.zeros((c,)),
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
    )


def grid_res(grid: GuidingGrid) -> int:
    return round(grid.mu.shape[0] ** (1.0 / 3.0))


def cell_index(grid: GuidingGrid, p: jnp.ndarray) -> jnp.ndarray:
    """(N,3) world positions -> (N,) cell ids."""
    res = grid_res(grid)
    extent = jnp.maximum(grid.aabb_max - grid.aabb_min, 1e-6)
    q = (p - grid.aabb_min) / extent
    ijk = jnp.clip((q * res).astype(jnp.int32), 0, res - 1)
    return (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]


def mixture_weights(grid: GuidingGrid, cid: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(grid.log_weight[cid], axis=-1)


def _gather_cells(grid: GuidingGrid, cid: jnp.ndarray):
    """One packed row-gather of per-cell parameters, transposed to (K, N).

    TPU layout note: gathering ``grid.mu[cid]`` materializes (N, K, 3)
    arrays whose small trailing dims get lane-padded to 128 (~15-40x HBM
    waste).  Packing all parameters into one (C, 5K+1) table, gathering
    rows once, and transposing to parameter-major (K, N) keeps the big ray
    axis in the 128-lane dimension for all mixture math.
    Returns (w (K,N) softmaxed, mux, muy, muz (K,N), kappa (K,N), valid (N,)).
    """
    c, k = grid.kappa.shape
    packed = jnp.concatenate(
        [
            grid.mu[..., 0],          # (C, K)
            grid.mu[..., 1],
            grid.mu[..., 2],
            grid.kappa,
            grid.log_weight,
            grid.valid[:, None].astype(jnp.float32),
        ],
        axis=1,
    )                                  # (C, 5K+1) — C is small, pack is cheap
    rows = packed[cid].T               # (5K+1, N)
    mux, muy, muz = rows[0:k], rows[k : 2 * k], rows[2 * k : 3 * k]
    kappa = rows[3 * k : 4 * k]
    logw = rows[4 * k : 5 * k]
    valid = rows[5 * k] > 0.5
    w = jax.nn.softmax(logw, axis=0)
    return w, mux, muy, muz, kappa, valid


def _vmf_pdf_kn(t, kappa):
    """vMF pdf given cos angle t and kappa, all (K, N) — exp-normalized."""
    kk = jnp.clip(kappa, 0.0, 1e4)
    denom = 2.0 * jnp.pi * -jnp.expm1(-2.0 * kk)
    norm = jnp.where(kk > 1e-6, kk / jnp.maximum(denom, 1e-30), INV_FOURPI)
    return norm * jnp.exp(kk * (jnp.clip(t, -1.0, 1.0) - 1.0))


def _mixture_pdf(params, d):
    w, mux, muy, muz, kappa, valid = params
    t = mux * d[..., 0][None] + muy * d[..., 1][None] + muz * d[..., 2][None]
    pdf = jnp.sum(w * _vmf_pdf_kn(t, kappa), axis=0)
    return jnp.where(valid, pdf, INV_FOURPI)


def guide_pdf(grid: GuidingGrid, cid: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Mixture pdf of world direction d at cells cid (solid-angle measure)."""
    return _mixture_pdf(_gather_cells(grid, cid), d)


def _mixture_sample(params, u_lobe, u2):
    w, mux, muy, muz, kappa, valid = params
    cdf = jnp.cumsum(w, axis=0)                            # (K, N)
    ksel = jnp.sum((u_lobe[None, :] > cdf).astype(jnp.int32), axis=0)
    ksel = jnp.clip(ksel, 0, w.shape[0] - 1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) == ksel[None, :]
    ).astype(w.dtype)
    mu_k = jnp.stack(
        [
            jnp.sum(onehot * mux, axis=0),
            jnp.sum(onehot * muy, axis=0),
            jnp.sum(onehot * muz, axis=0),
        ],
        axis=-1,
    )
    kappa_k = jnp.sum(onehot * kappa, axis=0)
    d = vmf_sample(u2, mu_k, kappa_k)
    # invalid cells: uniform sphere fallback (matches the pdf fallback)
    z = 1.0 - 2.0 * u2[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    d_uni = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return jnp.where(valid[..., None], d, d_uni)


def guide_sample(grid: GuidingGrid, cid: jnp.ndarray, u_lobe, u2) -> jnp.ndarray:
    """Sample a world direction from the mixture at each cell."""
    return _mixture_sample(_gather_cells(grid, cid), u_lobe, u2)


def guide_sample_pdf(grid: GuidingGrid, cid: jnp.ndarray, u_lobe, u2, d_other):
    """Fused (sample, pdf(sample), pdf(d_other)) with one parameter gather —
    the guided-sampling hot path needs all three."""
    params = _gather_cells(grid, cid)
    d = _mixture_sample(params, u_lobe, u2)
    pdf_d = _mixture_pdf(params, d)
    pdf_other = _mixture_pdf(params, d_other)
    return d, pdf_d, pdf_other
