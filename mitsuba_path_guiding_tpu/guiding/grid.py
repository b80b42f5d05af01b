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
    lw = grid.log_weight[cid]
    return jax.nn.softmax(lw, axis=-1)


def guide_pdf(grid: GuidingGrid, cid: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Mixture pdf of world direction d at cells cid (solid-angle measure)."""
    w = mixture_weights(grid, cid)                      # (N, K)
    mu = grid.mu[cid]                                    # (N, K, 3)
    kappa = grid.kappa[cid]                              # (N, K)
    p = vmf_pdf(d[..., None, :], mu, kappa)              # (N, K)
    pdf = jnp.sum(w * p, axis=-1)
    return jnp.where(grid.valid[cid], pdf, INV_FOURPI)


def guide_sample(grid: GuidingGrid, cid: jnp.ndarray, u_lobe, u2) -> jnp.ndarray:
    """Sample a world direction from the mixture at each cell."""
    w = mixture_weights(grid, cid)                       # (N, K)
    cdf = jnp.cumsum(w, axis=-1)
    k = jnp.sum((u_lobe[..., None] > cdf).astype(jnp.int32), axis=-1)
    k = jnp.clip(k, 0, w.shape[-1] - 1)
    nk = jnp.arange(cid.shape[0])
    mu = grid.mu[cid][nk, k]
    kappa = grid.kappa[cid][nk, k]
    d = vmf_sample(u2, mu, kappa)
    # invalid cells: uniform sphere fallback (matches guide_pdf fallback)
    z = 1.0 - 2.0 * u2[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    d_uni = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return jnp.where(grid.valid[cid][..., None], d, d_uni)
