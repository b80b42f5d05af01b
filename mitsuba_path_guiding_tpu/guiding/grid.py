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


MAX_REFINE_LEVELS = 3  # static octree walk depth below the root grid


class GuidingGrid(NamedTuple):
    """Mixture parameters per cell (C rows = res0^3 root cells + refined
    children, K lobes).

    Adaptive spatial refinement (NEXT.md item 13; the SD-tree of
    "Practical Path Guiding" / OpenPGL's spatial structure): the root is a
    dense res0^3 grid; cells with enough samples split into 8 children
    appended to the same flat tables (``child_base`` >= 0 marks interior
    cells), up to MAX_REFINE_LEVELS deep.  Topology changes happen
    HOST-side between progressions (refine_grid); device lookups are a
    static-depth gather walk — fixed topology within a progression, the
    shape OpenPGL's per-iteration rebuild has."""

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
    child_base: jnp.ndarray  # (C,) int32: base row of 8 children, -1 leaf
    level: jnp.ndarray       # (C,) int32 refinement level (root = 0)
    res0: jnp.ndarray        # () int32 root resolution
    n_used: jnp.ndarray      # () int32 rows in use
    # parallax-aware extension ("Robust Fitting of Parallax-Aware Mixtures
    # for Path Guiding", Ruppert et al. 2020 — the paper this fork hosts):
    # per-lobe harmonic-mean distances to the lobes' virtual sources and a
    # per-cell fitting origin let queries REPROJECT lobe means to the
    # shading point (parallax_params below)
    s_rho: jnp.ndarray = None      # (C, K) sum resp*w/dist
    s_pos: jnp.ndarray = None      # (C, 3) w-weighted position sums
    s_pos_w: jnp.ndarray = None    # (C,)
    origin: jnp.ndarray = None     # (C, 3) fitting origin
    lobe_dist: jnp.ndarray = None  # (C, K) mean distance (0 = unknown)
    # learned per-cell BSDF fraction (round 5): scales the guide-selection
    # probability by how DIRECTIONAL the cell's incident radiance actually
    # is (mean resultant length of the li/pdf-weighted sample directions).
    # Cells with near-isotropic incident light cannot out-sample a cosine
    # lobe — guiding there only adds one-sample-MIS variance (measured
    # ~1.0x on the NEE-friendly door_room); this drives their alpha to 0
    # while concentrated cells keep the full fraction.  None = 1.0.
    alpha_scale: jnp.ndarray = None  # (C,) in [0, 1]


def make_grid(aabb_min, aabb_max, res: int = 16, n_lobes: int = 8, seed: int = 0,
              capacity: int | None = None) -> GuidingGrid:
    """Cold-start grid: lobes spread quasi-uniformly, small kappa.
    ``capacity`` reserves rows for adaptive refinement (default 2x root)."""
    c0 = res**3
    c = capacity if capacity is not None else c0
    c = max(c, c0)
    key = jax.random.PRNGKey(seed)
    mu = normalize(jax.random.normal(key, (c, n_lobes, 3)))
    # root-cell centers as initial fitting origins (refined rows inherit)
    import numpy as np

    lo = np.asarray(aabb_min, dtype=np.float32)
    hi = np.asarray(aabb_max, dtype=np.float32)
    ijk = np.stack(np.meshgrid(*(np.arange(res),) * 3, indexing="ij"), -1)
    centers = lo + (ijk.reshape(-1, 3) + 0.5) / res * (hi - lo)
    org = np.zeros((c, 3), dtype=np.float32)
    org[: res**3] = centers
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
        child_base=jnp.full((c,), -1, jnp.int32),
        level=jnp.zeros((c,), jnp.int32),
        res0=jnp.int32(res),
        n_used=jnp.int32(c0),
        s_rho=jnp.zeros((c, n_lobes)),
        s_pos=jnp.zeros((c, 3)),
        s_pos_w=jnp.zeros((c,)),
        origin=jnp.asarray(org),
        lobe_dist=jnp.zeros((c, n_lobes)),
        alpha_scale=jnp.ones((c,)),
    )


def cell_index(grid: GuidingGrid, p: jnp.ndarray, levels: int = MAX_REFINE_LEVELS) -> jnp.ndarray:
    """(N,3) world positions -> (N,) cell row ids (leaf of the octree walk).

    ``levels`` (static) is the number of walk iterations; pass
    ``active_levels(grid)`` to skip the per-level ``child_base`` gathers
    entirely while the grid has no refined cells (each s32 gather costs
    ~3.7 ms at 512k lanes on v5e — the single hottest op in the profile)."""
    res = grid.res0
    extent = jnp.maximum(grid.aabb_max - grid.aabb_min, 1e-6)
    q = jnp.clip((p - grid.aabb_min) / extent, 0.0, 1.0 - 1e-6) * res
    ijk = q.astype(jnp.int32)
    cid = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
    frac = q - ijk  # position inside the current cell, in [0,1)^3
    for _ in range(levels):
        base = grid.child_base[cid]
        hi = (frac >= 0.5).astype(jnp.int32)
        octant = (hi[..., 0] * 2 + hi[..., 1]) * 2 + hi[..., 2]
        cid = jnp.where(base >= 0, base + octant, cid)
        frac = jnp.where((base >= 0)[..., None], frac * 2.0 - hi, frac)
    return cid


def active_levels(grid: GuidingGrid) -> int:
    """Host-side: octree walk depth actually needed by this grid's topology
    (0 until refinement creates children — recompiles once when it does)."""
    import numpy as np

    return MAX_REFINE_LEVELS if bool((np.asarray(grid.child_base) >= 0).any()) else 0


def mixture_weights(grid: GuidingGrid, cid: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(grid.log_weight[cid], axis=-1)


def _gather_cells(grid: GuidingGrid, cid: jnp.ndarray, with_alpha: bool = False):
    """One packed row-gather of per-cell parameters, transposed to (K, N).

    TPU layout note: gathering ``grid.mu[cid]`` materializes (N, K, 3)
    arrays whose small trailing dims get lane-padded to 128 (~15-40x HBM
    waste).  Packing all parameters into one (C, 5K+1) table, gathering
    rows once, and transposing to parameter-major (K, N) keeps the big ray
    axis in the 128-lane dimension for all mixture math.
    Returns (w (K,N) softmaxed, mux, muy, muz (K,N), kappa (K,N), valid (N,)).
    """
    c, k = grid.kappa.shape
    rows = [
        grid.mu[..., 0].T,            # (K, C)
        grid.mu[..., 1].T,
        grid.mu[..., 2].T,
        grid.kappa.T,
        grid.log_weight.T,
        grid.valid[None, :].astype(jnp.float32),
    ]
    if with_alpha:
        a_row = (grid.alpha_scale if grid.alpha_scale is not None
                 else jnp.ones((c,)))
        rows.append(a_row[None, :].astype(jnp.float32))
    packed = jnp.concatenate(rows, axis=0)  # (5K+1[+1], C) — pack is cheap
    # COLUMN gather: output (5K+1, N) keeps the big ray axis in the
    # 128-lane minor dim.  The row-major form (packed[cid].T) materializes
    # an (N, 41) buffer whose 41-wide minor dim lane-pads to 128 (134 MB
    # at 262k lanes) plus a full transpose — measured 4.6 GB/wave of HBM
    # traffic on the guided trace vs 0.65 GB unguided; this orientation
    # removes both.
    # bf16 through the gather: the xplane profile shows this gather + its
    # layout copy at 1.3 ms/bounce (the #1 op of the guided wave); bf16
    # halves both.  Sampling and pdf both read the SAME rounded
    # parameters, so the one-sample-MIS estimator stays exact — the
    # mixture is simply fitted-then-rounded.
    rows = packed.astype(jnp.bfloat16)[:, cid].astype(jnp.float32)
    mux, muy, muz = rows[0:k], rows[k : 2 * k], rows[2 * k : 3 * k]
    kappa = rows[3 * k : 4 * k]
    logw = rows[4 * k : 5 * k]
    valid = rows[5 * k] > 0.5
    w = jax.nn.softmax(logw, axis=0)
    if with_alpha:
        return (w, mux, muy, muz, kappa, valid), rows[5 * k + 1]
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


# cosine-lobe vMF approximation: mean cosine of cos(theta)/pi over the
# hemisphere is 2/3 -> kappa ~ 2.25 (core/vmf.py mean_cosine_to_kappa)
KAPPA_COSINE = 2.25


def product_params(params, n_world: jnp.ndarray, kappa_b: float = KAPPA_COSINE):
    """Product of the cell mixture with a vMF(n, kappa_b) cosine proxy.

    The product of two vMFs is an unnormalized vMF (core/vmf.py
    vmf_product_kappa_mu); per lobe the integral factor is
    Lambda = N(ka) N(kb) / N(kc) * exp(kc - ka - kb) with the
    exp-normalized N from _vmf_pdf_kn, so the product mixture is again a
    proper mixture — sampling AND pdf use the same parameters, keeping the
    one-sample-MIS estimator exact (product importance sampling per
    NEXT.md item 13 / the parallax-aware paper's product extension)."""
    w, mux, muy, muz, kappa, valid = params
    nx, ny, nz = n_world[..., 0][None], n_world[..., 1][None], n_world[..., 2][None]
    vx = kappa * mux + kappa_b * nx
    vy = kappa * muy + kappa_b * ny
    vz = kappa * muz + kappa_b * nz
    kc = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    kc_safe = jnp.maximum(kc, 1e-9)
    muxc, muyc, muzc = vx / kc_safe, vy / kc_safe, vz / kc_safe

    def _logN(k):
        kk = jnp.clip(k, 1e-6, 1e4)
        return jnp.log(kk) - jnp.log(2.0 * jnp.pi) - jnp.log(-jnp.expm1(-2.0 * kk))

    log_lambda = _logN(kappa) + _logN(jnp.full_like(kappa, kappa_b)) - _logN(kc) + (
        kc - kappa - kappa_b
    )
    w_new = w * jnp.exp(jnp.clip(log_lambda, -60.0, 60.0))
    w_new = w_new / jnp.maximum(jnp.sum(w_new, axis=0, keepdims=True), 1e-30)
    return (w_new, muxc, muyc, muzc, kc, valid)


def parallax_params(grid: GuidingGrid, cid: jnp.ndarray, params, p: jnp.ndarray):
    """Reproject lobe means to the query point (the parallax-aware paper's
    mean shift): each lobe's virtual source sits at
    origin + mu * lobe_dist; querying from p re-aims the lobe there.
    Lobes without distance data (lobe_dist == 0 or ~infinite) keep their
    fitted mean.  kappa is kept (the paper also sharpens it; the dominant
    effect is the mean shift)."""
    if grid.lobe_dist is None:
        return params
    w, mux, muy, muz, kappa, valid = params
    k = grid.kappa.shape[1]
    packed = jnp.concatenate([grid.lobe_dist.T, grid.origin.T], axis=0)  # (K+3, C)
    rows = packed[:, cid]              # (K+3, N) — column gather, see above
    dist = rows[0:k]
    org = rows[k : k + 3]
    ok = (dist > 1e-5) & (dist < 1e7) & valid[None, :]
    vx = org[0][None] + mux * dist - p[..., 0][None]
    vy = org[1][None] + muy * dist - p[..., 1][None]
    vz = org[2][None] + muz * dist - p[..., 2][None]
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    ok = ok & (norm > 1e-6)
    inv = 1.0 / jnp.maximum(norm, 1e-6)
    return (
        w,
        jnp.where(ok, vx * inv, mux),
        jnp.where(ok, vy * inv, muy),
        jnp.where(ok, vz * inv, muz),
        kappa,
        valid,
    )
