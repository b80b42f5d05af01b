"""Weighted-EM fitting of the vMF-mixture guiding cache from path records.

The fitting step of the fork's ``postprogression`` hook
(/root/reference/src/librender/progressiveintegrator.cpp:109,314) made
TPU-native: responsibilities (E-step) and weighted moment accumulation
(M-step) are batched VPU work with ``segment_sum`` scatter into per-cell
statistics; the statistics are linear, so multi-device training psums them
before the (cheap, per-cell) parameter update — SURVEY.md §2.7.

Robustness follows the parallax-aware-mixtures paper's recipe in spirit:
EMA blending of sufficient statistics across progressions, kappa clamping,
and lobe-weight floors to avoid lobe death.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.vmf import (
    KAPPA_MAX,
    mean_cosine_to_kappa,
    vmf_pdf,
)
from mitsuba_path_guiding_tpu.guiding.grid import (
    GuidingGrid,
    cell_index,
    mixture_weights,
)
from mitsuba_path_guiding_tpu.integrators.path import PathRecord

MIN_SAMPLES_VALID = 32.0
# alpha_scale ramp (update_grid): mean-resultant-length band between
# "isotropic incident light, guide off" and "directional, full fraction"
ALPHA_R_LO = 0.2
ALPHA_R_HI = 0.6
EMA = 0.7            # statistics carry-over between progressions
WEIGHT_FLOOR = 1e-3  # mixture weight floor (lobe-death guard)
KAPPA_FIT_MAX = 5e3


@partial(jax.jit, static_argnames=("levels",))
def accumulate_stats(grid: GuidingGrid, rec: PathRecord, levels: int | None = None):
    """One E-step + local statistics accumulation from a PathRecord batch.

    Returns (s_w (C,K), s_dir (C,K,3), s_count (C,)) — linear, psum-able.
    Compute layout is (K, M) with the big sample axis M = D*N in the lanes
    (see PathRecord layout note); the per-cell statistics are produced by a
    single fused segment_sum over an (M, 4K+1) payload."""
    d_axis, _, n_axis = rec.pos.shape
    m = d_axis * n_axis
    px = rec.pos[:, 0, :].reshape(m)
    py = rec.pos[:, 1, :].reshape(m)
    pz = rec.pos[:, 2, :].reshape(m)
    dx = rec.dir[:, 0, :].reshape(m)
    dy = rec.dir[:, 1, :].reshape(m)
    dz = rec.dir[:, 2, :].reshape(m)
    li = rec.li.reshape(m)
    pdf = rec.pdf.reshape(m)
    valid = rec.valid.reshape(m)

    w_sample = jnp.where(valid, li / jnp.maximum(pdf, 1e-3), 0.0)
    w_sample = jnp.minimum(w_sample, 1e4)  # firefly guard for the fit
    pos = jnp.stack([px, py, pz], axis=-1)
    from mitsuba_path_guiding_tpu.guiding.grid import MAX_REFINE_LEVELS

    cid = cell_index(grid, pos, levels=MAX_REFINE_LEVELS if levels is None else levels)

    # E-step responsibilities under current mixture, all (K, M)
    from mitsuba_path_guiding_tpu.guiding.grid import _gather_cells, _vmf_pdf_kn

    w_mix, mux, muy, muz, kappa, cell_valid = _gather_cells(grid, cid)
    t = mux * dx[None] + muy * dy[None] + muz * dz[None]
    p_k = jnp.maximum(_vmf_pdf_kn(t, kappa), 1e-12)
    resp = w_mix * p_k
    resp = resp / jnp.maximum(jnp.sum(resp, axis=0, keepdims=True), 1e-12)
    # cold cells: split the sample evenly (uniform responsibilities)
    resp = jnp.where(cell_valid[None, :], resp, 1.0 / resp.shape[0])

    rw = resp * w_sample[None, :]                      # (K, M)
    c, k = grid.kappa.shape
    # parallax statistics: harmonic distance responsibilities + weighted
    # positions for the per-cell fitting origin (Ruppert et al. 2020)
    if rec.dist is not None:
        dist = rec.dist.reshape(m)
        inv_d = jnp.where((dist > 1e-5) & (dist < 1e7), 1.0 / dist, 0.0)
    else:
        inv_d = jnp.zeros((m,))
    payload = jnp.concatenate(
        [
            rw.T,                                       # (M, K)
            (rw * dx[None]).T,
            (rw * dy[None]).T,
            (rw * dz[None]).T,
            valid.astype(jnp.float32)[:, None],
            (rw * inv_d[None]).T,                       # (M, K)
            (w_sample * px)[:, None],
            (w_sample * py)[:, None],
            (w_sample * pz)[:, None],
            w_sample[:, None],
        ],
        axis=1,
    )                                                   # (M, 5K+5)
    summed = jax.ops.segment_sum(payload, cid, num_segments=c)  # (C, 5K+5)
    s_w = summed[:, 0:k]
    s_dir = jnp.stack(
        [summed[:, k : 2 * k], summed[:, 2 * k : 3 * k], summed[:, 3 * k : 4 * k]],
        axis=-1,
    )                                                   # (C, K, 3)
    s_count = summed[:, 4 * k]
    s_rho = summed[:, 4 * k + 1 : 5 * k + 1]
    s_pos = summed[:, 5 * k + 1 : 5 * k + 4]
    s_pos_w = summed[:, 5 * k + 4]
    return s_w, s_dir, s_count, s_rho, s_pos, s_pos_w


@jax.jit
def update_grid(grid: GuidingGrid, s_w, s_dir, s_count,
                s_rho=None, s_pos=None, s_pos_w=None) -> GuidingGrid:
    """M-step: blend statistics (EMA) and recompute mixture parameters."""
    s_w_t = grid.s_w * EMA + s_w
    s_dir_t = grid.s_dir * EMA + s_dir
    s_count_t = grid.s_count * EMA + s_count

    total_w = jnp.sum(s_w_t, axis=-1, keepdims=True)       # (C, 1)
    has_data = (total_w[..., 0] > 1e-9) & (s_count_t > MIN_SAMPLES_VALID)

    new_weight = s_w_t / jnp.maximum(total_w, 1e-12)
    new_weight = jnp.maximum(new_weight, WEIGHT_FLOOR)
    new_weight = new_weight / jnp.sum(new_weight, axis=-1, keepdims=True)

    norm_dir = jnp.linalg.norm(s_dir_t, axis=-1)            # (C, K)
    r = norm_dir / jnp.maximum(s_w_t, 1e-12)
    new_kappa = jnp.clip(mean_cosine_to_kappa(r), 1e-2, KAPPA_FIT_MAX)
    new_mu = s_dir_t / jnp.maximum(norm_dir, 1e-12)[..., None]

    # learned per-cell BSDF fraction (GuidingGrid.alpha_scale): the mean
    # resultant length of ALL li/pdf-weighted sample directions measures
    # how directional the cell's incident radiance is — near-isotropic
    # cells (r_bar < ALPHA_R_LO) get alpha 0 (guiding cannot out-sample a
    # cosine lobe there, it only adds one-sample-MIS variance), strongly
    # directional cells (r_bar > ALPHA_R_HI) keep the full fraction
    res_vec = jnp.sum(s_dir_t, axis=1)                      # (C, 3)
    r_bar = jnp.linalg.norm(res_vec, axis=-1) / jnp.maximum(
        total_w[..., 0], 1e-12
    )
    alpha_scale = jnp.clip(
        (r_bar - ALPHA_R_LO) / (ALPHA_R_HI - ALPHA_R_LO), 0.0, 1.0
    )

    lobe_ok = (s_w_t > 1e-9) & (norm_dir > 1e-12)
    mu = jnp.where(lobe_ok[..., None], new_mu, grid.mu)
    kappa = jnp.where(lobe_ok, new_kappa, grid.kappa)

    extra = {}
    if s_rho is not None and grid.s_rho is not None:
        # harmonic mean lobe distance: sum(r w) / sum(r w / d)
        s_rho_t = grid.s_rho * EMA + s_rho
        lobe_dist = jnp.where(
            s_rho_t > 1e-9, s_w_t / jnp.maximum(s_rho_t, 1e-12), 0.0
        )
        s_pos_t = grid.s_pos * EMA + s_pos
        s_pos_w_t = grid.s_pos_w * EMA + s_pos_w
        origin = jnp.where(
            (s_pos_w_t > 1e-9)[:, None],
            s_pos_t / jnp.maximum(s_pos_w_t, 1e-12)[:, None],
            grid.origin,
        )
        extra = dict(
            s_rho=s_rho_t, s_pos=s_pos_t, s_pos_w=s_pos_w_t,
            origin=origin, lobe_dist=lobe_dist,
        )
    return grid._replace(
        mu=mu,
        kappa=kappa,
        log_weight=jnp.log(new_weight),
        valid=has_data,
        s_w=s_w_t,
        s_dir=s_dir_t,
        s_count=s_count_t,
        alpha_scale=alpha_scale,
        **extra,
    )


def fit_from_records(grid: GuidingGrid, rec: PathRecord, psum_axis: str | None = None) -> GuidingGrid:
    """Full fitting step; inside shard_map pass ``psum_axis`` to all-reduce
    the statistics across devices before the parameter update."""
    s_w, s_dir, s_count, s_rho, s_pos, s_pos_w = accumulate_stats(grid, rec)
    if psum_axis is not None:
        s_w = jax.lax.psum(s_w, psum_axis)
        s_dir = jax.lax.psum(s_dir, psum_axis)
        s_count = jax.lax.psum(s_count, psum_axis)
        s_rho = jax.lax.psum(s_rho, psum_axis)
        s_pos = jax.lax.psum(s_pos, psum_axis)
        s_pos_w = jax.lax.psum(s_pos_w, psum_axis)
    return update_grid(grid, s_w, s_dir, s_count, s_rho, s_pos, s_pos_w)


SPLIT_THRESHOLD = 4096.0  # samples before a cell subdivides


def refine_grid(grid: GuidingGrid, threshold: float = SPLIT_THRESHOLD) -> GuidingGrid:
    """HOST-side adaptive refinement between progressions (the SD-tree
    split pass of Practical Path Guiding, re-shaped for fixed-capacity flat
    tables): leaf cells whose accumulated sample count exceeds
    ``threshold`` get 8 children appended, seeded with the parent's mixture
    and 1/8 of its (EMA) statistics.  Topology is frozen again afterwards,
    so device code never sees a dynamic structure."""
    import numpy as np

    from mitsuba_path_guiding_tpu.guiding.grid import MAX_REFINE_LEVELS

    child_base = np.asarray(grid.child_base).copy()
    level = np.asarray(grid.level).copy()
    count = np.asarray(grid.s_count)
    n_used = int(grid.n_used)
    capacity = child_base.shape[0]

    is_leaf = child_base < 0
    in_use = np.arange(capacity) < n_used
    want = in_use & is_leaf & (count > threshold) & (level < MAX_REFINE_LEVELS)
    idx = np.nonzero(want)[0]
    if idx.size == 0 or n_used >= capacity:
        return grid
    # split highest-count cells first while capacity lasts
    idx = idx[np.argsort(-count[idx])]
    n_fit = min(idx.size, (capacity - n_used) // 8)
    if n_fit == 0:
        return grid
    idx = idx[:n_fit]

    mu = np.asarray(grid.mu).copy()
    kappa = np.asarray(grid.kappa).copy()
    logw = np.asarray(grid.log_weight).copy()
    valid = np.asarray(grid.valid).copy()
    s_w = np.asarray(grid.s_w).copy()
    s_dir = np.asarray(grid.s_dir).copy()
    s_count = np.asarray(grid.s_count).copy()
    s_rho = np.asarray(grid.s_rho).copy() if grid.s_rho is not None else None
    s_pos = np.asarray(grid.s_pos).copy() if grid.s_pos is not None else None
    s_pos_w = np.asarray(grid.s_pos_w).copy() if grid.s_pos_w is not None else None
    origin = np.asarray(grid.origin).copy() if grid.origin is not None else None
    lobe_dist = np.asarray(grid.lobe_dist).copy() if grid.lobe_dist is not None else None
    a_scale = np.asarray(grid.alpha_scale).copy() if grid.alpha_scale is not None else None

    for parent in idx:
        base = n_used
        child_base[parent] = base
        rows = slice(base, base + 8)
        child_base[rows] = -1
        level[rows] = level[parent] + 1
        mu[rows] = mu[parent]
        kappa[rows] = kappa[parent]
        logw[rows] = logw[parent]
        valid[rows] = valid[parent]
        s_w[rows] = s_w[parent] / 8.0
        s_dir[rows] = s_dir[parent] / 8.0
        s_count[rows] = s_count[parent] / 8.0
        if a_scale is not None:
            a_scale[rows] = a_scale[parent]
        if s_rho is not None:
            s_rho[rows] = s_rho[parent] / 8.0
            s_pos[rows] = s_pos[parent] / 8.0
            s_pos_w[rows] = s_pos_w[parent] / 8.0
            origin[rows] = origin[parent]
            lobe_dist[rows] = lobe_dist[parent]
        n_used += 8

    extra = {}
    if a_scale is not None:
        extra["alpha_scale"] = jnp.asarray(a_scale)
    if s_rho is not None:
        extra |= dict(
            s_rho=jnp.asarray(s_rho), s_pos=jnp.asarray(s_pos),
            s_pos_w=jnp.asarray(s_pos_w), origin=jnp.asarray(origin),
            lobe_dist=jnp.asarray(lobe_dist),
        )
    return grid._replace(
        mu=jnp.asarray(mu), kappa=jnp.asarray(kappa), log_weight=jnp.asarray(logw),
        valid=jnp.asarray(valid), s_w=jnp.asarray(s_w), s_dir=jnp.asarray(s_dir),
        s_count=jnp.asarray(s_count), child_base=jnp.asarray(child_base),
        level=jnp.asarray(level), n_used=jnp.int32(n_used), **extra,
    )
