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
EMA = 0.7            # statistics carry-over between progressions
WEIGHT_FLOOR = 1e-3  # mixture weight floor (lobe-death guard)
KAPPA_FIT_MAX = 5e3


@jax.jit
def accumulate_stats(grid: GuidingGrid, rec: PathRecord):
    """One E-step + local statistics accumulation from a PathRecord batch.

    Returns (s_w (C,K), s_dir (C,K,3), s_count (C,)) — linear, psum-able."""
    pos = rec.pos.reshape(-1, 3)
    d = rec.dir.reshape(-1, 3)
    li = rec.li.reshape(-1)
    pdf = rec.pdf.reshape(-1)
    valid = rec.valid.reshape(-1)

    w_sample = jnp.where(valid, li / jnp.maximum(pdf, 1e-3), 0.0)
    w_sample = jnp.minimum(w_sample, 1e4)  # firefly guard for the fit
    cid = cell_index(grid, pos)

    # E-step responsibilities under current mixture
    mix_w = mixture_weights(grid, cid)                 # (N, K)
    p_k = vmf_pdf(d[:, None, :], grid.mu[cid], grid.kappa[cid])  # (N, K)
    resp = mix_w * jnp.maximum(p_k, 1e-12)
    resp = resp / jnp.maximum(jnp.sum(resp, axis=-1, keepdims=True), 1e-12)
    # cold cells: split the sample evenly (uniform responsibilities)
    cold = ~grid.valid[cid]
    resp = jnp.where(cold[:, None], 1.0 / resp.shape[-1], resp)

    rw = resp * w_sample[:, None]                      # (N, K)
    c = grid.mu.shape[0]
    s_w = jax.ops.segment_sum(rw, cid, num_segments=c)
    s_dir = jax.ops.segment_sum(rw[..., None] * d[:, None, :], cid, num_segments=c)
    s_count = jax.ops.segment_sum(valid.astype(jnp.float32), cid, num_segments=c)
    return s_w, s_dir, s_count


@jax.jit
def update_grid(grid: GuidingGrid, s_w, s_dir, s_count) -> GuidingGrid:
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

    lobe_ok = (s_w_t > 1e-9) & (norm_dir > 1e-12)
    mu = jnp.where(lobe_ok[..., None], new_mu, grid.mu)
    kappa = jnp.where(lobe_ok, new_kappa, grid.kappa)

    return grid._replace(
        mu=mu,
        kappa=kappa,
        log_weight=jnp.log(new_weight),
        valid=has_data,
        s_w=s_w_t,
        s_dir=s_dir_t,
        s_count=s_count_t,
    )


def fit_from_records(grid: GuidingGrid, rec: PathRecord, psum_axis: str | None = None) -> GuidingGrid:
    """Full fitting step; inside shard_map pass ``psum_axis`` to all-reduce
    the statistics across devices before the parameter update."""
    s_w, s_dir, s_count = accumulate_stats(grid, rec)
    if psum_axis is not None:
        s_w = jax.lax.psum(s_w, psum_axis)
        s_dir = jax.lax.psum(s_dir, psum_axis)
        s_count = jax.lax.psum(s_count, psum_axis)
    return update_grid(grid, s_w, s_dir, s_count)
