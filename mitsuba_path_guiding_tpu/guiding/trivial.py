"""Trivial (inactive) guiding state for the unguided fast path.

Empirically, routing plain BSDF sampling through the guided code shape with
selection probability 0 compiles to a ~2x faster TPU program than the
direct sample-then-continue form (XLA fusion/layout luck — measured in
tools/ablate.py), so unguided renders use this 1-cell never-valid grid.
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.guiding.grid import GuidingGrid


# NOTE: no lru_cache here — callers (render_scanned's scan body) may run
# under a jax trace, and caching the first call's TRACER arrays leaks
# them into later traces (UnexpectedTracerError).  The arrays are tiny
# trace-time constants; rebuilding per call is free.
def _trivial_arrays():
    return GuidingGrid(
        mu=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 1, 1)),
        kappa=jnp.zeros((1, 1)),
        log_weight=jnp.zeros((1, 1)),
        valid=jnp.zeros((1,), dtype=bool),
        s_w=jnp.zeros((1, 1)),
        s_dir=jnp.zeros((1, 1, 3)),
        s_count=jnp.zeros((1,)),
        aabb_min=jnp.zeros(3),
        aabb_max=jnp.ones(3),
        child_base=jnp.full((1,), -1, jnp.int32),
        level=jnp.zeros((1,), jnp.int32),
        res0=jnp.int32(1),
        n_used=jnp.int32(1),
    )


def trivial_grid() -> GuidingGrid:
    return _trivial_arrays()
