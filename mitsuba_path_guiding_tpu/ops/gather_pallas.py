"""Pallas TPU kernel: transposed row gather for small parameter tables.

XLA's dynamic row gather on TPU runs at ~70 GB/s and is followed by a
layout copy whenever the consumer wants the (C, N) transposed view the
wavefront code uses (every packed-row table in this framework: material
rows, triangle shading rows, emitter rows — reference counterparts are the
virtual-dispatch parameter loads inside Li(), path.cpp:129-263).  Together
those gathers+copies were ~60% of a guided render wave on v5e.

For a table with few rows, a one-hot matmul on the MXU is ~10x faster and
emits the transposed layout directly: out (C, NT) = tableT (C, R) @
onehot (R, NT).  The table stays VMEM-resident across the whole grid.

Only worthwhile for small R (the matmul is O(R) work per lane): use for
R <= ~512; large tables (e.g. the 4096-cell guiding grid) stay on XLA's
gather.  Differentiable: custom_vjp with a segment-sum transpose (the
backward runs in plain XLA — it only executes under jax.grad).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 1024
MAX_ONEHOT_ROWS = 512  # beyond this the O(R)/lane matmul loses to a gather


def _kernel(tblt_ref, idx_ref, out_ref):
    idx = idx_ref[0, :]  # (NT,) int32
    r = tblt_ref.shape[1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (r, idx.shape[0]), 0) == idx[None, :]
    ).astype(jnp.float32)
    # precision=HIGHEST is LOAD-BEARING: the default f32 dot on the MXU
    # runs a single bf16 pass, silently rounding every gathered value to
    # 8-bit mantissa.  That quantized EMITTER GEOMETRY enough (~3e-3)
    # that area-light NEE shadow rays self-occluded against their own
    # source plane past the 1e-3 tmax margin — a systematic energy loss
    # in every TPU render with area lights (found round 4 via a 40x dark
    # indirect-lighting scene; test_gather_pallas_exact pins this).
    out_ref[...] = jnp.dot(
        tblt_ref[...], onehot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("interpret",))
def _gather_rows_t_impl(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    r, c = table.shape
    n = idx.shape[0]
    # pad: rows to a multiple of 8 sublanes (f32), lanes to the tile
    rpad = max(((r + 7) // 8) * 8, 8)
    cpad = ((c + 7) // 8) * 8
    tblt = jnp.zeros((cpad, rpad), table.dtype).at[:c, :r].set(table.T)
    npad = ((n + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    idx_p = jnp.zeros((1, npad), jnp.int32).at[0, :n].set(
        jnp.clip(idx.astype(jnp.int32), 0, r - 1)
    )
    out = pl.pallas_call(
        _kernel,
        grid=(npad // LANE_TILE,),
        in_specs=[
            pl.BlockSpec((cpad, rpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpad, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cpad, npad), jnp.float32),
        interpret=interpret,
    )(tblt, idx_p)
    return out[:c, :n]


@jax.custom_vjp
def _gather_rows_t_tpu(table, idx):
    return _gather_rows_t_impl(table, idx)


def _fwd(table, idx):
    return _gather_rows_t_impl(table, idx), (idx, table.shape)


def _bwd(res, g):
    idx, shape = res
    # transpose of a row gather = scatter-add of g's columns into the table
    gt = jnp.zeros(shape, g.dtype).at[jnp.clip(idx, 0, shape[0] - 1)].add(g.T)
    return gt, None


_gather_rows_t_tpu.defvjp(_fwd, _bwd)


def gather_rows_t(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(R, C) table, (N,) int32 indices -> (C, N) gathered-and-transposed.

    Uses the MXU one-hot kernel on TPU for small tables; falls back to
    XLA's gather elsewhere (CPU tests, huge tables, non-f32)."""
    r, c = table.shape
    if (
        jax.default_backend() == "tpu"
        and r <= MAX_ONEHOT_ROWS
        and table.dtype == jnp.float32
        and idx.ndim == 1
    ):
        return _gather_rows_t_tpu(table, idx)
    return table[jnp.clip(idx.astype(jnp.int32), 0, r - 1)].T
