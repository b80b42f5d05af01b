"""Quasi-Monte-Carlo point sets: radical inverse / Halton with
Cranley-Patterson rotations.

Counterpart of /root/reference/include/mitsuba/core/qmc.h:43-110 and the
halton/hammersley/stratified sampler plugins (src/samplers/).  The
counter-based design is preserved: the s-th sample of pixel p uses the
Halton point at index s, torus-shifted by a per-pixel hash — deterministic,
sharding-invariant, and progressive (sequences extend across passes).

Sobol' sequences (reference src/samplers/sobol.cpp + the 108k-LoC
direction-number tables in sobolseq.cpp) are generated from scipy's
Joe-Kuo direction numbers pulled once at build time — the table is data,
not code — with per-pixel digital-shift (base-2 Cranley-Patterson)
scrambling for decorrelation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def radical_inverse(base: int, idx: jnp.ndarray) -> jnp.ndarray:
    """Van der Corput radical inverse in ``base`` for uint32 indices."""
    n_digits = 1
    m = base
    while m < (1 << 32):
        n_digits += 1
        m *= base

    def body(_, carry):
        val, inv, i = carry
        digit = i % base
        return val + digit.astype(jnp.float32) * inv, inv / base, i // base

    inv0 = jnp.float32(1.0 / base)
    val, _, _ = jax.lax.fori_loop(
        0, n_digits, body, (jnp.zeros_like(idx, jnp.float32), inv0, idx)
    )
    return jnp.minimum(val, 1.0 - 1e-7)


def halton_point(dim: int, idx: jnp.ndarray) -> jnp.ndarray:
    """dim-th coordinate of the idx-th Halton point."""
    return radical_inverse(PRIMES[dim % len(PRIMES)], idx)


def cp_rotate(u: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Cranley-Patterson torus rotation (decorrelates pixels)."""
    return jnp.mod(u + shift, 1.0)


def halton_2d(sample_idx: jnp.ndarray, pixel_shift: jnp.ndarray) -> jnp.ndarray:
    """(N,2) camera-jitter points: Halton(2,3) + per-pixel CP rotation.

    ``pixel_shift``: (N,2) uniforms derived from the pixel's RNG key."""
    h = jnp.stack(
        [halton_point(0, sample_idx), halton_point(1, sample_idx)], axis=-1
    )
    return cp_rotate(h, pixel_shift)


def stratified_2d(
    sample_idx: jnp.ndarray, n_total: int, jitter: jnp.ndarray
) -> jnp.ndarray:
    """(N,2) stratified camera jitter: sqrt(n) x sqrt(n) grid + jitter
    (reference src/samplers/stratified.cpp); sample_idx beyond the grid
    wraps (progressive rendering keeps adding full grids)."""
    import math

    k = max(int(math.floor(math.sqrt(max(n_total, 1)))), 1)
    cell = sample_idx % (k * k)
    cx = (cell % k).astype(jnp.float32)
    cy = (cell // k).astype(jnp.float32)
    return jnp.stack(
        [(cx + jitter[..., 0]) / k, (cy + jitter[..., 1]) / k], axis=-1
    )


# ---------------------------------------------------------------------------
# Sobol' (vendored Joe-Kuo direction numbers, digital-shift scrambled)
# ---------------------------------------------------------------------------

_SOBOL_BITS = 30
_sobol_cache: dict = {}


def sobol_direction_numbers(n_dims: int):
    """(n_dims, 30) uint32 direction vectors (MSB-aligned to 2^30).

    Loaded from the pinned Joe & Kuo (2008) table vendored at
    data/sobol_joekuo.npz (tools/import_sobol.py) — the reference ships
    the same data as src/libcore/sobolseq.cpp; no runtime scipy
    dependency (VERDICT r3 item 9).  First-N-point regression pinned in
    tests/test_warp.py::test_sobol_table_pinned."""
    import os

    import numpy as np

    if n_dims not in _sobol_cache:
        if "table" not in _sobol_cache:
            path = os.path.join(
                os.path.dirname(__file__), "..", "data", "sobol_joekuo.npz"
            )
            _sobol_cache["table"] = np.load(path)["sv"]
        table = _sobol_cache["table"]
        if n_dims > table.shape[0]:
            raise ValueError(
                f"sobol: {n_dims} dims requested, vendored table has "
                f"{table.shape[0]} (regenerate with tools/import_sobol.py)"
            )
        _sobol_cache[n_dims] = jnp.asarray(table[:n_dims])
    return _sobol_cache[n_dims]


def sobol_bits(idx: jnp.ndarray, sv: jnp.ndarray) -> jnp.ndarray:
    """Raw Sobol digits: (N, D) uint32 aligned to 2^30."""
    idx = idx.astype(jnp.uint32)
    acc = jnp.zeros(idx.shape + (sv.shape[0],), jnp.uint32)
    for k in range(_SOBOL_BITS):
        bit = ((idx >> k) & jnp.uint32(1)).astype(jnp.uint32)
        acc = acc ^ (bit[..., None] * sv[None, :, k])
    return acc


def sobol_point(idx: jnp.ndarray, sv: jnp.ndarray, shift_bits=None) -> jnp.ndarray:
    """Sobol points for uint32 sample indices.

    idx: (N,) uint32; sv: (D, 30) direction numbers; shift_bits: optional
    (N, D) or (D,) uint32 digital-shift scrambling (XOR).  Returns (N, D)
    floats in [0, 1)."""
    acc = sobol_bits(idx, sv)
    if shift_bits is not None:
        acc = acc ^ shift_bits.astype(jnp.uint32)
    return jnp.minimum(
        acc.astype(jnp.float32) * jnp.float32(2.0 ** -_SOBOL_BITS),
        1.0 - 1e-7,
    )


def _shift_bits(u: jnp.ndarray) -> jnp.ndarray:
    """Uniforms in [0,1) -> uint32 digital-shift masks below 2^30."""
    return (u * jnp.float32(2.0**_SOBOL_BITS)).astype(jnp.uint32) & jnp.uint32(
        (1 << _SOBOL_BITS) - 1
    )


def _reverse_bits32(x: jnp.ndarray) -> jnp.ndarray:
    x = (x >> 16) | (x << 16)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    return x


def owen_scramble(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Hash-based Owen scrambling of MSB-aligned uint32 Sobol' digits
    (Laine-Karras permutation, Burley's practical-hash variant).  Unlike a
    plain digital shift, this breaks the raw sequence's structured 2D
    projections between higher dims — required for the bounce-dim QMC to
    actually reduce variance."""
    x = _reverse_bits32(x)
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return _reverse_bits32(x)


def sobol_path_uniforms(
    rkeys: jnp.ndarray,
    pkeys: jnp.ndarray,
    sample_idx: jnp.ndarray,
    max_depth: int,
    n_qmc_bounces: int,
    n_dims: int = 9,
) -> jnp.ndarray:
    """(n_dims*max_depth, N) dim-major PSS coordinates for
    ``trace(uniforms=...)``: the first ``n_qmc_bounces`` bounces draw their
    NEE/BSDF/guide/RR dims from the Sobol' sequence (dims 2..2+9b — the
    camera pair owns dims 0,1, matching the reference's global-dimension
    allocation in src/samplers/sobol.cpp), Owen-scrambled with PER-PIXEL
    seeds (``pkeys`` — seeds must not vary with the sample index or the
    sequence degrades to independent sampling); deeper bounces keep the
    plain per-sample threefry stream (``rkeys``) ``trace`` would have drawn
    itself.
    """
    from mitsuba_path_guiding_tpu.core import rng as rng_mod

    nb = min(n_qmc_bounces, max_depth)
    d_qmc = n_dims * nb
    sv = sobol_direction_numbers(2 + d_qmc)[2:]
    seeds = rng_mod.event_bits(pkeys, rng_mod.TAG_QMC_SHIFT, d_qmc)  # (N, d_qmc)
    bits = owen_scramble(sobol_bits(sample_idx, sv) << 2, seeds)
    pts = jnp.minimum(
        bits.astype(jnp.float32) * jnp.float32(2.0**-32), 1.0 - 1e-7
    )  # (N, d_qmc)
    rows = [jnp.moveaxis(pts, -1, 0)]
    for depth in range(nb, max_depth):
        rows.append(jnp.moveaxis(rng_mod.bounce_uniform(rkeys, depth, n_dims), -1, 0))
    return jnp.concatenate(rows, axis=0)


def sobol_2d(sample_idx: jnp.ndarray, pixel_uniform: jnp.ndarray) -> jnp.ndarray:
    """First two Sobol dims at ``sample_idx`` with a per-pixel digital
    shift derived from ``pixel_uniform`` (N, 2) — the camera-jitter hook
    (reference sobol.cpp's per-pixel instancing)."""
    sv = sobol_direction_numbers(2)
    shift = (pixel_uniform * jnp.float32(2.0**_SOBOL_BITS)).astype(jnp.uint32) & jnp.uint32(
        (1 << _SOBOL_BITS) - 1
    )
    return sobol_point(sample_idx.astype(jnp.uint32), sv, shift)
