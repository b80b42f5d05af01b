"""Quasi-Monte-Carlo point sets: radical inverse / Halton with
Cranley-Patterson rotations.

Counterpart of /root/reference/include/mitsuba/core/qmc.h:43-110 and the
halton/hammersley/stratified sampler plugins (src/samplers/).  The
counter-based design is preserved: the s-th sample of pixel p uses the
Halton point at index s, torus-shifted by a per-pixel hash — deterministic,
sharding-invariant, and progressive (sequences extend across passes).

The reference's Sobol' sampler relies on 108k LoC of direction-number
tables (src/samplers/sobolseq.cpp); round 1 ships Halton + stratified and
documents Sobol as future work (PARITY.md).
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
