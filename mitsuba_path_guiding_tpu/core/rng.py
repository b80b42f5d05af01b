"""Counter-based, sharding-invariant random number generation.

Replaces the reference's SFMT ``Random`` (/root/reference/src/libcore/random.cpp)
and the fork's per-pixel salted-hash ``DeterministicSampler``
(/root/reference/src/samplers/deterministic.cpp:78-81) with a pure
counter-based design: every random draw is a deterministic function of
``(seed, pixel_id, sample_index, depth, dim)`` — never of device placement —
so an N-host render is bitwise identical to a 1-host render and lost shards
can be recomputed exactly (SURVEY.md §5.3/§7).

Built on JAX threefry keys; per-lane keys are derived with ``fold_in`` over
explicit logical indices carried in the wavefront arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Partitionable threefry so sharded draws match unsharded ones.
jax.config.update("jax_threefry_partitionable", True)


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def pixel_keys(key: jax.Array, pixel_id: jnp.ndarray) -> jax.Array:
    """Per-pixel key array (no sample index folded in) — the seed source for
    anything that must stay FIXED across a pixel's sample sequence, e.g.
    Cranley-Patterson rotations / Owen scramble seeds of QMC samplers.  A
    per-sample seed there silently degrades the sequence to independent
    sampling (the reference gets this for free from per-pixel persistent
    sampler instances, progressiveintegrator.cpp:38-52)."""
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pixel_id)


def ray_keys(key: jax.Array, pixel_id: jnp.ndarray, sample_idx: jnp.ndarray) -> jax.Array:
    """Per-ray key array from logical (pixel, sample) indices.

    ``pixel_id``/``sample_idx``: int32 (N,).  The analogue of the reference's
    per-pixel persistent samplers (progressiveintegrator.cpp:38-52) — sample
    sequences continue across progressions because ``sample_idx`` keeps
    counting globally.
    """
    return jax.vmap(jax.random.fold_in)(pixel_keys(key, pixel_id), sample_idx)


def bounce_uniform(rkeys: jax.Array, depth, n_dims: int) -> jnp.ndarray:
    """(N, n_dims) uniforms for one wavefront bounce.

    ``depth`` may be a traced scalar (bounce index inside lax.scan).
    """
    k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(rkeys, depth)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (n_dims,)))(k)


def event_uniform(rkeys: jax.Array, tag: int, n_dims: int) -> jnp.ndarray:
    """(N, n_dims) uniforms for a named one-off event (e.g. camera lens)."""
    return bounce_uniform(rkeys, jnp.int32(tag), n_dims)


def event_bits(rkeys: jax.Array, tag: int, n_dims: int) -> jnp.ndarray:
    """(N, n_dims) uint32 random bits for a named event (QMC scramble seeds)."""
    k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(rkeys, jnp.int32(tag))
    return jax.vmap(lambda kk: jax.random.bits(kk, (n_dims,), jnp.uint32))(k)


# Distinct fold-in tags so camera / bounce / NEE streams never collide.
# Bounce d uses tags [TAG_BOUNCE0 + d]; keep TAG_* below TAG_BOUNCE0.
TAG_CAMERA = 1 << 20
TAG_WAVELENGTH = (1 << 20) + 1
TAG_QMC_SHIFT = (1 << 20) + 2
TAG_BOUNCE0 = 0
