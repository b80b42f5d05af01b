"""Reconstruction filters (box/tent/gaussian/mitchell/catmullrom/lanczos).

Counterpart of /root/reference/include/mitsuba/core/rfilter.h and
src/rfilters/ (398 LoC): pure weight functions w(dx) evaluated at splat
time.  The film splats each sample into a (2R)x(2R) pixel footprint with
scatter-add (reference ImageBlock::put, imageblock.h:131-188, discretizes
weights into a lookup table; XLA fuses the direct evaluation just fine).
"""
from __future__ import annotations

import jax.numpy as jnp

FILTERS = {}


def _register(name, radius):
    def deco(fn):
        FILTERS[name] = (fn, radius)
        return fn

    return deco


@_register("box", 0.5)
def box(x):
    return jnp.where(jnp.abs(x) <= 0.5, 1.0, 0.0)


@_register("tent", 1.0)
def tent(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


@_register("gaussian", 2.0)
def gaussian(x, stddev=0.5):
    alpha = -1.0 / (2.0 * stddev * stddev)
    r = 2.0
    return jnp.maximum(0.0, jnp.exp(alpha * x * x) - jnp.exp(alpha * r * r))


def _mitchell_family(x, B, C):
    ax = jnp.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    y1 = ((12 - 9 * B - 6 * C) * ax3 + (-18 + 12 * B + 6 * C) * ax2 + (6 - 2 * B)) / 6
    y2 = (
        (-B - 6 * C) * ax3 + (6 * B + 30 * C) * ax2 + (-12 * B - 48 * C) * ax + (8 * B + 24 * C)
    ) / 6
    return jnp.where(ax < 1.0, y1, jnp.where(ax < 2.0, y2, 0.0))


@_register("mitchell", 2.0)
def mitchell(x):
    return _mitchell_family(x, 1.0 / 3.0, 1.0 / 3.0)


@_register("catmullrom", 2.0)
def catmullrom(x):
    return _mitchell_family(x, 0.0, 0.5)


@_register("lanczos", 3.0)
def lanczos(x, tau=3.0):
    px = jnp.pi * jnp.abs(x)
    core = jnp.where(
        px < 1e-6,
        1.0,
        jnp.sin(px) / jnp.maximum(px, 1e-6) * jnp.sin(px / tau) / jnp.maximum(px / tau, 1e-6),
    )
    return jnp.where(jnp.abs(x) < tau, core, 0.0)


def get_filter(name: str):
    """(weight_fn, integer support radius) for a filter name."""
    fn, radius = FILTERS[name]
    import math

    return fn, int(math.ceil(radius - 1e-6))
