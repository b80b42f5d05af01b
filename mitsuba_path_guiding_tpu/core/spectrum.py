"""RGB spectrum representation and color conversions.

Counterpart of /root/reference/include/mitsuba/core/spectrum.h (built with
SPECTRUM_SAMPLES=3, i.e. RGB — the reference's default research config).
Spectra are plain (..., 3) float arrays; this module holds the conversions,
luminance weights, and sRGB transfer functions used by films and sensors
(reference spectrum.cpp / bitmap.cpp gamma handling).
"""
from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.709 luminance weights (reference spectrum.cpp getLuminance).
LUM_WEIGHTS = jnp.array([0.212671, 0.715160, 0.072169], dtype=jnp.float32)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(rgb * LUM_WEIGHTS, axis=-1)


def rgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    m = jnp.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        dtype=jnp.float32,
    )
    return rgb @ m.T


def xyz_to_rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    m = jnp.array(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875991, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ],
        dtype=jnp.float32,
    )
    return xyz @ m.T


def srgb_encode(linear: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB transfer (bitmap.cpp toSRGB path, used by ldrfilm)."""
    linear = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.power(jnp.maximum(linear, 1e-8), 1.0 / 2.4) - 0.055,
    )


def srgb_encode_np(linear):
    """Host-side (numpy) linear -> sRGB; preview/LDR paths avoid a device
    dispatch for tonemapping."""
    import numpy as np

    linear = np.clip(linear, 0.0, 1.0)
    return np.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * np.power(np.maximum(linear, 1e-8), 1.0 / 2.4) - 0.055,
    )


def srgb_decode(srgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        jnp.power((srgb + 0.055) / 1.055, 2.4),
    )


def max_component(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(rgb, axis=-1)


def reinhard_tonemap(rgb: jnp.ndarray, key: float = 0.18, burn: float = 0.0):
    """Photographic tonemapping (reference tonemap utility, utils/tonemap.cpp)."""
    lum = luminance(rgb)
    log_avg = jnp.exp(jnp.mean(jnp.log(jnp.maximum(lum, 1e-6))))
    scaled = rgb * (key / jnp.maximum(log_avg, 1e-12))
    lw = luminance(scaled)
    lwhite2 = jnp.maximum(jnp.max(lw), 1e-6) ** 2 if burn > 0 else jnp.inf
    ld = lw * (1.0 + lw / lwhite2) / (1.0 + lw)
    return scaled * (ld / jnp.maximum(lw, 1e-12))[..., None]
