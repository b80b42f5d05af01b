"""Neural denoiser: a compact U-Net over albedo-demodulated log radiance
with albedo/normal/depth feature buffers.

The quality-class counterpart of the reference fork's OIDN wrapper
(/root/reference/src/librender/denoiser.cpp:38-58: "RT" filter over
color+albedo+normal with optional auxiliary prefiltering).  OIDN's weights
cannot be shipped here, so this is a from-scratch small U-Net trained on
renders from THIS framework (tools/train_denoiser.py); the checked-in
weights live in mitsuba_path_guiding_tpu/data/denoiser_weights.npz.

Design notes (TPU): convolutions are MXU work — the whole network is a
single fused XLA program, NHWC layout, bf16 weights.  The network
predicts demodulated log-irradiance, so texture detail survives exactly
(it is multiplied back in from the albedo buffer), matching OIDN's
albedo-demodulation practice.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

CH = (24, 48, 80)      # channels per U-Net level
# demod log color (3) + demod log A-TROUS base (3) + albedo (3) +
# normal (3) + depth (1).  The network refines the a-trous
# cross-bilateral result (a residual over its demodulated log), so its
# worst collapse point is the classical filter, never the noisy input —
# the OIDN-style cascade over prefiltered auxiliaries (denoiser.cpp
# cleanAux) taken one step further.
IN_CH = 13
_WEIGHTS_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "denoiser_weights.npz",
)


def _conv_spec():
    """[(name, k, cin, cout, stride)] for the full network."""
    c1, c2, c3 = CH
    return [
        ("e1a", 3, IN_CH, c1, 1), ("e1b", 3, c1, c1, 1),
        ("e2a", 3, c1, c2, 2), ("e2b", 3, c2, c2, 1),
        ("e3a", 3, c2, c3, 2), ("e3b", 3, c3, c3, 1),
        ("d2a", 3, c3 + c2, c2, 1), ("d2b", 3, c2, c2, 1),
        ("d1a", 3, c2 + c1, c1, 1), ("d1b", 3, c1, c1, 1),
        ("out", 3, c1, 3, 1),
    ]


def init_params(key) -> dict:
    """He-initialized parameter pytree; the residual head starts at ZERO.

    Zero-initializing ``out`` makes the untrained network the identity
    over the a-trous base — training descends FROM the baseline instead
    of from He-noise far above it.  With a noisy head start, 3/6 round-4
    seeds collapsed into the zero-residual local minimum (dying-ReLU
    path: the fastest loss drop is killing the head, and nothing revives
    it); zero-init removes that cliff entirely (round-5 sweep: 6/6 seeds
    converge non-trivially)."""
    params = {}
    for name, k, cin, cout, _ in _conv_spec():
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (k, k, cin, cout)) * np.sqrt(2.0 / (k * k * cin))
        if name == "out":
            w = jnp.zeros_like(w)
        params[name + "_w"] = w.astype(jnp.float32)
        params[name + "_b"] = jnp.zeros((cout,), jnp.float32)
    return params


def n_params(params) -> int:
    return int(sum(np.prod(v.shape) for v in params.values()))


def _conv(params, name, x, stride=1):
    w = params[name + "_w"].astype(x.dtype)
    b = params[name + "_b"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype) + b


def _relu(x):
    return jnp.maximum(x, 0.0)


def _up2(x):
    n, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
    ).reshape(n, h * 2, w * 2, c)


def apply_net(params, x):
    """x (N, H, W, IN_CH) -> residual (N, H, W, 3); H, W multiples of 4."""
    e1 = _relu(_conv(params, "e1b", _relu(_conv(params, "e1a", x))))
    e2 = _relu(_conv(params, "e2b", _relu(_conv(params, "e2a", e1, 2))))
    e3 = _relu(_conv(params, "e3b", _relu(_conv(params, "e3a", e2, 2))))
    d2 = jnp.concatenate([_up2(e3), e2], axis=-1)
    d2 = _relu(_conv(params, "d2b", _relu(_conv(params, "d2a", d2))))
    d1 = jnp.concatenate([_up2(d2), e1], axis=-1)
    d1 = _relu(_conv(params, "d1b", _relu(_conv(params, "d1a", d1))))
    return _conv(params, "out", d1)


ALBEDO_EPS = 1e-3


def pack_inputs(color, base, albedo, normal, depth):
    """color/base/albedo/normal (H,W,3) + depth (H,W) -> (H,W,IN_CH)
    network input + the demodulated log BASE the output is a residual
    over.  ``base`` is the a-trous prefiltered color."""
    alb = jnp.maximum(albedo, ALBEDO_EPS)
    demod = jnp.log1p(jnp.maximum(color, 0.0) / alb)
    demob = jnp.log1p(jnp.maximum(base, 0.0) / alb)
    dep = jnp.log1p(jnp.maximum(depth, 0.0))[..., None]
    x = jnp.concatenate([demod, demob, albedo, normal, dep], axis=-1)
    return x, demob, alb


@partial(jax.jit, static_argnames=())
def denoise_neural_params(params, color, albedo, normal, depth):
    """Denoise one (H, W, 3) HDR image given its feature buffers.

    (A 4-flip self-ensemble was measured WORSE than the single pass on
    the held-out gate — the net is not flip-equivariant enough — so one
    pass it is.)"""
    from mitsuba_path_guiding_tpu.film.denoise import denoise_hdr

    base = denoise_hdr(color, albedo, normal, depth)
    h, w = color.shape[:2]
    ph = (-h) % 4
    pw = (-w) % 4
    x, demob, alb = pack_inputs(color, base, albedo, normal, depth)
    xp = jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")[None]

    res = apply_net(params, xp)[0, :h, :w]
    # bounded refinement: the residual may move the a-trous base by at
    # most ~+-40% radiance — the net's improvements live well inside
    # this; runaway extrapolations on unseen content do not
    out_log = jnp.maximum(demob + jnp.clip(res, -0.35, 0.35), 0.0)
    return jnp.expm1(out_log) * alb


_PARAMS_CACHE = None


def load_params(path: str | None = None):
    """Checked-in trained weights (bf16 npz) -> f32 param pytree."""
    global _PARAMS_CACHE
    if _PARAMS_CACHE is not None and path is None:
        return _PARAMS_CACHE
    p = path or _WEIGHTS_FILE
    if not os.path.exists(p):
        return None
    with np.load(p) as z:
        params = {k: jnp.asarray(z[k], jnp.float32) for k in z.files}
    if path is None:
        _PARAMS_CACHE = params
    return params


def denoise_neural(color, albedo, normal, depth):
    """Denoise with the checked-in weights; falls back to the a-trous
    cross-bilateral filter when no weights are available."""
    params = load_params()
    if params is None:
        from mitsuba_path_guiding_tpu.film.denoise import denoise_hdr

        return denoise_hdr(color, albedo, normal, depth)
    return denoise_neural_params(params, color, albedo, normal, depth)
