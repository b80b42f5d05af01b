"""Kelemen primary-sample-space MLT with massively parallel chains.

TPU-native counterpart of the reference's pssmlt plugin
(/root/reference/src/integrators/pssmlt/pssmlt.cpp:401 + the lazy PSS
sampler pssmlt_sampler.h:34-112 and the per-work-unit chain parallelism of
pssmlt_proc.cpp) — re-designed as SURVEY §2.6 P7 prescribes: instead of a
few long chains farmed out as work units, THOUSANDS of independent chains
run as wavefront lanes, each mutation step being one jitted wavefront
trace.  The PSS state is an explicit (D, N) uniform matrix driving
integrators/path.trace's ``uniforms`` hook.

Estimator (Kelemen et al. 2002): bootstrap with M uniform samples gives
the luminance normalization b and chain seeds ~ luminance; each mutation
splats both current (weight 1-a) and proposed (weight a) states scaled by
b / (samples * I); large steps with probability p_large keep ergodicity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.spectrum import luminance
from mitsuba_path_guiding_tpu.film.film import splat_raw
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.types import SceneData


def _path_eval(scene, cfg, u_mat, statics):
    """Evaluate the path integral at PSS coordinates.

    u_mat: (D, N) with rows 0:2 = film position, 2:4 = lens, 4: = bounce
    dims.  Returns (rgb (N,3), film_xy (N,2))."""
    em_kinds, mat_types, use_bvh, textured, sensor_kind = statics
    n = u_mat.shape[1]
    w, h = cfg.width, cfg.height
    fx = u_mat[0] * w
    fy = u_mat[1] * h
    ix = jnp.clip(fx.astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(fy.astype(jnp.int32), 0, h - 1)
    pid = iy * w + ix
    jitter = jnp.stack([fx - ix, fy - iy], axis=-1)
    o, d, film_xy = generate_rays(
        scene.sensor, w, h, pid, jitter,
        u_lens=jnp.stack([u_mat[2], u_mat[3]], axis=-1),
        kind=sensor_kind,
    )
    dummy_keys = rng.ray_keys(rng.base_key(0), pid, jnp.zeros_like(pid))
    L, _, _ = trace(
        scene, o, d, dummy_keys,
        max_depth=cfg.max_depth, rr_depth=10**6,  # RR off: PSS dims are finite
        use_nee=cfg.use_nee, use_bvh=use_bvh,
        em_kinds=em_kinds, mat_types=mat_types, textured=textured,
        uniforms=u_mat[4:],
    )
    if cfg.max_component_value > 0.0:
        L = jnp.minimum(L, cfg.max_component_value)
    return L, film_xy


def _mutate_small(u, key_bits, s1=1.0 / 1024.0, s2=1.0 / 64.0):
    """Kelemen symmetric log-scale perturbation of every coordinate
    (pssmlt_sampler.cpp mutate): du = s2 exp(-log(s2/s1) r), sign from a
    second bit, wrapped to [0,1)."""
    r = key_bits[0]
    sign = jnp.where(key_bits[1] < 0.5, 1.0, -1.0)
    du = s2 * jnp.exp(-jnp.log(s2 / s1) * r)
    v = u + sign * du
    return v - jnp.floor(v)


@partial(jax.jit, static_argnames=("cfg", "statics", "n_steps"))
def _chain_steps(scene, cfg, statics, u_cur, I_cur, C_cur, xy_cur, keys, step0, acc, n_steps, p_large):
    """Run n_steps mutations for all chains, accumulating splats into acc."""
    w, h = cfg.width, cfg.height

    def step(carry, i):
        u_cur, I_cur, C_cur, xy_cur, acc = carry
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, step0 + i)
        D = u_cur.shape[0]
        bits = jax.vmap(lambda kk: jax.random.uniform(kk, (2 * D + 2,)))(k).T  # (2D+2, N)
        large = bits[0] < p_large
        u_small = _mutate_small(u_cur, (bits[2 : D + 2], bits[D + 2 :]))
        # large steps use FRESH uniforms (bits rows 2:D+2 are fresh U(0,1))
        u_prop = jnp.where(large[None, :], bits[2 : D + 2], u_small)
        C_prop, xy_prop = _path_eval(scene, cfg, u_prop, statics)
        I_prop = luminance(C_prop)
        a = jnp.clip(I_prop / jnp.maximum(I_cur, 1e-12), 0.0, 1.0)
        # splat both states (Kelemen eq. 11 weights)
        w_cur = (1.0 - a) / jnp.maximum(I_cur, 1e-12)
        w_prop = a / jnp.maximum(I_prop, 1e-12)
        acc = splat_raw(acc, xy_cur, C_cur * w_cur[..., None], w, h)
        acc = splat_raw(acc, xy_prop, C_prop * w_prop[..., None], w, h)
        accept = bits[1] < a
        u_new = jnp.where(accept[None, :], u_prop, u_cur)
        return (
            u_new,
            jnp.where(accept, I_prop, I_cur),
            jnp.where(accept[..., None], C_prop, C_cur),
            jnp.where(accept[..., None], xy_prop, xy_cur),
            acc,
        ), None

    (u_cur, I_cur, C_cur, xy_cur, acc), _ = jax.lax.scan(
        step, (u_cur, I_cur, C_cur, xy_cur, acc), jnp.arange(n_steps)
    )
    return u_cur, I_cur, C_cur, xy_cur, acc


def render_pssmlt(
    scene: SceneData,
    cfg,
    n_chains: int = 8192,
    mutations_per_pixel: int | None = None,
    p_large: float = 0.3,
    bootstrap_factor: int = 4,
):
    """Full PSSMLT render.  cfg is a RenderConfig; cfg.spp is interpreted
    as mutations per pixel unless overridden.  Returns (H, W, 3)."""
    from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    w, h = cfg.width, cfg.height
    use_bvh = cfg.use_bvh
    if use_bvh is None:
        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS
    statics = (
        kinds_present(scene.emitters),
        types_present(scene.mats),
        use_bvh,
        int(scene.textures.shape[0] * scene.textures.shape[1]) > 1,
        int(scene.sensor.kind),
    )
    D = 4 + 9 * cfg.max_depth
    mpp = mutations_per_pixel or cfg.spp
    total_mutations = w * h * mpp
    n_steps_total = max(total_mutations // n_chains, 1)

    # --- bootstrap: normalization b + luminance-proportional seeds
    # (pssmlt.cpp's bootstrapping via PathSampler, :401)
    key = jax.random.PRNGKey(cfg.seed)
    kb, kseed, kchain = jax.random.split(key, 3)
    n_boot = bootstrap_factor * n_chains
    u_boot = jax.random.uniform(kb, (D, n_boot))
    C_boot, xy_boot = _path_eval(scene, cfg, u_boot, statics)
    I_boot = luminance(C_boot)
    b = float(jnp.mean(I_boot))
    if b <= 0.0:
        return jnp.zeros((h, w, 3))
    probs = I_boot / jnp.maximum(jnp.sum(I_boot), 1e-30)
    seed_idx = jax.random.choice(kseed, n_boot, shape=(n_chains,), p=probs)
    u_cur = u_boot[:, seed_idx]
    I_cur = jnp.maximum(I_boot[seed_idx], 1e-12)
    C_cur = C_boot[seed_idx]
    xy_cur = xy_boot[seed_idx]

    chain_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        kchain, jnp.arange(n_chains)
    )
    acc = jnp.zeros((h * w, 3), jnp.float32)
    block = 64
    done = 0
    while done < n_steps_total:
        m = min(block, n_steps_total - done)
        u_cur, I_cur, C_cur, xy_cur, acc = _chain_steps(
            scene, cfg, statics, u_cur, I_cur, C_cur, xy_cur, chain_keys,
            done, acc, m, p_large,
        )
        done += m
    n_samples = n_steps_total * n_chains
    # I_j = n_pix * b * E_pi[(C/I) 1_j]  (see module docstring derivation)
    img = acc.reshape(h, w, 3) * (b * (w * h) / n_samples)
    return img
