"""Energy-redistribution path tracing (wavefront, PSS mutations).

TPU-native counterpart of the reference's erpt plugin
(/root/reference/src/integrators/erpt/erpt.cpp + erpt_proc.cpp — per-pixel
short Metropolis chains seeded by PT samples, Cline et al. 2005).  The
reference mutates in PATH space with libbidir's lens/caustic/multi-chain
perturbations; this build redistributes in PRIMARY-SAMPLE space instead
(the pssmlt machinery, integrators/pssmlt.py), which keeps every mutation
a fixed-shape wavefront re-trace — the same re-design trade the massively
parallel PSSMLT makes (SURVEY §2.6 P7).

Estimator (equal-deposition redistribution): every seed path carries its
PT energy I0; a chain of M luminance-invariant Metropolis mutations
deposits per step
    (1-a) * e * C_cur/I_cur   at the current path's pixel
    a     * e * C_prop/I_prop at the proposed path's pixel
with e = I0 / M, so the seed's energy is exactly redistributed along the
chain (expected deposited luminance = I0).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.spectrum import luminance
from mitsuba_path_guiding_tpu.film.film import splat_raw
from mitsuba_path_guiding_tpu.integrators.pssmlt import _mutate_small, _path_eval
from mitsuba_path_guiding_tpu.scene.types import SceneData


@partial(jax.jit, static_argnames=("cfg", "statics", "n_steps"))
def _redistribute(scene, cfg, statics, u0, keys, acc, n_steps):
    """Seed at u0 (D, N) and run n_steps equal-deposition mutations."""
    w, h = cfg.width, cfg.height
    C0, xy0 = _path_eval(scene, cfg, u0, statics)
    I0 = luminance(C0)
    e = I0 / n_steps  # per-step deposition energy

    def step(carry, i):
        u_cur, I_cur, C_cur, xy_cur, acc = carry
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, i)
        D = u_cur.shape[0]
        bits = jax.vmap(lambda kk: jax.random.uniform(kk, (2 * D + 1,)))(k).T
        u_prop = _mutate_small(u_cur, (bits[1 : D + 1], bits[D + 1 :]))
        C_prop, xy_prop = _path_eval(scene, cfg, u_prop, statics)
        I_prop = luminance(C_prop)
        a = jnp.clip(I_prop / jnp.maximum(I_cur, 1e-12), 0.0, 1.0)
        a = jnp.where(I_cur > 0.0, a, 0.0)
        w_cur = (1.0 - a) * e / jnp.maximum(I_cur, 1e-12)
        w_prop = a * e / jnp.maximum(I_prop, 1e-12)
        acc = splat_raw(acc, xy_cur, C_cur * w_cur[..., None], w, h)
        acc = splat_raw(acc, xy_prop, C_prop * w_prop[..., None], w, h)
        accept = bits[0] < a
        return (
            jnp.where(accept[None, :], u_prop, u_cur),
            jnp.where(accept, I_prop, I_cur),
            jnp.where(accept[..., None], C_prop, C_cur),
            jnp.where(accept[..., None], xy_prop, xy_cur),
            acc,
        ), None

    (_, _, _, _, acc), _ = jax.lax.scan(
        step, (u0, I0, C0, xy0, acc), jnp.arange(n_steps)
    )
    return acc


def render_erpt(
    scene: SceneData,
    cfg,
    chain_length: int = 16,
):
    """Full ERPT render: cfg.spp seed paths per pixel, each redistributed
    along a ``chain_length`` mutation chain.  Returns (H, W, 3)."""
    from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    w, h = cfg.width, cfg.height
    n_pix = w * h
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
    key = jax.random.PRNGKey(cfg.seed)
    acc = jnp.zeros((n_pix, 3), jnp.float32)
    px = (jnp.arange(n_pix) % w).astype(jnp.float32)
    py = (jnp.arange(n_pix) // w).astype(jnp.float32)
    for s in range(cfg.spp):
        ks, kc = jax.random.split(jax.random.fold_in(key, s))
        u0 = jax.random.uniform(ks, (D, n_pix))
        # stratify the film dims over pixels (one seed per pixel per pass)
        u0 = u0.at[0].set((px + u0[0]) / w)
        u0 = u0.at[1].set((py + u0[1]) / h)
        chain_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            kc, jnp.arange(n_pix)
        )
        acc = _redistribute(scene, cfg, statics, u0, chain_keys, acc, chain_length)
    return (acc / jnp.float32(cfg.spp)).reshape(h, w, 3)
