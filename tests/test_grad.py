"""Differentiable rendering: gradients of pixel values w.r.t. BSDF/emitter
parameters (BASELINE.md north-star: forward+backward matching finite
differences).  The wavefront tracer is pure jnp, so jax.grad flows through
the packed material/emitter tables; sampling decisions are effectively
detached where pdfs cancel (diffuse albedo is exactly linear)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box, furnace


def _loss_fn(scene, n_rays=2048, spp_seeds=4, max_depth=4):
    ek = kinds_present(scene.emitters)
    mt = types_present(scene.mats)
    key = rng.base_key(0)
    pix = jnp.arange(n_rays, dtype=jnp.int32)

    def loss(mats_packed):
        mats = scene.mats._replace(packed=mats_packed)
        sc = scene._replace(mats=mats)
        total = 0.0
        for s in range(spp_seeds):
            rkeys = rng.ray_keys(key, pix, jnp.full_like(pix, s))
            u = rng.event_uniform(rkeys, 1 << 20, 2)
            o, d, _ = generate_rays(sc.sensor, 48, 48, pix, u)
            L, _, _ = trace(
                sc, o, d, rkeys, max_depth=max_depth, use_bvh=False,
                em_kinds=ek, mat_types=mt,
            )
            total = total + jnp.mean(L)
        return total / spp_seeds

    return loss


def test_grad_matches_finite_difference_albedo():
    scene = build_scene(furnace(albedo=0.5, env_radiance=1.0))
    loss = _loss_fn(scene)
    packed = scene.mats.packed

    g = jax.grad(loss)(packed)
    g_albedo = float(np.asarray(g)[0, 1:4].sum())

    eps = 1e-2
    def bump(dv):
        p = packed.at[0, 1:4].add(dv)
        return float(loss(p))

    fd = (bump(eps) - bump(-eps)) / (2 * eps * 3)
    assert g_albedo != 0.0
    rel = abs(g_albedo / 3 - fd) / max(abs(fd), 1e-9)
    assert rel < 0.05, (g_albedo / 3, fd, rel)


def test_grad_cornell_wall_color():
    """d(image)/d(red wall reflectance) is nonzero and finite on Cornell."""
    scene = build_scene(cornell_box())
    loss = _loss_fn(scene, n_rays=1024, spp_seeds=2)
    g = np.asarray(jax.grad(loss)(scene.mats.packed))
    assert np.isfinite(g).all()
    # every diffuse material's reflectance has influence
    refl_grads = g[:, 1:4]
    assert (np.abs(refl_grads).sum(axis=1) > 0).sum() >= 3


def test_grad_through_emitter_radiance():
    """Gradients w.r.t. emitter radiance via the packed emitter table are
    exactly linear (emission enters the estimator multiplicatively)."""
    scene = build_scene(cornell_box())
    ek = kinds_present(scene.emitters)
    mt = types_present(scene.mats)
    key = rng.base_key(1)
    pix = jnp.arange(1024, dtype=jnp.int32)
    rkeys = rng.ray_keys(key, pix, jnp.zeros_like(pix))
    u = rng.event_uniform(rkeys, 1 << 20, 2)
    o, d, _ = generate_rays(scene.sensor, 32, 32, pix, u)

    def loss(scale):
        em = scene.emitters
        em2 = em._replace(
            packed=em.packed.at[:, 2:5].mul(scale),
            env_radiance=em.env_radiance * scale,
        )
        geo2 = scene.geo._replace(
            shade_packed=scene.geo.shade_packed.at[:, 20:23].mul(scale)
        )
        sc = scene._replace(emitters=em2, geo=geo2)
        L, _, _ = trace(sc, o, d, rkeys, max_depth=3, use_bvh=False, em_kinds=ek, mat_types=mt)
        return jnp.mean(L)

    g = float(jax.grad(loss)(1.0))
    base = float(loss(1.0))
    # linear in emission: dL/dscale at 1 == L(1)
    assert abs(g - base) / max(base, 1e-9) < 1e-4
