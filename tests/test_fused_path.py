"""Fused megakernel tests (ops/fused_path.py): threefry bit-exactness vs a
NumPy oracle, interpret-mode agreement with the wavefront integrator on the
supported scene class (unguided + guided), and the support gate.

Strategy mirrors the reference's integrator cross-validation (SURVEY §4):
two independent implementations of the same estimator must agree within
Monte-Carlo tolerance on full images; deterministic sub-components
(RNG, first-hit geometry) must agree exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.ops.fused_path import (
    build_fused_tables,
    fused_supported,
    threefry2x32,
    trace_fused,
)
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


def _threefry_numpy(k0, k1, x0, x1):
    """Independent NumPy Threefry-2x32-20 oracle (Salmon et al. 2011)."""
    rot = (13, 15, 26, 6, 17, 29, 16, 24)
    m = np.uint64(0xFFFFFFFF)
    ks0, ks1 = np.uint64(k0), np.uint64(k1)
    ks2 = (ks0 ^ ks1 ^ np.uint64(0x1BD11BDA)) & m
    ks = (ks0, ks1, ks2)
    x0 = (np.uint64(x0) + ks0) & m
    x1 = (np.uint64(x1) + ks1) & m
    for d in range(5):
        for i in range(4):
            r = rot[(d % 2) * 4 + i]
            x0 = (x0 + x1) & m
            x1 = (((x1 << np.uint64(r)) | (x1 >> np.uint64(32 - r))) & m) ^ x0
        x0 = (x0 + ks[(d + 1) % 3]) & m
        x1 = (x1 + ks[(d + 2) % 3] + np.uint64(d + 1)) & m
    return int(x0), int(x1)


def test_threefry_matches_numpy_oracle():
    cases = [
        (0, 0, 0, 0),
        (0x13198A2E, 0x03707344, 0x243F6A88, 0x85A308D3),
        (0xDEADBEEF, 0xCAFEBABE, 1, 2),
        (1, 2, 3, 4),
    ]
    k0 = jnp.asarray([c[0] for c in cases], jnp.uint32)
    k1 = jnp.asarray([c[1] for c in cases], jnp.uint32)
    x0 = jnp.asarray([c[2] for c in cases], jnp.uint32)
    x1 = jnp.asarray([c[3] for c in cases], jnp.uint32)
    r0, r1 = threefry2x32(k0, k1, x0, x1)
    for i, c in enumerate(cases):
        e0, e1 = _threefry_numpy(*c)
        assert int(r0[i]) == e0 and int(r1[i]) == e1, (i, c)


def test_fused_supported_gate():
    assert fused_supported(build_scene(cornell_box()))
    desc = cornell_box()
    desc["shapes"][0]["bsdf"] = {"type": "conductor", "material": "Al"}
    assert not fused_supported(build_scene(desc))
    # record_paths / refined grids route back to the wavefront path
    assert not fused_supported(build_scene(cornell_box()), record_paths=True)
    assert not fused_supported(build_scene(cornell_box()), levels=1)


def _render_pair(scene, tables, W, H, spp, guided=False, grid=None):
    n_pix = W * H
    key = rng.base_key(0)
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    acc = np.zeros((n_pix, 3))
    accf = np.zeros((n_pix, 3))
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)
    guide = None
    if guided:
        from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn

        guide = make_guide_fn(0.5, mat_types, levels=0)
    depth_ok = True
    for s in range(spp):
        sidx = jnp.full_like(pix, s)
        rkeys = rng.ray_keys(key, pix, sidx)
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
        L, aux, _ = trace(
            scene, o, d, rkeys, max_depth=5, use_bvh=False,
            em_kinds=em_kinds, mat_types=mat_types,
            guide=guide, guide_state=grid, record_paths=False,
        )
        Lf, auxf, _ = trace_fused(
            tables, o, d, rkeys, grid=grid, max_depth=5, guided=guided,
            interpret=True,
        )
        acc += np.asarray(L)
        accf += np.asarray(Lf)
        if s == 0:
            # first-hit geometry is deterministic given the camera sample
            depth_ok = np.allclose(
                np.asarray(aux.depth_t), np.asarray(auxf.depth_t), atol=1e-3
            )
    return acc / spp, accf / spp, depth_ok


def test_fused_matches_wavefront_unguided():
    scene = build_scene(cornell_box())
    tables = build_fused_tables(scene)
    img, imgf, depth_ok = _render_pair(scene, tables, 24, 24, 48)
    assert depth_ok
    assert np.isfinite(imgf).all()
    # independent RNG streams: means agree within MC noise
    rel = abs(img.mean() - imgf.mean()) / max(img.mean(), 1e-9)
    assert rel < 0.04, (img.mean(), imgf.mean())


def test_fused_matches_wavefront_guided():
    from mitsuba_path_guiding_tpu.guiding.fit import accumulate_stats, update_grid
    from mitsuba_path_guiding_tpu.guiding.grid import make_grid

    scene = build_scene(cornell_box())
    tables = build_fused_tables(scene)
    grid = make_grid(scene.aabb_min, scene.aabb_max, res=4, n_lobes=8)
    # short real training via the wavefront integrator so valid cells and
    # concentrated lobes exercise the in-kernel mixture path
    from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn

    guide = make_guide_fn(0.5, types_present(scene.mats), levels=0)
    key = rng.base_key(7)
    pix = jnp.arange(32 * 32, dtype=jnp.int32)
    for s in range(8):
        rkeys = rng.ray_keys(key, pix, jnp.full_like(pix, s))
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, 32, 32, pix, u_cam)
        _, _, rec = trace(
            scene, o, d, rkeys, max_depth=5, use_bvh=False,
            guide=guide, guide_state=grid, record_paths=True,
            em_kinds=kinds_present(scene.emitters),
            mat_types=types_present(scene.mats),
        )
        grid = update_grid(grid, *accumulate_stats(grid, rec, levels=0))
    assert bool(np.asarray(grid.valid).any())
    img, imgf, depth_ok = _render_pair(
        scene, tables, 24, 24, 48, guided=True, grid=grid
    )
    assert depth_ok
    assert np.isfinite(imgf).all()
    rel = abs(img.mean() - imgf.mean()) / max(img.mean(), 1e-9)
    assert rel < 0.05, (img.mean(), imgf.mean())


def test_fused_deterministic():
    scene = build_scene(cornell_box())
    tables = build_fused_tables(scene)
    n = 256
    key = rng.base_key(3)
    pix = jnp.arange(n, dtype=jnp.int32)
    rkeys = rng.ray_keys(key, pix, jnp.zeros_like(pix))
    u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
    o, d, _ = generate_rays(scene.sensor, 16, 16, pix, u_cam)
    La, _, _ = trace_fused(tables, o, d, rkeys, max_depth=4, interpret=True)
    Lb, _, _ = trace_fused(tables, o, d, rkeys, max_depth=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))
