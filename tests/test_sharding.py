"""Multi-device sharding tests on the virtual 8-device CPU mesh:
N-device == 1-device reproducibility (counter-based RNG design, SURVEY.md
§5.3/§7) and sharded guiding training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.parallel.mesh import make_device_mesh, render_sharded
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


@pytest.fixture(scope="module")
def scene():
    return build_scene(cornell_box())


def test_eight_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_sharded_matches_single_device(scene):
    cfg = RenderConfig(width=16, height=16, spp=4, max_depth=4, seed=0)
    mesh = make_device_mesh()
    img8, _, nseg = render_sharded(scene, cfg, mesh)
    img1 = np.asarray(render(scene, cfg))
    # identical samples by construction; only splat-order float reassociation
    np.testing.assert_allclose(np.asarray(img8), img1, atol=1e-5, rtol=1e-5)
    assert nseg > 0


def test_sharded_subset_mesh_matches(scene):
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=3, seed=1)
    img2, _, _ = render_sharded(scene, cfg, make_device_mesh(jax.devices()[:2]))
    img4, _, _ = render_sharded(scene, cfg, make_device_mesh(jax.devices()[:4]))
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img4), atol=1e-5, rtol=1e-5)


def test_sharded_guided_training(scene):
    cfg = RenderConfig(width=24, height=24, spp=16, max_depth=4, seed=0)
    mesh = make_device_mesh()
    guide = make_guide_fn(0.5)
    img, grid, _ = render_sharded(scene, cfg, mesh, guide=guide, fit_every=8)
    assert np.isfinite(np.asarray(img)).all()
    assert int(np.asarray(grid.valid).sum()) > 0
    # unbiasedness vs unguided
    ref = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=16, max_depth=4, seed=4)))
    assert abs(float(np.asarray(img).mean()) - ref.mean()) / ref.mean() < 0.08


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4096, 3)
    g.dryrun_multichip(8)


def test_sharded_pairs_accel_big_scene():
    """VERDICT r2 item 4: the real large-scene accel path (pair-expansion
    lists + Pallas-class kernels, interpret/XLA variants on CPU) must
    execute under shard_map on the 8-device mesh and match 1 device."""
    from mitsuba_path_guiding_tpu.parallel.mesh import (
        init_sharded_film,
        make_sharded_step,
        merge_film,
    )
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import door_room

    scene = build_scene(door_room(120_000))
    assert scene.pairs is not None and scene.blocks is not None
    n_tris = int(scene.geo.p0.shape[0])
    assert n_tris > 100_000
    cfg = RenderConfig(width=16, height=16, spp=1, max_depth=2,
                       accel="twolevel")
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    sidx = jnp.zeros_like(pix)

    films = {}
    for n_dev in (1, 8):
        mesh = make_device_mesh(jax.devices()[:n_dev])
        step = make_sharded_step(scene, cfg, mesh)
        rgbw = init_sharded_film(cfg, mesh)
        rgbw, _, n_seg = step(pix, sidx, rgbw, None)
        films[n_dev] = np.asarray(merge_film(rgbw))
        assert np.isfinite(films[n_dev]).all()
        assert films[n_dev][:, 3].sum() > 0
    np.testing.assert_allclose(films[1], films[8], rtol=1e-5, atol=1e-6)


def test_sharded_checkpoint_resume_equality(scene, tmp_path):
    """VERDICT r3 item 10: mid-render checkpoint/resume on the 8-device
    mesh must reproduce the uninterrupted sharded GUIDED render: 2 spp,
    save film+grid through utils/checkpoint, reload, continue 2 spp with
    sample_offset — the combined film equals the straight 4 spp run
    (counter-based RNG: identical samples; only splat reassociation)."""
    from mitsuba_path_guiding_tpu.film.film import Film, develop, new_film
    from mitsuba_path_guiding_tpu.utils.checkpoint import (
        load_renderer_state,
        save_renderer_state,
    )

    cfg4 = RenderConfig(width=16, height=16, spp=4, max_depth=3, seed=0)
    cfg2 = RenderConfig(width=16, height=16, spp=2, max_depth=3, seed=0)
    mesh = make_device_mesh()
    guide = make_guide_fn(0.5)

    img4, _, _ = render_sharded(scene, cfg4, mesh, guide=guide, fit_every=2)

    class _Shim:
        pass

    # first half + checkpoint (film is stored as accumulated rgb_weight)
    img_a, grid_a, _ = render_sharded(scene, cfg2, mesh, guide=guide,
                                      fit_every=2)
    r = _Shim()
    n_pix = 16 * 16
    rgbw_a = jnp.concatenate(
        [jnp.asarray(img_a).reshape(n_pix, 3) * 2.0,
         jnp.full((n_pix, 1), 2.0)], axis=1)
    r.film = Film(rgb_weight=rgbw_a, width=16, height=16)
    r.sample_counter = 2
    r.progression = 1
    r.grid = grid_a
    path = str(tmp_path / "ckpt.npz")
    save_renderer_state(r, path)

    # resume in a fresh shim
    r2 = _Shim()
    r2.film = new_film(16, 16)
    r2.sample_counter = 0
    r2.progression = 0
    r2.grid = grid_a  # non-None so the loader restores the grid fields
    load_renderer_state(r2, path)
    assert r2.sample_counter == 2 and r2.progression == 1

    img_b, _, _ = render_sharded(scene, cfg2, mesh, guide=guide,
                                 fit_every=2, grid=r2.grid,
                                 sample_offset=2)
    rgbw_b = jnp.concatenate(
        [jnp.asarray(img_b).reshape(n_pix, 3) * 2.0,
         jnp.full((n_pix, 1), 2.0)], axis=1)
    combined = develop(Film(
        rgb_weight=r2.film.rgb_weight + rgbw_b, width=16, height=16))
    np.testing.assert_allclose(np.asarray(combined), np.asarray(img4),
                               atol=2e-5, rtol=2e-5)


def test_sharded_guided_pairs_at_scale():
    """VERDICT r3 item 10 (depth): the guided + pair-accel path at
    128x128 depth-5 on the 8-device mesh — the production shape, not a
    compile smoke: full candidate-list/sort/kernel/fallback pipeline
    with the vMF cache training, one progression, finite and non-empty
    with the guiding statistics populated."""
    from mitsuba_path_guiding_tpu.guiding.fit import update_grid
    from mitsuba_path_guiding_tpu.guiding.grid import make_grid
    from mitsuba_path_guiding_tpu.parallel.mesh import (
        init_sharded_film,
        make_sharded_step,
        merge_film,
        merge_stats,
    )
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import door_room

    big = build_scene(door_room(120_000))
    assert big.pairs is not None
    cfg = RenderConfig(width=128, height=128, spp=1, max_depth=5,
                       accel="twolevel")
    mesh = make_device_mesh()
    guide = make_guide_fn(0.5)
    grid = make_grid(big.aabb_min, big.aabb_max, res=8, n_lobes=4)
    step = make_sharded_step(big, cfg, mesh, guide=guide)
    n_pix = cfg.width * cfg.height
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    rgbw = init_sharded_film(cfg, mesh)
    rgbw, stats, n_seg = step(pix, jnp.zeros_like(pix), rgbw, grid)
    film = merge_film(rgbw)
    assert np.isfinite(np.asarray(film)).all()
    assert float(np.asarray(film)[:, 3].sum()) == n_pix
    assert int(jnp.sum(n_seg)) > n_pix  # depth-5 paths bounced
    grid = update_grid(grid, *merge_stats(stats))
    assert float(np.asarray(grid.s_count).sum()) > 0
