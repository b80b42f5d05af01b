"""Two-level superblock intersector (ops/intersect_twolevel.py) vs the
brute-force oracle — the reference's kd-tree-vs-brute strategy
(test_kd.cpp, SURVEY.md §4) applied to the large-scene TPU path.  Runs the
Pallas kernel in interpreter mode on CPU."""
import numpy as np
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute
from mitsuba_path_guiding_tpu.ops.intersect_twolevel import (
    build_blocks,
    intersect_blocks,
    superblock_mask,
)
from mitsuba_path_guiding_tpu.scene.types import Geometry


def _soup(rs, t, spread=4.0, size=0.3):
    p0 = (rs.random((t, 3)).astype(np.float32) - 0.5) * spread
    e1 = (rs.random((t, 3)).astype(np.float32) - 0.5) * size
    e2 = (rs.random((t, 3)).astype(np.float32) - 0.5) * size
    return p0, e1, e2


def _geo(p0, e1, e2):
    t = len(p0)
    z3, z2 = jnp.zeros((t, 3)), jnp.zeros((t, 2))
    return Geometry(
        p0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n0=z3, n1=z3, n2=z3, uv0=z2, uv1=z2, uv2=z2,
        mat_id=jnp.zeros((t,), jnp.int32),
        emitter_id=jnp.zeros((t,), jnp.int32),
        shade_packed=jnp.zeros((t, 32)),
    )


def test_twolevel_matches_brute():
    rs = np.random.default_rng(1)
    p0, e1, e2 = _soup(rs, 2500)
    bt = build_blocks(p0, e1, e2)
    n = 700
    o = (rs.random((n, 3)).astype(np.float32) - 0.5) * 6
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 3.0e38)
    t, prim, u, v, valid = intersect_blocks(
        bt, jnp.asarray(o), jnp.asarray(d), tmax, interpret=True
    )
    ref = intersect_brute(_geo(p0, e1, e2), jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    m = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(prim)[m], np.asarray(ref.prim)[m])


def test_twolevel_respects_tmax():
    rs = np.random.default_rng(2)
    p0, e1, e2 = _soup(rs, 1200)
    bt = build_blocks(p0, e1, e2)
    n = 300
    o = (rs.random((n, 3)).astype(np.float32) - 0.5) * 6
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1.5)
    t, prim, u, v, valid = intersect_blocks(
        bt, jnp.asarray(o), jnp.asarray(d), tmax, interpret=True
    )
    ref = intersect_brute(_geo(p0, e1, e2), jnp.asarray(o), jnp.asarray(d),
                          tmax)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    assert (np.asarray(t)[np.asarray(valid)] <= 1.5).all()


def test_superblock_mask_conservative():
    """Every real hit's superblock must be flagged in its ray tile's mask
    (culling must never drop geometry)."""
    rs = np.random.default_rng(3)
    p0, e1, e2 = _soup(rs, 2000)
    bt = build_blocks(p0, e1, e2)
    n = 512
    o = (rs.random((n, 3)).astype(np.float32) - 0.5) * 6
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 3.0e38)
    mask, order = superblock_mask(bt, jnp.asarray(o), jnp.asarray(d), tmax)
    mask = np.asarray(mask)
    assert sorted(np.asarray(order).tolist()) == list(range(bt.sb_lo.shape[0]))
    ref = intersect_brute(_geo(p0, e1, e2), jnp.asarray(o), jnp.asarray(d))
    prim_sorted_pos = np.zeros(len(p0), np.int64)
    ids = np.asarray(bt.tri_pack[:, 9, :]).reshape(-1)
    for slot, orig in enumerate(ids):
        if orig >= 0:
            prim_sorted_pos[int(orig)] = slot
    from mitsuba_path_guiding_tpu.ops.intersect_twolevel import SB_TRIS

    for ray in np.nonzero(np.asarray(ref.valid))[0]:
        sb = prim_sorted_pos[int(np.asarray(ref.prim)[ray])] // SB_TRIS
        assert mask[ray // 512, sb] == 1
