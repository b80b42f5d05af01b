"""Block-list intersector (ops/intersect_blocklist.py) vs the brute-force
oracle — the reference's kd-tree-vs-brute strategy (test_kd.cpp,
SURVEY.md §4) applied to the candidate-list TPU path.  Pallas kernel runs
in interpreter mode on CPU."""
import numpy as np
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.blocks import build_blocklist, cut_treelets
from mitsuba_path_guiding_tpu.accel.bvh import build_bvh
from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute
from mitsuba_path_guiding_tpu.ops.intersect_blocklist import (
    candidate_superblocks,
    intersect_blocklist_raw,
    intersect_blocklist_sorted,
    _pad_rays,
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


def _rays(rs, n, spread=6.0):
    o = (rs.random((n, 3)).astype(np.float32) - 0.5) * spread
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _build(p0, e1, e2):
    bvh = build_bvh(p0, e1, e2)
    return build_blocklist(p0, e1, e2, bvh)


def _check_match(res, ref, tmax=None):
    t, prim, u, v, valid = res
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    m = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(prim)[m], np.asarray(ref.prim)[m])


def test_treelet_cut_partitions_prims():
    rs = np.random.default_rng(7)
    p0, e1, e2 = _soup(rs, 3000)
    bvh = build_bvh(p0, e1, e2)
    ranges = cut_treelets(np.asarray(bvh.child0), np.asarray(bvh.child1))
    seen = np.zeros(3000, bool)
    pidx = np.asarray(bvh.prim_idx)
    for s, c in ranges:
        assert 0 < c <= 128
        ids = pidx[s : s + c]
        assert not seen[ids].any(), "treelet ranges must not overlap"
        seen[ids] = True
    assert seen.all(), "treelet ranges must cover all triangles"


def test_blocklist_matches_brute():
    rs = np.random.default_rng(1)
    p0, e1, e2 = _soup(rs, 2500)
    bl = _build(p0, e1, e2)
    o, d = _rays(rs, 700)
    tmax = jnp.full((700,), 3.0e38)
    res = intersect_blocklist_raw(bl, o, d, tmax, interpret=True)
    ref = intersect_brute(_geo(p0, e1, e2), o, d)
    _check_match(res, ref)


def test_blocklist_sorted_matches_brute():
    rs = np.random.default_rng(3)
    p0, e1, e2 = _soup(rs, 1800)
    bl = _build(p0, e1, e2)
    o, d = _rays(rs, 513)  # deliberately not a tile multiple
    tmax = jnp.full((513,), 3.0e38)
    import mitsuba_path_guiding_tpu.ops.intersect_blocklist as m
    orig = m.intersect_blocklist_raw
    m.intersect_blocklist_raw = lambda bl, o, d, t: orig(bl, o, d, t, interpret=True)
    try:
        res = intersect_blocklist_sorted(bl, o, d, tmax)
    finally:
        m.intersect_blocklist_raw = orig
    ref = intersect_brute(_geo(p0, e1, e2), o, d)
    _check_match(res, ref)


def test_blocklist_respects_tmax():
    rs = np.random.default_rng(2)
    p0, e1, e2 = _soup(rs, 1200)
    bl = _build(p0, e1, e2)
    o, d = _rays(rs, 300)
    tmax = jnp.full((300,), 1.5)
    res = intersect_blocklist_raw(bl, o, d, tmax, interpret=True)
    ref = intersect_brute(_geo(p0, e1, e2), o, d, tmax=tmax)
    _check_match(res, ref)


def test_blocklist_overflow_fallback():
    """Candidate lists narrower than the hit count must fall back to the
    walk-everything path and stay correct."""
    rs = np.random.default_rng(4)
    p0, e1, e2 = _soup(rs, 2000)
    bl = _build(p0, e1, e2)
    o, d = _rays(rs, 256)
    tmax = jnp.full((256,), 3.0e38)
    res = intersect_blocklist_raw(bl, o, d, tmax, interpret=True, k=1)
    ref = intersect_brute(_geo(p0, e1, e2), o, d)
    _check_match(res, ref)


def test_blocklist_any_hit_matches_brute():
    rs = np.random.default_rng(6)
    p0, e1, e2 = _soup(rs, 1500)
    bl = _build(p0, e1, e2)
    o, d = _rays(rs, 400)
    from mitsuba_path_guiding_tpu.accel.traverse import occluded_brute
    from mitsuba_path_guiding_tpu.ops.intersect_blocklist import (
        occluded_blocklist_raw,
    )
    for tm in (3.0e38, 1.0):
        tmax = jnp.full((400,), tm)
        occ = occluded_blocklist_raw(bl, o, d, tmax, interpret=True)
        ref = occluded_brute(_geo(p0, e1, e2), o, d, tmax)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_candidate_lists_conservative():
    """Every superblock a ray actually enters must appear in its tile's
    candidate list (or the tile must be flagged overflow)."""
    rs = np.random.default_rng(5)
    p0, e1, e2 = _soup(rs, 3000)
    bl = _build(p0, e1, e2)
    o, d = _rays(rs, 512)
    tmax = jnp.full((512,), 3.0e38)
    o_p, d_p, t_p, npad = _pad_rays(o, d, tmax)
    cand, cnt = candidate_superblocks(bl.sb_lo, bl.sb_hi, o_p, d_p, t_p)
    cand = np.asarray(cand) & 0xFFFF
    cnt = np.asarray(cnt)
    k = cand.shape[1]

    # per-ray exact slab test vs every superblock
    on, dn = np.asarray(o_p), np.asarray(d_p)
    lo = np.asarray(bl.sb_lo)[None]   # (1, S, 3)
    hi = np.asarray(bl.sb_hi)[None]
    inv = 1.0 / np.where(np.abs(dn) < 1e-12, 1e-12, dn)
    t0 = (lo - on[:, None]) * inv[:, None]
    t1 = (hi - on[:, None]) * inv[:, None]
    tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
    tf = np.maximum(t0, t1).min(-1)
    ray_hits = tf >= tn                                    # (N, S)
    tile_hits = ray_hits.reshape(-1, 512, ray_hits.shape[1]).any(axis=1)
    for ti in range(tile_hits.shape[0]):
        if cnt[ti] > k:
            continue  # overflow tile: kernel walks everything
        listed = set(cand[ti, : cnt[ti]].tolist())
        needed = set(np.nonzero(tile_hits[ti])[0].tolist())
        assert needed <= listed, f"tile {ti} missing superblocks {needed - listed}"
