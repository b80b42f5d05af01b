"""Pair-expansion intersector vs brute-force oracle (reference
test_kd.cpp brute-force comparison, SURVEY.md §4)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.bvh import build_bvh
from mitsuba_path_guiding_tpu.accel.blocks import build_blocklist
from mitsuba_path_guiding_tpu.accel.pairs import build_pair_table
from mitsuba_path_guiding_tpu.accel.traverse import (
    Hit,
    intersect_brute,
    occluded_brute,
)
from mitsuba_path_guiding_tpu.ops.intersect_pairs import intersect_pairs_raw

INF = 3.0e38


class _Geo:
    def __init__(self, p0, e1, e2):
        self.p0 = jnp.asarray(p0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)


@pytest.fixture(scope="module")
def soup():
    rs = np.random.default_rng(3)
    T = 6000
    c = rs.uniform(-4, 4, (T, 3)).astype(np.float32)
    p0 = c + rs.normal(0, 0.15, (T, 3)).astype(np.float32)
    e1 = rs.normal(0, 0.3, (T, 3)).astype(np.float32)
    e2 = rs.normal(0, 0.3, (T, 3)).astype(np.float32)
    bvh = build_bvh(p0, e1, e2)
    pt = build_pair_table(p0, e1, e2, bvh)
    rays_o = rs.uniform(-6, 6, (4096, 3)).astype(np.float32)
    rays_d = rs.normal(0, 1, (4096, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=1, keepdims=True)
    return _Geo(p0, e1, e2), pt, jnp.asarray(rays_o), jnp.asarray(rays_d)


import pytest


@pytest.mark.parametrize("engine", ["mt", "plk"])
def test_pairs_closest_hit_matches_brute(soup, engine):
    geo, pt, o, d = soup
    tmax = jnp.full((o.shape[0],), INF)
    t, prim, u, v, valid, proven = intersect_pairs_raw(
        pt, o, d, tmax, use_pallas=False, engine=engine
    )
    hb = intersect_brute(geo, o, d)
    pv = np.asarray(proven)
    assert pv.mean() > 0.9, f"proven rate too low: {pv.mean()}"
    assert (np.asarray(prim)[pv] == np.asarray(hb.prim)[pv]).all()
    hits = pv & np.asarray(valid)
    assert np.allclose(np.asarray(t)[hits], np.asarray(hb.t)[hits],
                       rtol=1e-5, atol=1e-6)
    assert np.allclose(np.asarray(u)[hits], np.asarray(hb.u)[hits],
                       rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("engine", ["mt", "plk"])
def test_pairs_any_hit_matches_brute(soup, engine):
    geo, pt, o, d = soup
    tmax = jnp.full((o.shape[0],), 5.0)
    occ, proven = intersect_pairs_raw(
        pt, o, d, tmax, any_hit=True, use_pallas=False, engine=engine
    )
    occ_b = occluded_brute(geo, o, d, tmax)
    pv = np.asarray(proven)
    assert pv.mean() > 0.9
    assert (np.asarray(occ)[pv] == np.asarray(occ_b)[pv]).all()


def test_pairs_full_fallback_is_exact(soup):
    """intersect_pairs_full (pair path + blocklist fallback for unproven
    rays) must agree with brute force on EVERY ray."""
    from mitsuba_path_guiding_tpu.accel.traverse import (
        intersect_pairs_full,
        occluded_pairs_full,
    )

    geo, pt, o, d = soup
    bl = build_blocklist(np.asarray(geo.p0), np.asarray(geo.e1),
                         np.asarray(geo.e2), build_bvh(
                             np.asarray(geo.p0), np.asarray(geo.e1),
                             np.asarray(geo.e2)))
    # the wrappers pick the interpret/XLA variants off-TPU themselves
    h = intersect_pairs_full(pt, bl, o, d)
    hb = intersect_brute(geo, o, d)
    assert (np.asarray(h.prim) == np.asarray(hb.prim)).all()
    tmax = jnp.full((o.shape[0],), 5.0)
    occ = occluded_pairs_full(pt, bl, o, d, tmax)
    occ_b = occluded_brute(geo, o, d, tmax)
    assert (np.asarray(occ) == np.asarray(occ_b)).all()


def test_pairs_compaction_exact(soup):
    """cap_factor compaction must stay exact: rays whose pairs were cut
    are marked unproven (conservative), everything proven must still
    agree with brute force (VERDICT r4 sort-floor/compaction redesign)."""
    geo, pt, o, d = soup
    tmax = jnp.full((o.shape[0],), INF)
    for cap in (2, 4):
        t, prim, u, v, valid, proven = intersect_pairs_raw(
            pt, o, d, tmax, use_pallas=False, cap_factor=cap
        )
        hb = intersect_brute(geo, o, d)
        pv = np.asarray(proven)
        assert (np.asarray(prim)[pv] == np.asarray(hb.prim)[pv]).all(), cap
        occ, pv2 = intersect_pairs_raw(
            pt, o, d, jnp.full((o.shape[0],), 5.0), any_hit=True,
            use_pallas=False, cap_factor=cap
        )
        occ_b = occluded_brute(geo, o, d, jnp.full((o.shape[0],), 5.0))
        pv2 = np.asarray(pv2)
        assert (np.asarray(occ)[pv2] == np.asarray(occ_b)[pv2]).all(), cap
