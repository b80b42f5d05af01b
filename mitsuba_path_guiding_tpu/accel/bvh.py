"""Host-side binned-SAH BVH builder -> flat arrays for device traversal.

TPU-native replacement for the reference's SAH kd-tree compiler
(/root/reference/include/mitsuba/render/gkdtree.h, sahkdtree3.h:99-107):
a BVH maps better to breadth-first array traversal than a kd-tree (no
tmin/tmax clipping state, bounded node count), per SURVEY.md §7 step 3.

Built once per scene in NumPy (scene compile is host-side, like the
reference's Scene::initialize kd-tree build, scene.cpp:365), then shipped to
device as the ``BVH`` pytree.  Binned SAH with 16 bins, leaf size <= 4.
"""
from __future__ import annotations

import numpy as np

from mitsuba_path_guiding_tpu.scene.types import BVH

N_BINS = 16
MAX_LEAF = 4
TRAVERSAL_COST = 1.0
INTERSECT_COST = 1.0

# Host copies of the tree arrays, keyed by the device child0 buffer.
# Downstream table builders (accel/blocks.py, accel/pairs.py) walk the
# tree host-side; reading the arrays back from the device is pathological
# through the axon tunnel (measured 203 s for a 600 KB first readback).
import weakref

_HOST_KEEP: dict = {}


class _HostTriple:
    __slots__ = ("child0", "child1", "prim_idx", "__weakref__")

    def __init__(self, child0, child1, prim_idx):
        self.child0 = child0
        self.child1 = child1
        self.prim_idx = prim_idx


def _register_host(bvh, child0, child1, prim_idx):
    trip = _HostTriple(
        np.asarray(child0), np.asarray(child1), np.asarray(prim_idx)
    )
    # key by the id of the device buffer; keep the triple alive as long
    # as the device array lives (finalizer evicts the entry)
    key = id(bvh.child0)
    _HOST_KEEP[key] = trip
    weakref.finalize(bvh.child0, _HOST_KEEP.pop, key, None)
    return bvh


def bvh_host_arrays(bvh):
    """(child0, child1, prim_idx) as host numpy arrays, without a device
    readback when the build-time copies are still cached."""
    trip = _HOST_KEEP.get(id(bvh.child0))
    if trip is not None:
        return trip.child0, trip.child1, trip.prim_idx
    return (
        np.asarray(bvh.child0),
        np.asarray(bvh.child1),
        np.asarray(bvh.prim_idx),
    )


def build_bvh(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray, use_native: bool = True) -> BVH:
    """Build from triangle (p0, e1, e2) arrays; returns flat BVH arrays.

    Prefers the C++ builder (cpp/bvh_builder.cpp via accel/native.py,
    ~100x faster); this Python path is the reference implementation and
    fallback."""
    import jax.numpy as jnp

    T = p0.shape[0]
    if use_native:
        v0, v1, v2 = p0, p0 + e1, p0 + e2
        extent = float(
            (np.maximum(np.maximum(v0, v1), v2).max(axis=0)
             - np.minimum(np.minimum(v0, v1), v2).min(axis=0)).max()
        )
        pad = 1e-6 * max(extent, 1.0)
        from mitsuba_path_guiding_tpu.accel.native import build_bvh_native

        out = build_bvh_native(p0, e1, e2, pad)
        if out is not None:
            node_min, node_max, child0, child1, prim_idx, max_depth = out
            return _register_host(BVH(
                node_min=jnp.asarray(node_min),
                node_max=jnp.asarray(node_max),
                child0=jnp.asarray(child0),
                child1=jnp.asarray(child1),
                prim_idx=jnp.asarray(prim_idx),
                max_depth=max_depth + 2,
            ), child0, child1, prim_idx)
    v0, v1, v2 = p0, p0 + e1, p0 + e2
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroids = (tri_min + tri_max) * 0.5
    # conservative box padding: triangle tests tolerate ~1 ulp of slop, so
    # boxes must too (an exact box can exclude a ray the triangle test hits)
    extent = float((tri_max.max(axis=0) - tri_min.min(axis=0)).max())
    box_pad = 1e-6 * max(extent, 1.0)
    tri_min = tri_min - box_pad
    tri_max = tri_max + box_pad

    node_min, node_max, child0, child1 = [], [], [], []
    prim_order: list[int] = []
    max_depth_seen = [0]

    def new_node():
        node_min.append(None)
        node_max.append(None)
        child0.append(0)
        child1.append(0)
        return len(child0) - 1

    def build(idx: np.ndarray, depth: int) -> int:
        node = new_node()
        bmin = tri_min[idx].min(axis=0)
        bmax = tri_max[idx].max(axis=0)
        node_min[node] = bmin
        node_max[node] = bmax
        max_depth_seen[0] = max(max_depth_seen[0], depth)

        n = len(idx)
        if n <= MAX_LEAF:
            child0[node] = -(len(prim_order) + 1)
            child1[node] = -n
            prim_order.extend(idx.tolist())
            return node

        # binned SAH over the widest centroid axis
        cmin = centroids[idx].min(axis=0)
        cmax = centroids[idx].max(axis=0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        if ext[axis] < 1e-12:
            # degenerate spread: median split
            order = np.argsort(centroids[idx, axis], kind="stable")
            half = n // 2
            l_idx, r_idx = idx[order[:half]], idx[order[half:]]
        else:
            scale = N_BINS * (1.0 - 1e-6) / ext[axis]
            bins = ((centroids[idx, axis] - cmin[axis]) * scale).astype(np.int32)
            bins = np.clip(bins, 0, N_BINS - 1)
            # per-bin counts and bounds
            counts = np.zeros(N_BINS, dtype=np.int64)
            bmin_b = np.full((N_BINS, 3), np.inf)
            bmax_b = np.full((N_BINS, 3), -np.inf)
            for b in range(N_BINS):
                m = bins == b
                counts[b] = m.sum()
                if counts[b]:
                    bmin_b[b] = tri_min[idx[m]].min(axis=0)
                    bmax_b[b] = tri_max[idx[m]].max(axis=0)

            def area(lo, hi):
                d = np.maximum(hi - lo, 0.0)
                return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 0] * d[..., 2])

            lmin = np.minimum.accumulate(bmin_b, axis=0)
            lmax = np.maximum.accumulate(bmax_b, axis=0)
            rmin = np.minimum.accumulate(bmin_b[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bmax_b[::-1], axis=0)[::-1]
            lcount = np.cumsum(counts)
            rcount = np.cumsum(counts[::-1])[::-1]
            # split after bin s: left bins [0..s], right [s+1..]
            cost = np.full(N_BINS - 1, np.inf)
            for s in range(N_BINS - 1):
                if lcount[s] == 0 or rcount[s + 1] == 0:
                    continue
                cost[s] = area(lmin[s], lmax[s]) * lcount[s] + area(
                    rmin[s + 1], rmax[s + 1]
                ) * rcount[s + 1]
            leaf_cost = INTERSECT_COST * n * area(bmin, bmax)
            s = int(np.argmin(cost))
            if not np.isfinite(cost[s]):
                order = np.argsort(centroids[idx, axis], kind="stable")
                half = n // 2
                l_idx, r_idx = idx[order[:half]], idx[order[half:]]
            else:
                m = bins <= s
                l_idx, r_idx = idx[m], idx[~m]

        child0[node] = build(l_idx, depth + 1)
        child1[node] = build(r_idx, depth + 1)
        return node

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100 + 4 * T))
    try:
        build(np.arange(T, dtype=np.int64), 0)
    finally:
        sys.setrecursionlimit(old_limit)

    child0_np = np.asarray(child0, dtype=np.int32)
    child1_np = np.asarray(child1, dtype=np.int32)
    prim_np = np.asarray(prim_order, dtype=np.int32)
    return _register_host(BVH(
        node_min=jnp.asarray(np.stack(node_min).astype(np.float32)),
        node_max=jnp.asarray(np.stack(node_max).astype(np.float32)),
        child0=jnp.asarray(child0_np),
        child1=jnp.asarray(child1_np),
        prim_idx=jnp.asarray(prim_np),
        max_depth=max_depth_seen[0] + 2,
    ), child0_np, child1_np, prim_np)
