"""Volume data sources: VOL/npy grid loading and VDB conversion (host-side).

Counterpart of the reference's VolumeDataSource plugin family
(/root/reference/src/volume/: constvolume.cpp, gridvolume.cpp — the mmap'd
binary VOL format, hgridvolume.cpp hierarchical grids, and the fork's
vdbvolume.cpp OpenVDB source).  All loading is host-side numpy; the result
is a dense (D, H, W) float32 density grid plus an optional world AABB that
the scene compiler turns into MediumData.world_to_grid.
"""
from __future__ import annotations

import struct

import numpy as np


def load_vol(path: str):
    """Read Mitsuba's binary VOL grid format (gridvolume.cpp:
    'VOL' magic, uint8 version=3, int32 encoding (1 = float32),
    int32 xres/yres/zres, int32 channels, 6x float32 world AABB,
    then xres*yres*zres*channels float32 with x varying fastest).

    Returns (data (D=zres, H=yres, W=xres) float32 — channel-averaged if
    multi-channel, aabb (2, 3) float32 world bounds).
    """
    with open(path, "rb") as f:
        magic = f.read(3)
        if magic != b"VOL":
            raise ValueError(f"{path}: not a VOL file (magic {magic!r})")
        (version,) = struct.unpack("B", f.read(1))
        if version != 3:
            raise ValueError(f"{path}: unsupported VOL version {version}")
        enc, xres, yres, zres, channels = struct.unpack("<5i", f.read(20))
        if enc != 1:
            raise ValueError(f"{path}: only float32 VOL encoding supported (got {enc})")
        aabb = np.array(struct.unpack("<6f", f.read(24)), dtype=np.float32)
        n = xres * yres * zres * channels
        data = np.frombuffer(f.read(4 * n), dtype="<f4", count=n)
    data = data.reshape(zres, yres, xres, channels)
    if channels > 1:
        data = data.mean(axis=-1)
    else:
        data = data[..., 0]
    return np.ascontiguousarray(data, dtype=np.float32), aabb.reshape(2, 3)


def save_vol(path: str, data: np.ndarray, aabb_min, aabb_max):
    """Write a single-channel float32 VOL grid (for tests / converters)."""
    data = np.asarray(data, dtype=np.float32)
    zres, yres, xres = data.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(struct.pack("B", 3))
        f.write(struct.pack("<5i", 1, xres, yres, zres, 1))
        f.write(struct.pack("<6f", *np.asarray(aabb_min, dtype=np.float32),
                            *np.asarray(aabb_max, dtype=np.float32)))
        f.write(data.astype("<f4").tobytes())


def vdb_to_dense(path: str, grid_name: str = "density"):
    """Convert an OpenVDB grid to a dense array (fork vdbvolume.cpp parity).

    Prefers the real OpenVDB bindings when importable (`openvdb` or
    `pyopenvdb`); otherwise falls back to the in-repo pure-Python .vdb
    codec (scene/vdb.py — standard float 5-4-3 trees, none/zip
    compression; Blosc files need the bindings)."""
    try:
        try:
            import openvdb  # type: ignore
        except ImportError:
            import pyopenvdb as openvdb  # type: ignore
    except ImportError:
        return _vdb_to_dense_native(path, grid_name)
    grid = openvdb.read(path, grid_name)
    bbox = grid.evalActiveVoxelBoundingBox()
    lo, hi = np.array(bbox[0]), np.array(bbox[1])
    shape = tuple(int(x) for x in (hi - lo + 1))
    dense = np.zeros(shape, dtype=np.float32)
    grid.copyToArray(dense, ijk=tuple(int(x) for x in lo))
    # index -> world bounds via the grid transform
    wlo = np.array(grid.transform.indexToWorld(tuple(lo)), dtype=np.float32)
    whi = np.array(grid.transform.indexToWorld(tuple(hi + 1)), dtype=np.float32)
    # openvdb arrays are (x, y, z); ours are (z, y, x)
    return np.ascontiguousarray(dense.transpose(2, 1, 0)), np.stack([wlo, whi])


def _vdb_to_dense_native(path: str, grid_name: str):
    """Pure-Python fallback via scene/vdb.py."""
    from mitsuba_path_guiding_tpu.scene.vdb import read_vdb

    grids = {g.name: g for g in read_vdb(path)}
    if grid_name not in grids:
        raise KeyError(
            f"{path}: no grid named '{grid_name}' (has: {sorted(grids)})"
        )
    g = grids[grid_name]
    lo = np.asarray(g.origin, np.float64)
    hi = lo + np.asarray(g.data.shape, np.float64)
    voxel = np.asarray(g.voxel_size, np.float64)
    trans = np.asarray(g.translation, np.float64)
    wlo = (lo * voxel + trans).astype(np.float32)
    whi = (hi * voxel + trans).astype(np.float32)
    # vdb index arrays are (x, y, z); ours are (z, y, x)
    return (np.ascontiguousarray(g.data.transpose(2, 1, 0)),
            np.stack([wlo, whi]))


# HBM-residency bound (the framework's volcache stance): grids live in
# device HBM for the whole render — there is no out-of-core streaming
# path (the reference's volcache.cpp LRU block cache exists to fit CPU
# RAM, a constraint XLA's device model replaces with this one).  A v5e
# core has 16 GB HBM; leaving headroom for the wavefront + film +
# guiding cache, grids above ~8 GB (f32 voxels, ~1290^3) will OOM at
# compile.  The loader warns at half that so the failure is attributable.
_HBM_GRID_WARN_BYTES = 4 << 30


def load_volume_spec(spec) -> tuple[np.ndarray, np.ndarray | None]:
    """Resolve a scene-dict volume spec to (grid (D,H,W), aabb (2,3)|None).

    Accepted forms (mirroring the reference plugin names):
      {"type": "constvolume", "value": v}                  -> (1,1,1) grid
      {"type": "gridvolume", "filename": x.vol|x.npy}      -> file grid
      {"type": "gridvolume", "data": ndarray, "bounds": ((lo),(hi))}
      {"type": "vdbvolume", "filename": x.vdb, "grid": name}
      bare ndarray / nested list                            -> data grid

    Grids are HBM-resident (see _HBM_GRID_WARN_BYTES); volumes larger
    than device memory have no out-of-core path by design.
    """
    if not isinstance(spec, dict):
        data = np.asarray(spec, dtype=np.float32)
        if data.ndim != 3:
            raise ValueError("volume data must be a 3-D (D,H,W) array")
        _check_grid_budget(data)
        return data, None
    t = spec.get("type", "gridvolume")
    if t == "constvolume":
        v = float(spec.get("value", 1.0))
        return np.full((1, 1, 1), v, dtype=np.float32), None
    if t == "vdbvolume":
        data, aabb = vdb_to_dense(spec["filename"], spec.get("grid", "density"))
        _check_grid_budget(data)
        return data, aabb
    if t == "gridvolume":
        if "filename" in spec:
            fn = spec["filename"]
            if fn.endswith(".npy"):
                data = np.load(fn).astype(np.float32)
                if data.ndim != 3:
                    raise ValueError(f"{fn}: expected 3-D grid")
                aabb = None
            else:
                data, aabb = load_vol(fn)
        else:
            data = np.asarray(spec["data"], dtype=np.float32)
            aabb = None
        if "bounds" in spec:
            aabb = np.asarray(spec["bounds"], dtype=np.float32).reshape(2, 3)
        _check_grid_budget(data)
        return data, aabb
    if t == "hgridvolume":
        data, aabb = assemble_hgrid(spec)
        _check_grid_budget(data)
        return data, aabb
    raise ValueError(f"unknown volume type {t}")


def _check_grid_budget(data: np.ndarray) -> None:
    if data.nbytes > _HBM_GRID_WARN_BYTES:
        import warnings

        warnings.warn(
            f"volume grid is {data.nbytes / 2**30:.1f} GiB; grids are "
            "HBM-resident for the whole render (no out-of-core path) — "
            "expect device OOM beyond ~8 GiB on a 16 GB chip",
            ResourceWarning,
            stacklevel=3,
        )


def assemble_hgrid(spec) -> tuple[np.ndarray, np.ndarray | None]:
    """Hierarchical grid volume (reference src/volume/hgridvolume.cpp:
    a coarse grid of dense sub-blocks for sparse media).  TPU-native
    re-design: the hierarchy is a HOST-side container only — blocks are
    stitched into one dense HBM-resident grid at compile time (empty
    cells stay zero); the reference's volcache LRU block cache exists to
    fit CPU RAM and has no device analogue.

    Spec: {"type": "hgridvolume", "block_res": B,
           "blocks": [{"offset": (bz, by, bx),
                       "data": (B,B,B) array | "filename": .vol/.npy}],
           "bounds": ((lo),(hi)) optional}
    """
    B = int(spec["block_res"])
    blocks = spec["blocks"]
    if not blocks:
        raise ValueError("hgridvolume: no blocks")
    offs = np.asarray([b["offset"] for b in blocks], dtype=np.int64)
    dims = (offs.max(axis=0) + 1) * B
    grid = np.zeros(tuple(dims), dtype=np.float32)
    for b in blocks:
        if "data" in b:
            d = np.asarray(b["data"], dtype=np.float32)
        else:
            fn = b["filename"]
            d = (np.load(fn).astype(np.float32) if fn.endswith(".npy")
                 else load_vol(fn)[0])
        if d.shape != (B, B, B):
            raise ValueError(f"hgrid block must be ({B},{B},{B}), got {d.shape}")
        z, y, x = (int(v) * B for v in b["offset"])
        grid[z : z + B, y : y + B, x : x + B] = d
    aabb = (
        np.asarray(spec["bounds"], dtype=np.float32).reshape(2, 3)
        if "bounds" in spec else None
    )
    return grid, aabb
