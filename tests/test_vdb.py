"""Pure-Python OpenVDB codec tests (scene/vdb.py; fork feature #9,
reference src/volume/vdbvolume.cpp)."""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.scene.vdb import VdbGrid, read_vdb, write_vdb
from mitsuba_path_guiding_tpu.scene.volume import load_volume_spec, vdb_to_dense


@pytest.fixture
def smoke():
    rng = np.random.default_rng(11)
    data = rng.random((20, 17, 9)).astype(np.float32)
    data[data < 0.3] = 0.0  # sparsity for mask paths
    return data


@pytest.mark.parametrize("compression", ["none", "zip"])
def test_roundtrip_dense(tmp_path, smoke, compression):
    p = str(tmp_path / "s.vdb")
    g = VdbGrid("density", smoke, origin=(3, -5, 10),
                voxel_size=(0.5, 0.5, 0.5), translation=(1.0, 2.0, 3.0))
    write_vdb(p, [g], compression=compression)
    back = read_vdb(p)
    assert len(back) == 1
    b = back[0]
    assert b.name == "density"
    # dense assembly covers the leaf-aligned bounding box: our region must
    # match; outside it must equal background
    o = np.asarray(b.origin)
    s = np.asarray(g.origin) - o
    sub = b.data[s[0]:s[0]+20, s[1]:s[1]+17, s[2]:s[2]+9]
    np.testing.assert_allclose(sub, smoke, rtol=0, atol=0)
    total = b.data.sum()
    assert abs(total - smoke.sum()) < 1e-3  # nothing but background outside
    assert np.allclose(b.voxel_size, 0.5)
    assert np.allclose(b.translation, (1.0, 2.0, 3.0))


def test_multigrid_and_missing_name(tmp_path, smoke):
    p = str(tmp_path / "m.vdb")
    write_vdb(p, [VdbGrid("density", smoke, (0, 0, 0)),
                  VdbGrid("temperature", smoke * 2.0, (0, 0, 0))])
    names = [g.name for g in read_vdb(p)]
    assert names == ["density", "temperature"]
    with pytest.raises(KeyError, match="flames"):
        vdb_to_dense(p, "flames")


def test_vdb_to_dense_world_bounds(tmp_path, smoke):
    p = str(tmp_path / "w.vdb")
    write_vdb(p, [VdbGrid("density", smoke, origin=(0, 0, 0),
                          voxel_size=(0.1, 0.1, 0.1))])
    dense, aabb = vdb_to_dense(p, "density")
    # (x,y,z) -> (z,y,x) layout for our volume pipeline
    assert dense.ndim == 3
    assert dense.sum() == pytest.approx(smoke.sum(), rel=1e-5)
    assert (aabb[1] > aabb[0]).all()
    # world box spans the leaf-aligned index box times voxel size
    assert np.all(aabb[1] - aabb[0] >= np.array([0.9, 1.7, 2.0]) * 0.1 - 1e-5)


def test_vdbvolume_spec_pipeline(tmp_path, smoke):
    p = str(tmp_path / "p.vdb")
    write_vdb(p, [VdbGrid("density", smoke, (0, 0, 0))])
    grid, aabb = load_volume_spec({"type": "vdbvolume", "filename": p})
    assert grid.ndim == 3 and np.isfinite(grid).all()
    assert grid.sum() == pytest.approx(smoke.sum(), rel=1e-5)


def test_not_a_vdb(tmp_path):
    p = tmp_path / "bad.vdb"
    p.write_bytes(b"not a vdb file at all")
    with pytest.raises(ValueError, match="not an OpenVDB"):
        read_vdb(str(p))
