"""Spherical harmonics (reference shvector.h/.cpp): orthonormality,
projection round-trip, rotation correctness, chi-square sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.core import chi2
from mitsuba_path_guiding_tpu.core.sh import (
    eval_basis,
    eval_sh,
    project,
    rotation_matrix,
    sample_sh,
)


def _grid(res=96):
    th = (np.arange(res) + 0.5) / res * np.pi
    ph = (np.arange(2 * res) + 0.5) / (2 * res) * 2 * np.pi
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(TH) * np.cos(PH), np.sin(TH) * np.sin(PH), np.cos(TH)], -1)
    dA = (np.pi / res) * (np.pi / res) * np.sin(TH)
    return d.reshape(-1, 3), dA.reshape(-1)


def test_orthonormal_basis():
    d, dA = _grid()
    B = np.asarray(eval_basis(jnp.asarray(d, jnp.float32), 4))
    G = (B * dA[:, None]).T @ B
    np.testing.assert_allclose(G, np.eye(16), atol=2e-3)


def test_projection_roundtrip():
    # band-limited target: f = 0.5 + x*z + 0.3*y  (bands <= 3)
    fn = lambda d: 0.5 + d[..., 0] * d[..., 2] + 0.3 * d[..., 1]
    c = project(fn, bands=3)
    d, _ = _grid(48)
    got = np.asarray(eval_sh(c, jnp.asarray(d, jnp.float32)))
    want = np.asarray(fn(jnp.asarray(d, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_rotation():
    from mitsuba_path_guiding_tpu.scene.transforms import rotate

    fn = lambda d: jnp.maximum(d[..., 2], 0.0) + 0.2
    c = project(fn, bands=4)
    R = np.asarray(rotate([1.0, 0.0, 0.0], 90.0))[:3, :3]
    M = rotation_matrix(R, bands=4)
    c_rot = M @ c
    d, _ = _grid(32)
    got = np.asarray(eval_sh(c_rot, jnp.asarray(d, jnp.float32)))
    want = np.asarray(eval_sh(c, jnp.asarray((d @ R), jnp.float32)))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_sh_sampling_chi2():
    fn = lambda d: (d[..., 2] + 1.2) * 0.5  # positive, band-1
    c = project(fn, bands=2)
    u = jax.random.uniform(jax.random.PRNGKey(3), (120_000, 2))
    dirs, pdf = sample_sh(c, u, res=48)

    def pdf_fn(dd):
        return np.asarray(sample_pdf(jnp.asarray(dd)))

    # pdf of the table sampler is piecewise constant; evaluate it by
    # re-deriving the cell pmf the same way sample_sh does
    import mitsuba_path_guiding_tpu.core.sh as shm

    res = 48
    ct_edges = np.linspace(1.0, -1.0, res + 1)
    ct = 0.5 * (ct_edges[:-1] + ct_edges[1:])
    ph = (np.arange(2 * res) + 0.5) / (2 * res) * 2 * np.pi
    CT, PH = np.meshgrid(ct, ph, indexing="ij")
    ST = np.sqrt(np.maximum(1 - CT * CT, 0.0))
    dg = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], -1).reshape(-1, 3)
    vals = np.maximum(np.asarray(eval_sh(c, jnp.asarray(dg, jnp.float32))), 1e-9)
    pmf = vals / vals.sum()
    cell_sa = (2.0 / res) * (2 * np.pi / (2 * res))

    def pdf_fn(dd):
        iy = np.clip(((1.0 - dd[:, 2]) / (2.0 / res)).astype(int), 0, res - 1)
        phq = np.arctan2(dd[:, 1], dd[:, 0]) % (2 * np.pi)
        ix = np.clip((phq / (2 * np.pi / (2 * res))).astype(int), 0, 2 * res - 1)
        return pmf.reshape(res, 2 * res)[iy, ix] / cell_sa

    passed, p, msg = chi2.chi2_test_sphere(np.asarray(dirs), pdf_fn)
    assert passed, msg
