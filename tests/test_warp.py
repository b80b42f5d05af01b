"""Chi-square sample/pdf agreement for every warp (reference test_chisquare.cpp
and test_samplers.cpp analogue) plus vMF distribution tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import zlib

from mitsuba_path_guiding_tpu.core import chi2, vmf, warp

N = 200_000


def _uniforms(seed, n=N):
    return np.asarray(jax.random.uniform(jax.random.PRNGKey(seed), (n, 2)))


@pytest.mark.parametrize(
    "name,sample_fn,pdf_fn",
    [
        (
            "uniform_sphere",
            warp.square_to_uniform_sphere,
            warp.square_to_uniform_sphere_pdf,
        ),
        (
            "uniform_hemisphere",
            warp.square_to_uniform_hemisphere,
            warp.square_to_uniform_hemisphere_pdf,
        ),
        (
            "cosine_hemisphere",
            warp.square_to_cosine_hemisphere,
            warp.square_to_cosine_hemisphere_pdf,
        ),
        (
            "uniform_cone",
            lambda u: warp.square_to_uniform_cone(u, 0.5),
            lambda d: warp.square_to_uniform_cone_pdf(d, 0.5),
        ),
    ],
)
def test_warp_chi2(name, sample_fn, pdf_fn):
    u = _uniforms(zlib.crc32(name.encode()) % (2**31))
    dirs = np.asarray(sample_fn(jnp.asarray(u)))
    # discontinuous pdfs (cone boundary) need finer per-bin quadrature
    quad_res = 32 if "cone" in name else 8
    passed, p, msg = chi2.chi2_test_sphere(
        dirs, lambda d: np.asarray(pdf_fn(jnp.asarray(d))), quad_res=quad_res
    )
    assert passed, f"{name}: {msg}"


@pytest.mark.parametrize("kappa", [0.0, 0.5, 5.0, 50.0])
def test_vmf_chi2(kappa):
    u = _uniforms(int(kappa * 977) + 3)
    mu = jnp.asarray(np.tile([0.3, -0.5, 0.81240384], (N, 1)), dtype=jnp.float32)
    mu = mu / jnp.linalg.norm(mu, axis=-1, keepdims=True)
    dirs = np.asarray(vmf.vmf_sample(jnp.asarray(u), mu, jnp.full((N,), kappa)))
    mu1 = mu[0]

    def pdf(d):
        d = jnp.asarray(d)
        return np.asarray(vmf.vmf_pdf(d, jnp.broadcast_to(mu1, d.shape), jnp.full(d.shape[:-1], kappa)))

    passed, p, msg = chi2.chi2_test_sphere(dirs, pdf)
    assert passed, f"vmf kappa={kappa}: {msg}"


def test_vmf_pdf_integrates_to_one():
    # quasi-uniform sphere quadrature
    nt, nh = 256, 512
    t = (np.arange(nt) + 0.5) / nt * np.pi
    h = (np.arange(nh) + 0.5) / nh * 2 * np.pi
    TT, HH = np.meshgrid(t, h, indexing="ij")
    d = np.stack([np.sin(TT) * np.cos(HH), np.sin(TT) * np.sin(HH), np.cos(TT)], -1)
    dA = (np.pi / nt) * (2 * np.pi / nh) * np.sin(TT)
    for kappa in [0.0, 1.0, 10.0, 100.0]:
        p = np.asarray(
            vmf.vmf_pdf(
                jnp.asarray(d.reshape(-1, 3), dtype=jnp.float32),
                jnp.asarray(np.tile([0, 0, 1.0], (d.size // 3, 1)), dtype=jnp.float32),
                jnp.full((d.size // 3,), kappa),
            )
        ).reshape(TT.shape)
        integral = (p * dA).sum()
        assert abs(integral - 1.0) < 2e-2, (kappa, integral)


def test_vmf_moment_fit_roundtrip():
    # sample a known vMF, fit from moments, recover mu and kappa
    for kappa in [2.0, 20.0]:
        u = _uniforms(int(kappa) + 11)
        mu_true = np.array([0.6, 0.0, 0.8], dtype=np.float32)
        mu = jnp.broadcast_to(jnp.asarray(mu_true), (N, 3))
        d = vmf.vmf_sample(jnp.asarray(u), mu, jnp.full((N,), kappa))
        w = jnp.ones((N,))
        mu_fit, kappa_fit = vmf.vmf_fit_from_moments(
            jnp.sum(d * w[:, None], axis=0), jnp.sum(w)
        )
        assert np.dot(np.asarray(mu_fit), mu_true) > 0.999
        assert abs(float(kappa_fit) - kappa) / kappa < 0.1


def test_tent_monotone_and_bounded():
    u = np.linspace(0, 1, 1001)[:-1]
    x = np.asarray(warp.interval_to_tent(jnp.asarray(u)))
    assert np.all(np.diff(x) >= -1e-6)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_sobol_elementary_intervals():
    """First 2^k unscrambled Sobol points are (0, k, 2)-stratified: every
    base-2 elementary interval of volume 2^-k holds exactly one point
    (the property the reference's sampler tests check, test_samplers.cpp)."""
    import numpy as np
    from mitsuba_path_guiding_tpu.core.qmc import sobol_direction_numbers, sobol_point

    k = 8
    n = 1 << k
    sv = sobol_direction_numbers(2)
    pts = np.asarray(sobol_point(jnp.arange(n, dtype=jnp.uint32), sv))
    assert pts.shape == (n, 2)
    for (a, b) in [(0, k), (k, 0), (4, 4), (2, 6)]:
        ix = (pts[:, 0] * (1 << a)).astype(int)
        iy = (pts[:, 1] * (1 << b)).astype(int)
        counts = np.zeros((1 << a, 1 << b), int)
        np.add.at(counts, (ix, iy), 1)
        assert (counts == 1).all(), (a, b)


def test_sobol_table_pinned():
    """Regression pin on the vendored Joe-Kuo table (VERDICT r3 item 9):
    the first unscrambled points in dims 0-4 must match the published
    Joe & Kuo sequence exactly — a silent table change breaks every
    Sobol sampler reproducibly."""
    import numpy as np
    from mitsuba_path_guiding_tpu.core.qmc import sobol_direction_numbers, sobol_point

    sv = sobol_direction_numbers(5)
    pts = np.asarray(sobol_point(jnp.arange(8, dtype=jnp.uint32), sv))
    # dim 0 is van der Corput; dims 1+ from the Joe-Kuo polynomials
    expected = np.array([
        [0.0, 0.0, 0.0, 0.0, 0.0],
        [0.5, 0.5, 0.5, 0.5, 0.5],
        [0.25, 0.75, 0.75, 0.75, 0.25],
        [0.75, 0.25, 0.25, 0.25, 0.75],
        [0.125, 0.625, 0.375, 0.125, 0.125],
        [0.625, 0.125, 0.875, 0.625, 0.625],
        [0.375, 0.375, 0.625, 0.875, 0.375],
        [0.875, 0.875, 0.125, 0.375, 0.875],
    ])
    np.testing.assert_allclose(pts, expected, atol=1e-6)


def test_sobol_scramble_preserves_stratification():
    import numpy as np
    from mitsuba_path_guiding_tpu.core.qmc import sobol_2d

    n = 256
    pix_u = jnp.broadcast_to(jnp.asarray([0.37, 0.81], jnp.float32), (n, 2))
    pts = np.asarray(sobol_2d(jnp.arange(n, dtype=jnp.uint32), pix_u))
    # digital shift keeps elementary-interval stratification
    ix = (pts[:, 0] * 16).astype(int)
    iy = (pts[:, 1] * 16).astype(int)
    counts = np.zeros((16, 16), int)
    np.add.at(counts, (ix, iy), 1)
    assert (counts == 1).all()
    # different pixels -> different point sets
    pix_u2 = jnp.broadcast_to(jnp.asarray([0.9, 0.1], jnp.float32), (n, 2))
    pts2 = np.asarray(sobol_2d(jnp.arange(n, dtype=jnp.uint32), pix_u2))
    assert np.abs(pts - pts2).max() > 0.1
