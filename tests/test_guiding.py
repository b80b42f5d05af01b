"""Guiding cache tests: mixture sample/pdf chi-square agreement, EM fit
recovery of known distributions, and guided-vs-unguided estimator
consistency (guided == unguided in expectation, SURVEY.md §4 (c))."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.core import chi2
from mitsuba_path_guiding_tpu.core.math import normalize
from mitsuba_path_guiding_tpu.core.vmf import vmf_sample
from mitsuba_path_guiding_tpu.guiding.fit import fit_from_records, MIN_SAMPLES_VALID
from mitsuba_path_guiding_tpu.guiding.grid import (
    cell_index,
    guide_pdf,
    guide_sample,
    make_grid,
)
from mitsuba_path_guiding_tpu.integrators.path import PathRecord

N = 120_000


def _populated_grid():
    g = make_grid(jnp.zeros(3), jnp.ones(3), res=2, n_lobes=4, seed=1)
    mu = normalize(
        jnp.asarray(
            np.tile(
                [[0.0, 0.0, 1.0], [1.0, 0.2, 0.0], [-0.5, 0.8, -0.3], [0.1, -1.0, 0.4]],
                (8, 1, 1),
            ),
            jnp.float32,
        )
    )
    return g._replace(
        mu=mu,
        kappa=jnp.tile(jnp.asarray([5.0, 40.0, 1.0, 12.0]), (8, 1)),
        log_weight=jnp.log(jnp.tile(jnp.asarray([0.4, 0.3, 0.2, 0.1]), (8, 1))),
        valid=jnp.ones((8,), dtype=bool),
    )


def test_mixture_chi2():
    g = _populated_grid()
    cid = jnp.zeros((N,), jnp.int32)
    k = jax.random.PRNGKey(3)
    u = jax.random.uniform(k, (N, 3))
    d = np.asarray(guide_sample(g, cid, u[:, 2], u[:, 0:2]))

    def pdf_fn(dirs):
        m = dirs.shape[0]
        return np.asarray(guide_pdf(g, jnp.zeros((m,), jnp.int32), jnp.asarray(dirs)))

    passed, p, msg = chi2.chi2_test_sphere(d, pdf_fn)
    assert passed, msg


def test_invalid_cell_uniform_fallback():
    g = make_grid(jnp.zeros(3), jnp.ones(3), res=2, n_lobes=4)
    cid = jnp.zeros((1000,), jnp.int32)
    d = jnp.asarray(np.random.RandomState(0).randn(1000, 3), jnp.float32)
    d = normalize(d)
    p = np.asarray(guide_pdf(g, cid, d))
    np.testing.assert_allclose(p, 1.0 / (4 * np.pi), rtol=1e-5)


def test_cell_index_bounds():
    g = make_grid(jnp.zeros(3), jnp.ones(3), res=4, n_lobes=2)
    pts = jnp.asarray([[-5, -5, -5], [0.5, 0.5, 0.5], [5, 5, 5]], jnp.float32)
    cid = np.asarray(cell_index(g, pts))
    assert cid[0] == 0 and cid[2] == 63 and 0 <= cid[1] < 64


def test_em_fit_recovers_vmf():
    """Feed records drawn from a known vMF; fitted mixture must concentrate
    around the true direction (dominant lobe within 5 degrees, kappa high)."""
    g = make_grid(jnp.zeros(3), jnp.ones(3), res=1, n_lobes=4, seed=2)
    mu_true = normalize(jnp.asarray([0.3, 0.5, 0.81], jnp.float32))
    n = 20000
    k = jax.random.PRNGKey(7)
    u = jax.random.uniform(k, (n, 2))
    dirs = vmf_sample(u, jnp.broadcast_to(mu_true, (n, 3)), jnp.full((n,), 25.0))
    rec = PathRecord(
        pos=jnp.full((1, 3, n), 0.5),
        dir=jnp.transpose(dirs[None], (0, 2, 1)),
        li=jnp.ones((1, n)),
        pdf=jnp.ones((1, n)),
        valid=jnp.ones((1, n), dtype=bool),
    )
    for _ in range(4):
        g = fit_from_records(g, rec)
    assert bool(g.valid[0])
    w = np.asarray(jax.nn.softmax(g.log_weight[0]))
    lead = int(w.argmax())
    mu_fit = np.asarray(g.mu[0, lead])
    cos_err = float(np.dot(mu_fit, np.asarray(mu_true)))
    assert cos_err > 0.996, (cos_err, w)
    assert float(g.kappa[0, lead]) > 10.0


def test_fit_statistics_linear_in_batches():
    """Splitting one batch into two must give the same statistics (the
    property that makes multi-device psum training exact)."""
    from mitsuba_path_guiding_tpu.guiding.fit import accumulate_stats

    g = _populated_grid()
    rs = np.random.RandomState(1)
    n = 4096
    pos = jnp.asarray(rs.rand(1, 3, n), jnp.float32)
    dirs = jnp.transpose(
        normalize(jnp.asarray(rs.randn(1, n, 3), jnp.float32)), (0, 2, 1)
    )
    li = jnp.asarray(rs.rand(1, n), jnp.float32)
    pdf = jnp.full((1, n), 0.25)
    valid = jnp.ones((1, n), dtype=bool)
    rec = PathRecord(pos, dirs, li, pdf, valid)
    sw, sd, sc = accumulate_stats(g, rec)
    half = n // 2
    rec_a = PathRecord(pos[:, :, :half], dirs[:, :, :half], li[:, :half], pdf[:, :half], valid[:, :half])
    rec_b = PathRecord(pos[:, :, half:], dirs[:, :, half:], li[:, half:], pdf[:, half:], valid[:, half:])
    swa, sda, sca = accumulate_stats(g, rec_a)
    swb, sdb, scb = accumulate_stats(g, rec_b)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(swa + swb), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sda + sdb), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sca + scb))


def test_guided_matches_unguided_cornell():
    from mitsuba_path_guiding_tpu.integrators.progressive import (
        ProgressiveConfig,
        ProgressiveRenderer,
    )
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

    sc = build_scene(cornell_box())
    r = RenderConfig(width=24, height=24, spp=0, max_depth=4, seed=0)
    pr = ProgressiveRenderer(
        sc,
        ProgressiveConfig(
            render=r,
            samples_per_progression=8,
            n_progressions=8,
            guiding=True,
            grid_res=8,
            n_lobes=4,
        ),
    )
    img_g = np.asarray(pr.render())
    img_u = np.asarray(
        render(sc, RenderConfig(width=24, height=24, spp=64, max_depth=4, seed=9))
    )
    assert np.isfinite(img_g).all()
    # unbiasedness: agree in mean within MC noise
    assert abs(img_g.mean() - img_u.mean()) / img_u.mean() < 0.05
    # and the cache actually learned something
    assert int(np.asarray(pr.grid.valid).sum()) > 0
