"""Frame/fresnel/reflection math tests (reference test_la.cpp / test_dgeom.cpp
analogue)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.core import math as mm


def rand_dirs(seed, n=1000):
    u = jax.random.normal(jax.random.PRNGKey(seed), (n, 3))
    return mm.normalize(u)


def test_frame_orthonormal():
    n = rand_dirs(0)
    f = mm.Frame.from_normal(n)
    for a, b in [(f.s, f.t), (f.s, f.n), (f.t, f.n)]:
        assert np.abs(np.asarray(mm.dot(a, b))).max() < 1e-5
    for a in (f.s, f.t, f.n):
        assert np.abs(np.asarray(mm.length(a)) - 1).max() < 1e-5
    # right-handed: s x t = n
    assert np.abs(np.asarray(mm.cross(f.s, f.t) - f.n)).max() < 1e-5


def test_frame_roundtrip():
    n = rand_dirs(1)
    v = rand_dirs(2)
    f = mm.Frame.from_normal(n)
    v2 = f.to_world(f.to_local(v))
    assert np.abs(np.asarray(v2 - v)).max() < 1e-5


def test_reflect():
    n = jnp.array([[0.0, 0.0, 1.0]])
    w = mm.normalize(jnp.array([[1.0, 0.0, 1.0]]))
    r = mm.reflect(w, n)
    expect = mm.normalize(jnp.array([[-1.0, 0.0, 1.0]]))
    assert np.abs(np.asarray(r - expect)).max() < 1e-6


def test_fresnel_dielectric_limits():
    # normal incidence: ((eta-1)/(eta+1))^2
    eta = 1.5
    f0 = float(mm.fresnel_dielectric(jnp.array(1.0), jnp.array(eta)))
    assert abs(f0 - ((eta - 1) / (eta + 1)) ** 2) < 1e-6
    # grazing: -> 1
    fg = float(mm.fresnel_dielectric(jnp.array(0.001), jnp.array(eta)))
    assert fg > 0.98
    # total internal reflection from inside beyond critical angle
    cos_crit = np.sqrt(1 - 1 / eta**2)
    f_tir = float(mm.fresnel_dielectric(jnp.array(-0.5 * cos_crit), jnp.array(eta)))
    assert f_tir == 1.0


def test_refract_snell():
    eta = 1.5
    wi = mm.normalize(jnp.array([[0.5, 0.0, 0.8660254]]))
    wt, tir = mm.refract_local(wi, jnp.array([eta]))
    assert not bool(tir[0])
    sin_i = float(mm.sin_theta(wi)[0])
    sin_t = float(mm.sin_theta(wt)[0])
    assert abs(sin_i - eta * sin_t) < 1e-5
    assert float(wt[0, 2]) < 0  # transmitted into lower hemisphere


def test_power_heuristic():
    w = mm.power_heuristic(jnp.array([1.0, 0.0, 2.0]), jnp.array([1.0, 5.0, 0.0]))
    out = np.asarray(w)
    assert abs(out[0] - 0.5) < 1e-6
    assert out[1] == 0.0
    assert abs(out[2] - 1.0) < 1e-6


def test_gather_pallas_exact():
    """The one-hot MXU row gather must return table values EXACTLY: at
    default dot precision the TPU MXU runs a single bf16 pass, and the
    resulting ~2^-8 relative quantization of gathered EMITTER GEOMETRY
    made area-light NEE shadow rays self-occlude against their own
    source plane (round-4 find: a 40x energy loss on indirect-dominated
    scenes; ops/gather_pallas.py pins precision=HIGHEST)."""
    import numpy as np

    from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

    tbl = jnp.asarray(
        np.random.default_rng(0).uniform(-3, 3, (12, 32)).astype(np.float32))
    idx = jnp.arange(12, dtype=jnp.int32)
    out = np.asarray(gather_rows_t(tbl, idx))
    np.testing.assert_array_equal(out.T, np.asarray(tbl))
