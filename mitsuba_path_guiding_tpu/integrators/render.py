"""Render orchestration: camera rays -> wavefront trace -> film splat.

The counterpart of the reference's render-job plumbing
(/root/reference/src/librender/integrator.cpp:95-192 renderBlock +
renderproc.cpp): the dynamic spiral tile queue becomes static batching of
pixel waves; per-pixel persistent sample indices reproduce the fork's
deterministic progressive sampling (progressiveintegrator.cpp:38-52,
deterministic.cpp:78-81).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import Film, develop, new_film, splat
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.types import SceneData


# Below this triangle count the dense all-triangles intersector beats
# divergent BVH traversal on wide-vector hardware.
BRUTE_FORCE_MAX_TRIS = 16384


def _textured(scene) -> bool:
    """Static texture-override presence: a real atlas, vertex colors, or
    any geometry-driven sentinel texture id (-3 vertexcolors/curvature,
    -4 wireframe)."""
    if int(scene.textures.shape[0] * scene.textures.shape[1]) > 1:
        return True
    if scene.geo.vcol is not None:
        return True
    try:
        return bool((np.asarray(scene.mats.texture_id) < -1).any())
    except Exception:  # tracers (see _has_bump)
        return False


def _has_bump(scene) -> bool:
    """Static bump-map presence.  Under jit/shard_map tracing the material
    table is a tracer — the flag is then decided at trace time from the
    (unavailable) values, so default to False there; concrete callers
    (the normal host-driven renders) see the real flag."""
    try:
        return bool((np.asarray(scene.mats.packed[:, 19]) >= 0).any())
    except Exception:  # TracerArrayConversionError and friends
        return False


def _has_cloth(scene) -> bool:
    """Static CLOTH-row presence (same tracer caveat as _has_bump): when
    true the integrator fetches per-point yarn records and the Irawan
    band-gated integrand runs; when undecidable the cloth falls back to
    its uv-averaged Ward lobe (models/bsdf.py _cloth_eval_pdf)."""
    from mitsuba_path_guiding_tpu.scene.types import BSDFType

    try:
        return bool((np.asarray(scene.mats.type) == BSDFType.CLOTH).any())
    except Exception:  # TracerArrayConversionError and friends
        return False


def _cone_angle(scene, cfg) -> float:
    """Primary-ray footprint half-angle ~ fov_x / width for perspective
    sensors on textured scenes (enables trilinear mip filtering); 0 under
    shard_map tracing where the sensor fields are tracers."""
    try:
        if (
            int(scene.textures.shape[0] * scene.textures.shape[1]) > 1
            and int(scene.sensor.kind) == 0
        ):
            return 2.0 * float(scene.sensor.tan_half_fov_x) / cfg.width
    except Exception:
        pass
    return 0.0


QMC_PIXEL_SAMPLERS = ("sobol", "ldsampler", "halton", "hammersley")

# fused-megakernel table cache: keyed by the id of the scene's p0 buffer;
# the stored strong reference pins the keyed array so the id can't be
# recycled.  None entries memoize "unsupported".
_FUSED_TABLE_CACHE: dict = {}


def _fused_tables_for(scene):
    """Cached ops.fused_path tables for a concrete scene, else None
    (tracers, unsupported material/emitter sets).

    NEVER builds under an active jax trace: even with a concrete
    closure-captured scene, the jnp table constants would be created
    inside the outer trace and leak out of it through the cache
    (UnexpectedTracerError seen from render_scanned, round 5)."""
    try:
        from jax._src.core import trace_state_clean

        if not trace_state_clean():
            return None
    except Exception:
        return None
    k = id(scene.geo.p0)
    if k in _FUSED_TABLE_CACHE:
        return _FUSED_TABLE_CACHE[k][1]
    try:
        from mitsuba_path_guiding_tpu.ops.fused_path import (
            build_fused_tables,
            fused_supported,
        )

        tables = build_fused_tables(scene) if fused_supported(scene) else None
    except Exception:  # tracer scene under jit/shard_map
        return None
    _FUSED_TABLE_CACHE[k] = (scene.geo.p0, tables)
    return tables


def wave_keys_and_jitter(cfg, pixel_id, sample_idx):
    """Shared RNG/jitter derivation for every wave path (single-device,
    sharded, progressive) — keeps N-device renders bitwise equal to
    1-device ones.  Returns (pkeys, rkeys, u_cam, u_pos)."""
    key = rng.base_key(cfg.seed)
    pkeys = rng.pixel_keys(key, pixel_id)
    rkeys = jax.vmap(jax.random.fold_in)(pkeys, sample_idx)
    u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 4)
    u_pix = None
    if cfg.sampler in QMC_PIXEL_SAMPLERS:
        u_pix = rng.event_uniform(pkeys, TAG_CAMERA, 2)
    u_pos = camera_jitter(cfg, sample_idx, u_cam, u_pix)
    return pkeys, rkeys, u_cam, u_pos


def camera_jitter(cfg, sample_idx, u_cam, u_pix=None):
    """Sub-pixel jitter by sampler type (reference sampler plugin family):
    independent (pure random), stratified grid, or Halton(2,3)/Sobol with
    per-pixel Cranley-Patterson rotation — all counter-based.

    ``u_pix``: (N,2) PIXEL-only uniforms (fixed across the pixel's sample
    sequence) for the CP rotation / digital shift.  A per-sample shift
    silently degrades the low-discrepancy families to independent sampling
    (measured: no variance reduction at all)."""
    if u_pix is None:
        u_pix = u_cam[..., 0:2]
    if cfg.sampler in ("sobol", "ldsampler"):
        # ldsampler.cpp's (0,2)-sequence IS the first two Sobol dims
        from mitsuba_path_guiding_tpu.core.qmc import sobol_2d

        return sobol_2d(sample_idx.astype(jnp.uint32), u_pix)
    if cfg.sampler == "halton":
        from mitsuba_path_guiding_tpu.core.qmc import halton_2d

        return halton_2d(sample_idx.astype(jnp.uint32), u_pix)
    if cfg.sampler == "hammersley":
        # hammersley.cpp: (i/N, radicalInverse_2(i)) + per-pixel CP rotation
        from mitsuba_path_guiding_tpu.core.qmc import cp_rotate, radical_inverse

        n = jnp.float32(max(cfg.spp, 1))
        pts = jnp.stack(
            [
                sample_idx.astype(jnp.float32) / n,
                radical_inverse(2, sample_idx.astype(jnp.uint32)),
            ],
            axis=-1,
        )
        return cp_rotate(pts, u_pix)
    if cfg.sampler == "stratified":
        from mitsuba_path_guiding_tpu.core.qmc import stratified_2d

        return stratified_2d(sample_idx, max(cfg.spp, 16), u_cam[..., 0:2])
    return u_cam[..., 0:2]


class RenderConfig(NamedTuple):
    width: int = 256
    height: int = 256
    spp: int = 16
    max_depth: int = 5
    rr_depth: int = 5
    seed: int = 0
    filter_name: str = "box"
    use_nee: bool = True
    use_bvh: bool | None = None  # None = auto by triangle count
    max_component_value: float = 0.0  # firefly clamp; 0 disables
    samples_per_pass: int = 4         # spp per wavefront wave
    pixel_batch: int = 1 << 17        # max pixels per wave (memory bound)
    integrator: str = "path"          # "path" | "volpath" (auto-upgrades
                                      # to volpath when the scene has a medium)
    sampler: str = "independent"      # "independent" | "stratified" | "halton"
                                      # (camera-jitter dims; reference
                                      # src/samplers/ family)
    qmc_bounces: int = 0              # >0: scrambled-Sobol PSS dims for the
                                      # first N bounces (surface path only;
                                      # extends sobol.cpp's global dims past
                                      # the camera pair)
    accel: str = "auto"               # intersection path override for
                                      # integrators.path.trace ("auto" |
                                      # "brute" | "bvh" | "pallas" |
                                      # "twolevel")


def render_wave(
    scene: SceneData,
    cfg: RenderConfig,
    pixel_id: jnp.ndarray,
    sample_idx: jnp.ndarray,
    guide=None,
    guide_state=None,
    em_kinds=None,
):
    """Trace one (pixels x 1 sample) wave; returns (film_xy, radiance, aux).

    ``sample_idx`` is the global per-pixel sample counter — sequences
    continue across progressions (fork's persistent samplers)."""
    use_bvh = cfg.use_bvh
    if use_bvh is None:
        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS
    if em_kinds is None:
        from mitsuba_path_guiding_tpu.models.emitter import kinds_present

        em_kinds = kinds_present(scene.emitters)
    from mitsuba_path_guiding_tpu.models.bsdf import types_present

    mat_types = types_present(scene.mats)
    # unguided megakernel fast path (ops/fused_path.py): VMEM-resident
    # diffuse/area scenes trace the whole bounce loop in one pallas kernel
    # (round-5: ~1.45x the wavefront path on the Cornell headline).  Only
    # on concrete scenes (host-driven renders) — tracers fall through.
    fused_tables = None
    if (
        guide is None
        and cfg.integrator != "volpath"
        and cfg.qmc_bounces == 0
        and cfg.use_nee
        and cfg.sampler == "independent"
        and jax.default_backend() == "tpu"
    ):
        fused_tables = _fused_tables_for(scene)
    if guide is None and cfg.integrator != "volpath" and not scene.medium.enabled:
        # unguided fast path: guided code shape with selection prob 0
        # (compiles ~2x faster on TPU; see guiding/trivial.py)
        from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
        from mitsuba_path_guiding_tpu.guiding.trivial import trivial_grid

        guide = make_guide_fn(0.0, mat_types)
        guide_state = trivial_grid()
    pkeys, rkeys, u_cam, u_pos = wave_keys_and_jitter(cfg, pixel_id, sample_idx)
    o, d, film_xy = generate_rays(
        scene.sensor,
        cfg.width,
        cfg.height,
        pixel_id,
        u_pos,
        u_lens=u_cam[..., 2:4],
        kind=int(scene.sensor.kind),
    )
    use_volpath = cfg.integrator == "volpath" or (
        cfg.integrator == "path" and scene.medium.enabled
    )
    if use_volpath:
        from mitsuba_path_guiding_tpu.integrators.volpath import trace_vol

        L, aux, _ = trace_vol(
            scene,
            o,
            d,
            rkeys,
            max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth,
            use_nee=cfg.use_nee,
            use_bvh=use_bvh,
            guide=guide,
            guide_state=guide_state,
            em_kinds=em_kinds,
            mat_types=mat_types,
            hetero=bool(scene.medium.heterogeneous),
            phase_kind=int(scene.medium.phase_kind),
        )
    elif fused_tables is not None:
        from mitsuba_path_guiding_tpu.ops.fused_path import trace_fused

        L, aux, _ = trace_fused(
            fused_tables, o, d, rkeys,
            max_depth=cfg.max_depth, rr_depth=cfg.rr_depth, guided=False,
        )
    else:
        uniforms = None
        if cfg.qmc_bounces > 0:
            from mitsuba_path_guiding_tpu.core.qmc import sobol_path_uniforms

            uniforms = sobol_path_uniforms(
                rkeys, pkeys, sample_idx, cfg.max_depth, cfg.qmc_bounces
            )
        L, aux, _ = trace(
            scene,
            o,
            d,
            rkeys,
            uniforms=uniforms,
            max_depth=cfg.max_depth,
            rr_depth=cfg.rr_depth,
            use_nee=cfg.use_nee,
            use_bvh=use_bvh,
            guide=guide,
            guide_state=guide_state,
            em_kinds=em_kinds,
            mat_types=mat_types,
            textured=_textured(scene),
            cone_angle=_cone_angle(scene, cfg),
            bumped=_has_bump(scene),
            clothed=_has_cloth(scene),
        )
    if cfg.max_component_value > 0.0:
        # fork firefly clamp (progressiveintegrator.cpp:274-276)
        L = jnp.minimum(L, cfg.max_component_value)
    return film_xy, L, aux


def render_scanned(scene: SceneData, cfg: RenderConfig, guide=None,
                   guide_state=None):
    """render() with the spp loop as ONE on-device ``lax.scan``.

    Identical wave sequence and splat order to render() (same image to
    float addition order), but a single dispatch instead of ``spp`` —
    the per-call host/tunnel overhead dominates host-looped high-spp
    renders (measured ~100 s/scene for the denoiser dataset's 384-spp
    references vs seconds on-device).  Requires the whole frame in one
    pixel batch."""
    n_pix = cfg.width * cfg.height
    if n_pix > cfg.pixel_batch:
        return render(scene, cfg, guide, guide_state)
    film = new_film(cfg.width, cfg.height)
    pix = jnp.arange(n_pix, dtype=jnp.int32)

    @jax.jit
    def waves(rgbw):
        def body(carry, s):
            sidx = jnp.full((n_pix,), s, jnp.int32)
            film_xy, L, _ = render_wave(scene, cfg, pix, sidx, guide,
                                        guide_state)
            return (
                splat(carry, film_xy, L, cfg.width, cfg.height,
                      cfg.filter_name),
                None,
            )

        rgbw, _ = jax.lax.scan(
            body, rgbw, jnp.arange(cfg.spp, dtype=jnp.int32)
        )
        return rgbw

    rgbw = waves(film.rgb_weight)
    img = develop(Film(rgb_weight=rgbw, width=cfg.width, height=cfg.height))
    if scene.sensor.meas_scale is not None:
        img = img * scene.sensor.meas_scale
    return img


def render(scene: SceneData, cfg: RenderConfig, guide=None, guide_state=None):
    """Full render: returns (H, W, 3) image (device array)."""
    film = new_film(cfg.width, cfg.height)
    rgbw = film.rgb_weight
    n_pix = cfg.width * cfg.height
    all_pixels = jnp.arange(n_pix, dtype=jnp.int32)

    for batch_start in range(0, n_pix, cfg.pixel_batch):
        pix = all_pixels[batch_start : batch_start + cfg.pixel_batch]
        for s in range(cfg.spp):
            sidx = jnp.full_like(pix, s)
            film_xy, L, _ = render_wave(scene, cfg, pix, sidx, guide, guide_state)
            rgbw = splat(
                rgbw, film_xy, L, cfg.width, cfg.height, cfg.filter_name
            )
    film = Film(rgb_weight=rgbw, width=cfg.width, height=cfg.height)
    img = develop(film)
    if scene.sensor.meas_scale is not None:
        # measurement sensors (irradiance/fluence meters) fold their
        # importance-sampling constant into the developed image
        img = img * scene.sensor.meas_scale
    return img
