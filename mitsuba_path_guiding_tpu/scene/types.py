"""Flat-array scene representation (the compiled scene).

The reference's object graph (Scene owning dlopen'd Shape/BSDF/Emitter plugin
instances, /root/reference/include/mitsuba/render/scene.h:49-1187) compiles
here into a single pytree of static-shape arrays: triangles as SoA, materials
as an enum-dispatched parameter table, emitters as a sampling table with a
discrete PMF.  Everything an integrator touches per-bounce is a gather from
these arrays — no virtual dispatch, no pointers, jit/vmap/shard-friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


# Material type enum (reference: src/bsdfs/* plugin registry).
class BSDFType:
    DIFFUSE = 0          # bsdfs/diffuse.cpp — Lambertian
    CONDUCTOR = 1        # bsdfs/conductor.cpp — smooth mirror w/ conductor fresnel
    DIELECTRIC = 2       # bsdfs/dielectric.cpp — smooth glass (reflect+refract)
    ROUGH_CONDUCTOR = 3  # bsdfs/roughconductor.cpp — GGX microfacet
    PLASTIC = 4          # bsdfs/plastic.cpp — diffuse + smooth dielectric coat
    ROUGH_DIELECTRIC = 5 # bsdfs/roughdielectric.cpp — GGX glass
    NULL = 6             # bsdfs/null.cpp — pass-through (medium boundaries)
    ROUGH_PLASTIC = 7    # bsdfs/roughplastic.cpp — diffuse + GGX coat
    ROUGH_DIFFUSE = 8    # bsdfs/roughdiffuse.cpp — Oren-Nayar
    PHONG = 9            # bsdfs/phong.cpp — modified Phong
    MASK = 10            # bsdfs/mask.cpp — opacity-masked nested BSDF
    TWO_SIDED = 11       # handled at build time by flag
    WARD = 12            # bsdfs/ward.cpp — anisotropic Ward-Duer
    DIFFTRANS = 13       # bsdfs/difftrans.cpp — diffuse transmission
    BLEND = 14           # bsdfs/blendbsdf.cpp + mixturebsdf.cpp (2 lobes)
    COATING = 15         # bsdfs/coating.cpp — smooth dielectric layer over a
    #                      nested BSDF (Fresnel transmittances + absorption)
    HK = 16              # bsdfs/hk.cpp — Hanrahan-Krueger thin single-
    #                      scattering slab (glossy refl/trans + delta trans)
    THINDIELECTRIC = 17  # bsdfs/thindielectric.cpp — zero-thickness glass
    #                      slab: TIR-summed reflectance R' = 2R/(1+R),
    #                      straight-through transmission (no refraction bend)
    CLOTH = 18           # bsdfs/irawan.cpp — woven cloth; the weave tile is
    #                      baked to (kd, yarn-record) textures at build time
    #                      and the Irawan-Marschner filament/staple specular
    #                      integrand is evaluated per lane (models/bsdf.py
    #                      cloth_spec_raw); row columns are repurposed:
    #                      eta=(vM alpha, beta, ss), k=(psi, umax, kappa),
    #                      13=fallback ward alpha, 15=specular norm,
    #                      18=hWidth, 27:32=(w, l, areaW, areaF, fb_scale)
    N_TYPES = 19


class EmitterKind:
    AREA = 0         # emitters/area.cpp
    POINT = 1        # emitters/point.cpp
    CONSTANT = 2     # emitters/constant.cpp — uniform environment
    DIRECTIONAL = 3  # emitters/directional.cpp
    SPOT = 4         # emitters/spot.cpp
    ENVMAP = 5       # emitters/envmap.cpp — importance-sampled lat-long
    COLLIMATED = 6   # emitters/collimated.cpp — delta position + direction
    #   (NEE always fails, collimated.cpp sampleDirect pdf=0; the beam only
    #   contributes through particle/bidirectional strategies' sample_ray)


class Geometry(NamedTuple):
    """Triangle soup, SoA.  (T,) leading axis; Moeller-Trumbore precomputed
    edges.  Shading normals/uvs interpolated barycentrically on hit.

    ``shade_packed`` duplicates the per-hit fields as one (T, 32) row table
    so the shading stage does a SINGLE row gather per hit: on TPU each
    separate ``field[prim]`` gather materializes an (N, 3) result whose
    3-lane minor axis is padded to 128 (~40x HBM waste).  Row layout:
      0:3 gn (unit geometric normal), 3:6 n0, 6:9 n1, 9:12 n2,
      12:14 uv0, 14:16 uv1, 16:18 uv2, 18 mat_id, 19 emitter_id (-1 none),
      20:23 emitted radiance, 23 emitter pmf, 24 inv (area*pmf... ) spare,
      25 triangle area, 26:32 zero padding.
    """

    p0: jnp.ndarray      # (T, 3)
    e1: jnp.ndarray      # (T, 3) = p1 - p0
    e2: jnp.ndarray      # (T, 3) = p2 - p0
    n0: jnp.ndarray      # (T, 3) shading normals at vertices
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray     # (T, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_id: jnp.ndarray  # (T,) int32 material index
    emitter_id: jnp.ndarray  # (T,) int32 index into emitter table, -1 if none
    shade_packed: jnp.ndarray  # (T, 32) float32, layout above
    # optional per-vertex RGB colors packed per face [c0 c1 c2] — present
    # only when a material uses vertexcolors/curvature textures (reference
    # textures/vertexcolors.cpp, curvature.cpp); None otherwise so the
    # shading gather is statically elided
    vcol: jnp.ndarray = None  # (T, 9) float32 or None


class BVH(NamedTuple):
    """Flattened binary BVH (host-built, see accel/bvh.py).

    Internal node i: child0[i], child1[i] >= 0.
    Leaf node i: child0[i] = -(prim_start+1), child1[i] = -prim_count.
    ``prim_idx`` permutes into the Geometry arrays.
    """

    node_min: jnp.ndarray   # (N, 3)
    node_max: jnp.ndarray   # (N, 3)
    child0: jnp.ndarray     # (N,) int32
    child1: jnp.ndarray     # (N,) int32
    prim_idx: jnp.ndarray   # (T,) int32
    max_depth: int          # static python int — traversal stack bound


class Materials(NamedTuple):
    """Enum-dispatched BSDF parameter table, (M,) leading axis.

    ``packed`` (M, 32) mirrors the fields for single-row-gather shading:
    0 type, 1:4 reflectance, 4:7 specular, 7:10 eta, 10:13 k, 13 alpha(_u),
    14 texture_id, 15 alpha_v (anisotropic ward; == alpha otherwise),
    16 sub_a (nested material row, -1 none), 17 sub_b, 18 weight/opacity,
    19 bump_tex_id (-1 none; always a *normal map* — builder converts
    height maps host-side), 20 bump_scale, 21:32 pad.

    One level of nesting (blendbsdf/mixturebsdf/mask wrapping plain
    families) is resolved on the wavefront; the scene compiler rejects
    deeper graphs (reference allows them, practical scenes don't use them).
    """

    type: jnp.ndarray        # (M,) int32 BSDFType
    reflectance: jnp.ndarray # (M, 3) diffuse albedo / tint
    specular: jnp.ndarray    # (M, 3) specular reflectance scale
    eta: jnp.ndarray         # (M, 3) IOR (dielectric uses [...,0])
    k: jnp.ndarray           # (M, 3) conductor absorption
    alpha: jnp.ndarray       # (M,) microfacet roughness (GGX)
    texture_id: jnp.ndarray  # (M,) int32 index into texture atlas, -1 = none
    packed: jnp.ndarray      # (M, 32) float32, layout above
    # (M, 16) microfacet-averaged coat transmittance T(cos theta) on the
    # cos grid i/15, built by quadrature for rough coatings (the
    # reference's data/microfacet rtrans tables, roughcoating.cpp
    # m_roughTransmittance); None -> smooth-Fresnel fallback
    coat_trans: jnp.ndarray = None


class Emitters(NamedTuple):
    """Emitter sampling table (E,) + discrete power-proportional PMF.

    The reference's Scene::sampleEmitterDirect draws from a discrete emitter
    PMF (scene.h:482-756); here the PMF/CDF are arrays and drawing is a
    searchsorted.
    """

    kind: jnp.ndarray        # (E,) int32 EmitterKind
    tri: jnp.ndarray         # (E,) int32 triangle index (AREA) or -1
    radiance: jnp.ndarray    # (E, 3) radiance (area/env) or intensity (point)
    position: jnp.ndarray    # (E, 3) point/spot position or direction (directional)
    aux: jnp.ndarray         # (E, 3) spot axis / spare params
    cutoff: jnp.ndarray      # (E, 2) spot cos cutoffs (total, falloff-begin)
    area: jnp.ndarray        # (E,) triangle area (AREA) else 1
    pmf: jnp.ndarray         # (E,)
    cdf: jnp.ndarray         # (E,)
    env_radiance: jnp.ndarray  # (3,) constant-env radiance (zeros if none)
    env_pdf: jnp.ndarray       # () uniform-sphere NEE pdf (constant env)
    # textured environment (reference src/emitters/envmap.cpp importance
    # sampling): lat-long image + row/col CDF tables; (1,1) when absent
    env_image: jnp.ndarray     # (He, We, 3)
    env_cdf_rows: jnp.ndarray  # (He,) marginal CDF over rows
    env_cdf_cols: jnp.ndarray  # (He, We) conditional CDFs per row
    env_pdf_tex: jnp.ndarray   # (He, We) solid-angle pdf per texel (x pmf)
    packed: jnp.ndarray        # (E, 32) single-gather NEE table:
    # 0 kind, 1 pmf, 2:5 radiance, 5:8 position/direction, 8:11 spot axis,
    # 11:13 cutoffs, 13 area, 14:17 tri p0, 17:20 tri e1, 20:23 tri e2,
    # 23:26 unit tri normal, 26:32 padding


class SensorKind:
    PERSPECTIVE = 0   # src/sensors/perspective.cpp (+thinlens via aperture,
    #                   +perspective_rdist via the kc distortion coefficients)
    ORTHOGRAPHIC = 1  # src/sensors/orthographic.cpp
    SPHERICAL = 2     # src/sensors/spherical.cpp (lat-long 360)
    TELECENTRIC = 3   # src/sensors/telecentric.cpp (ortho + aperture blur)
    IRRADIANCEMETER = 4  # src/sensors/irradiancemeter.cpp (cosine hemisphere)
    RADIANCEMETER = 5    # src/sensors/radiancemeter.cpp (single direction)
    FLUENCEMETER = 6     # src/sensors/fluencemeter.cpp (uniform sphere)


class Sensor(NamedTuple):
    """Perspective/thinlens/orthographic/spherical/telecentric camera and
    the measurement-probe sensors (reference src/sensors/).  ``kind`` is
    also readable host-side (int()) to pick the static ray-gen branch."""

    to_world: jnp.ndarray    # (4, 4) camera-to-world
    tan_half_fov_x: jnp.ndarray  # scalar (ortho/telecentric: half-width)
    tan_half_fov_y: jnp.ndarray
    aperture_radius: jnp.ndarray  # scalar; 0 = pinhole
    focus_distance: jnp.ndarray
    near_clip: jnp.ndarray
    kind: jnp.ndarray        # () int32 SensorKind
    # radial lens distortion (perspective_rdist.cpp kc polynomial):
    # image-plane coords scaled by 1 + kc0 r^2 + kc1 r^4
    kc: jnp.ndarray = None
    # constant measurement weight folded into the developed image
    # (irradiancemeter: pi, from cosine-hemisphere importance sampling)
    meas_scale: jnp.ndarray = None


class MediumData(NamedTuple):
    """Participating-medium parameters (reference src/medium/{homogeneous,
    heterogeneous}.cpp + src/volume/{constvolume,gridvolume,vdbvolume}.cpp).

    One global medium; homogeneous media use the closed-form paths, grid
    media the null-collision tracking kernels (models/medium.py).
    sigma_t(x) = density(x) * (sigma_a + sigma_s); for homogeneous media
    density is the constant-1 (1,1,1) grid and the closed form is used."""

    sigma_a: jnp.ndarray  # (3,) — includes any user "scale" factor
    sigma_s: jnp.ndarray  # (3,)
    phase_g: jnp.ndarray  # scalar HG anisotropy; 0 = isotropic
    enabled: bool         # static (host-side branch)
    density: jnp.ndarray       # (D, H, W) float32 density grid
    world_to_grid: jnp.ndarray # (4, 4) world point -> [0,1]^3 grid coords
    majorant: jnp.ndarray      # () max density * max channel of sigma_t
    heterogeneous: bool        # static (host-side branch)
    phase_kind: int = 0        # static PhaseKind (models/phase.py dispatch)
    # fiber-phase extras (kkay/microflake; None for the classic families):
    orientation: jnp.ndarray = None  # (3,) constant fiber axis
    phase_aux: jnp.ndarray = None    # (4,) kkay: ks,kd,exponent,norm;
    #                                  microflake: stddev,norm,erf-c1,0
    sigt_table: jnp.ndarray = None   # (64,) microflake sigma_t(cos) table
    # mixture-phase extras (mixturephase.cpp; None otherwise):
    mix_weights: jnp.ndarray = None  # (K,) normalized component weights
    mix_g: jnp.ndarray = None        # (K,) per-component HG g
    mix_kinds: jnp.ndarray = None    # (K,) int32 MIX_HG/MIX_RAYLEIGH


class SceneData(NamedTuple):
    geo: Geometry
    bvh: BVH
    mats: Materials
    emitters: Emitters
    sensor: Sensor
    medium: Optional[MediumData]
    aabb_min: jnp.ndarray  # (3,) scene bounds (guiding grid domain)
    aabb_max: jnp.ndarray
    textures: jnp.ndarray       # (NT, TH, TW, 3) bitmap atlas ((1,1,1,3) if none)
    texture_sizes: jnp.ndarray  # (NT, 2) actual (h, w) per texture
    # subsurface scattering parameter table (reference src/subsurface/
    # dipole.cpp): rows indexed by shade_packed[27]; layout
    # 0:3 sigma_a, 3:6 sigma_s_prime, 6 eta, 7 scale, 8:16 pad
    sss_packed: jnp.ndarray = None  # (S, 16) float32 or None
    # two-level intersection tables (ops/intersect_twolevel.py), built for
    # scenes above the all-pairs kernel's economic range; None otherwise
    blocks: object = None  # BlockTable or None
    # pair-expansion tables (ops/intersect_pairs.py) — the round-3
    # large-scene hot path; blocks stays as the unproven-ray fallback
    pairs: object = None   # PairTable or None


def pad_to(arr: np.ndarray, n: int, fill=0):
    """Pad leading axis to n with fill (static-shape friendliness)."""
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)
