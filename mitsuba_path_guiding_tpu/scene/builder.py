"""Scene compiler: dict scene description -> flat SceneData arrays.

The TPU-native analogue of the reference's two-phase scene construction
(SceneHandler XML -> Properties -> PluginManager::createObject -> configure,
/root/reference/src/librender/scenehandler.cpp:197-273, scene.cpp:272-365):
a typed dict (the Properties model) is validated and compiled host-side into
one SceneData pytree — triangles pre-transformed to world space, materials
deduplicated into an enum table, emitters gathered into a power-weighted
sampling table, BVH built (the kd-tree build step of Scene::initialize).

Scene description schema (see scenes.py for examples):
    {"sensor": {"type": "perspective", "to_world": 4x4, "fov": deg, ...},
     "shapes": [{"type": "rectangle"|"cube"|"sphere"|"disk"|"obj"|"ply"|
                 "trimesh", "to_world": 4x4,
                 "bsdf": {"type": "diffuse", "reflectance": [r,g,b], ...},
                 "emitter": {"radiance": [r,g,b]}  # optional area light
               }, ...],
     "emitters": [{"type": "point"|"constant"|"directional"|"spot", ...}],
     "medium": {"sigma_a": [..], "sigma_s": [..], "g": float}  # optional
    }
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.bvh import build_bvh

# triangle count above which the scene gets two-level intersection tables.
# Matches integrators.render.BRUTE_FORCE_MAX_TRIS so the TPU never falls
# into the vmapped-BVH gap between them: XLA TPU lowers the BVH leaf's
# per-lane triangle gathers into a full (rays, tris, 3) broadcast-select —
# a ~100 GB allocation at 9k rays x 22k tris (round-5 find; the vmapped
# BVH serves CPU only, as its docstring says).
TWOLEVEL_MIN_TRIS = 16384
from mitsuba_path_guiding_tpu.accel.traverse import STACK_SIZE
from mitsuba_path_guiding_tpu.core.spectrum import LUM_WEIGHTS
from mitsuba_path_guiding_tpu.scene.shapes import SHAPE_BUILDERS
from mitsuba_path_guiding_tpu.scene.transforms import look_at, scale, translate
from mitsuba_path_guiding_tpu.scene.types import (
    BSDFType,
    BVH,
    Emitters,
    EmitterKind,
    Geometry,
    Materials,
    MediumData,
    SceneData,
    Sensor,
    SensorKind,
)

_BSDF_TYPES = {
    "diffuse": BSDFType.DIFFUSE,
    "roughdiffuse": BSDFType.ROUGH_DIFFUSE,
    "conductor": BSDFType.CONDUCTOR,
    "dielectric": BSDFType.DIELECTRIC,
    "thindielectric": BSDFType.THINDIELECTRIC,
    "roughconductor": BSDFType.ROUGH_CONDUCTOR,
    "roughdielectric": BSDFType.ROUGH_DIELECTRIC,
    "plastic": BSDFType.PLASTIC,
    "roughplastic": BSDFType.ROUGH_PLASTIC,
    "phong": BSDFType.PHONG,
    "null": BSDFType.NULL,
    "ward": BSDFType.WARD,
    "difftrans": BSDFType.DIFFTRANS,
    "hk": BSDFType.HK,
    # nested wrappers (one level deep; see Materials docstring):
    "blendbsdf": BSDFType.BLEND,
    "mixturebsdf": BSDFType.BLEND,
    "mask": BSDFType.MASK,
    "coating": BSDFType.COATING,
    # roughcoating = COATING row with alpha > 0: GGX reflection lobe off
    # the coat interface (reference src/bsdfs/roughcoating.cpp)
    "roughcoating": BSDFType.COATING,
}

# named conductor IOR presets (reference data/ior/*.spd, RGB-averaged)
_CONDUCTOR_IOR = {
    "Au": ([0.143, 0.375, 1.442], [3.983, 2.386, 1.603]),
    "Ag": ([0.155, 0.116, 0.138], [4.828, 3.122, 2.146]),
    "Al": ([1.345, 0.965, 0.617], [7.475, 6.400, 5.303]),
    "Cu": ([0.201, 0.924, 1.102], [3.910, 2.448, 2.168]),
    "none": ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # perfect mirror
}


def _rgb(x, default):
    if x is None:
        return np.array(default, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    return np.full(3, float(x)) if x.ndim == 0 else x


def _compile_bsdf(spec: dict, textures: list | None = None, register_sub=None):
    """One material table row from a bsdf dict.  A "texture" sub-dict
    ({"type": "bitmap", "filename"|"image"} or "checkerboard"/
    "gridtexture") rasterizes into the scene's atlas and overrides the
    reflectance at shading time (reference src/textures/).

    Nested wrappers (blendbsdf/mixturebsdf/mask, reference
    src/bsdfs/{blendbsdf,mixturebsdf,mask}.cpp) register their child
    lobes through ``register_sub`` (a callable returning the child's row
    index) and store the indices in sub_a/sub_b; bumpmap/normalmap
    wrappers compile to the child row plus bump fields."""
    t = spec.get("type", "diffuse")
    if t == "irawan":
        # woven cloth (reference bsdfs/irawan.cpp): the weave tile bakes
        # into kd + yarn-record textures at build time (models/cloth.py
        # compile_cloth); the Irawan-Marschner specular integrand itself
        # runs per lane (models/bsdf.py cloth_spec_raw).  Column reuse is
        # documented at scene/types.py CLOTH.
        from mitsuba_path_guiding_tpu.models.cloth import (
            PLAIN_WEAVE,
            compile_cloth,
            parse_weave,
        )

        if register_sub is None:
            raise ValueError("irawan may not be nested inside another wrapper")
        if "filename" in spec:
            with open(spec["filename"]) as fh:
                text = fh.read()
        else:
            text = spec.get("weave", PLAIN_WEAVE)
        # remaining plugin properties resolve $identifier placeholders in
        # the pattern file (irawan.cpp "additional parameters")
        reserved = {"type", "filename", "weave", "repeatU", "repeatV"}
        params = {k: v for k, v in spec.items() if k not in reserved}
        wp = parse_weave(text, params or None)
        cc = compile_cloth(wp)
        row = {
            "type": int(BSDFType.CLOTH),
            "reflectance": np.asarray(
                np.mean([y["kd"] for y in wp["yarns"]], axis=0), np.float32
            ),
            "specular": np.asarray(cc["mean_ks"], np.float32),
            "eta": np.asarray(
                [cc["alpha"], cc["beta"], cc["ss"]], np.float32
            ),
            "k": np.asarray([cc["psi"], cc["umax"], cc["kappa"]], np.float32),
            "alpha": cc["a_fb"],
            "alpha_v": cc["norm"],
            "weight": cc["h_width"],
            "texture_id": -1,
            "cloth_extra": (
                cc["w"], cc["l"], cc["area_warp"], cc["area_weft"],
                cc["fb_scale"],
            ),
        }
        if textures is not None:
            textures.append(cc["kd_img"])
            row["texture_id"] = len(textures) - 1
            # yarn-record map rides the bump slot (nearest-fetched, never
            # used for normal perturbation — path.py skips CLOTH rows)
            textures.append(cc["aux_img"])
            row["bump_tex_id"] = len(textures) - 1
        row["uv_scale"] = (
            float(spec.get("repeatU", 1.0)), float(spec.get("repeatV", 1.0))
        )
        return row
    if t in ("bumpmap", "normalmap"):
        if register_sub is None:
            raise ValueError(f"{t} not allowed here")
        inner = dict(spec.get("bsdf") or {"type": "diffuse"})
        row = _compile_bsdf(inner, textures, register_sub)
        row["bump_tex_id"], row["bump_scale"] = _compile_bump_texture(
            spec, textures, is_height=(t == "bumpmap")
        )
        return row
    if t not in _BSDF_TYPES:
        raise ValueError(f"unknown bsdf type: {t}")
    row = {
        "type": _BSDF_TYPES[t],
        "reflectance": _rgb(spec.get("reflectance", spec.get("diffuse_reflectance")), [0.5, 0.5, 0.5]),
        "specular": _rgb(spec.get("specular_reflectance"), [1.0, 1.0, 1.0]),
        "eta": _rgb(spec.get("eta"), [1.5, 1.5, 1.5]),
        "k": _rgb(spec.get("k"), [0.0, 0.0, 0.0]),
        "alpha": float(spec.get("alpha", spec.get("alpha_u", 0.1))),
        "alpha_v": float(spec.get("alpha_v", spec.get("alpha", spec.get("alpha_u", 0.1)))),
        "texture_id": -1,
        "sub_a": -1,
        "sub_b": -1,
        "weight": 0.0,
        "bump_tex_id": -1,
        "bump_scale": 1.0,
    }
    if t in ("coating", "roughcoating"):
        if register_sub is None:
            raise ValueError(f"{t} may not be nested inside another wrapper")
        int_ior = float(spec.get("int_ior", 1.5046))
        ext_ior = float(spec.get("ext_ior", 1.000277))
        row["eta"] = np.full(3, int_ior / ext_ior)
        # coat interface roughness: 0 = delta reflection (coating.cpp);
        # > 0 = GGX reflection lobe (roughcoating.cpp)
        row["alpha"] = float(spec.get("alpha", 0.1)) if t == "roughcoating" else 0.0
        row["weight"] = float(spec.get("thickness", 1.0))
        row["reflectance"] = _rgb(spec.get("sigma_a"), [0.0, 0.0, 0.0])
        row["sub_a"] = register_sub(spec.get("bsdf") or {"type": "diffuse"})
        return row
    if t == "hk":
        # Hanrahan-Krueger slab (hk.cpp): sigmaS/sigmaA or sigmaT+albedo,
        # thickness, HG g; packed as refl=sigmaS, k=sigmaA, weight=thickness,
        # eta[0]=g (models/bsdf.py _hk_params)
        ss = spec.get("sigma_s")
        sa = spec.get("sigma_a")
        if "sigma_t" in spec:
            st = _rgb(spec["sigma_t"], [1.0] * 3)
            al = _rgb(spec.get("albedo"), [0.8] * 3)
            ss, sa = st * al, st * (1.0 - al)
        row["reflectance"] = _rgb(ss, [1.0] * 3)
        row["k"] = _rgb(sa, [0.05] * 3)
        row["weight"] = float(spec.get("thickness", 1.0))
        g = float(spec.get("g", 0.0))
        row["eta"] = np.full(3, g)
        return row
    if t in ("blendbsdf", "mixturebsdf", "mask"):
        if register_sub is None:
            raise ValueError(f"{t} may not be nested inside another wrapper")
        if t == "mask":
            op = _rgb(spec.get("opacity"), [0.5] * 3)
            row["weight"] = float(np.mean(op))
            row["sub_a"] = register_sub(spec.get("bsdf") or {"type": "diffuse"})
        else:
            subs = spec.get("bsdfs")
            if t == "mixturebsdf":
                weights = [float(x) for x in spec.get("weights", [0.5, 0.5])]
                if len(subs) != 2:
                    raise ValueError(
                        "mixturebsdf: this build supports exactly 2 components "
                        "(reference mixturebsdf.cpp allows N; express N>2 as "
                        "nested blends is unsupported — file an issue)"
                    )
                wsum = max(weights[0] + weights[1], 1e-9)
                row["weight"] = weights[1] / wsum
            else:
                row["weight"] = float(spec.get("weight", 0.5))
            row["sub_a"] = register_sub(subs[0])
            row["sub_b"] = register_sub(subs[1])
        return row
    tex = spec.get("texture")
    if tex is not None and textures is not None:
        tt = tex.get("type", "bitmap")
        if tt in ("vertexcolors", "curvature"):
            # geometry-driven textures: colors come from the per-vertex
            # table built in the shape loop (Geometry.vcol); the sentinel
            # id selects the interpolated vertex color at shading time
            row["texture_id"] = -3
        elif tt == "wireframe":
            # edge highlighting from barycentric edge distance (reference
            # textures/wireframe.cpp; line width here is barycentric
            # rather than world-space — constant per-triangle fraction)
            row["texture_id"] = -4
            row["reflectance"] = _rgb(
                tex.get("interior_color", tex.get("interiorColor")), [0.5] * 3
            )
            row["wire_edge"] = _rgb(
                tex.get("edge_color", tex.get("edgeColor")), [0.1] * 3
            )
            row["wire_lw"] = float(tex.get("line_width", tex.get("lineWidth", 0.05)))
        else:
            img = _rasterize_texture(tex, textures)
            textures.append(img)
            row["texture_id"] = len(textures) - 1
    if t in ("conductor", "roughconductor"):
        mat = spec.get("material", None)
        if mat is not None or "eta" not in spec:
            eta, k = _CONDUCTOR_IOR[mat or "none"]
            row["eta"], row["k"] = np.array(eta), np.array(k)
    if t in ("dielectric", "thindielectric", "roughdielectric", "plastic", "roughplastic"):
        int_ior = float(spec.get("int_ior", 1.5046))
        ext_ior = float(spec.get("ext_ior", 1.000277))
        row["eta"] = np.full(3, int_ior / ext_ior)
    return row


def _rasterize_texture(tex: dict, textures: list) -> np.ndarray:
    from mitsuba_path_guiding_tpu.models.texture import rasterize_procedural

    tt = tex.get("type", "bitmap")
    if tt == "bitmap":
        if "image" in tex:
            return np.asarray(tex["image"], dtype=np.float32)
        from mitsuba_path_guiding_tpu.util import _read

        return _read(tex["filename"])
    if tt == "scale":
        # multiplicative wrapper (reference textures/scale.cpp): scale an
        # inner texture (or constant) by a scalar/RGB factor at build time
        inner = tex.get("texture")
        img = (
            _rasterize_texture(inner, textures)
            if inner is not None
            else np.ones((1, 1, 3), np.float32)
        )
        return (img * _rgb(tex.get("scale"), [1.0] * 3)).astype(np.float32)
    return rasterize_procedural(tex)


def _compile_bump_texture(spec: dict, textures: list | None, is_height: bool):
    """bumpmap/normalmap wrapper (reference src/bsdfs/{bumpmap,normalmap}.cpp).

    Height maps are converted to tangent-space normal maps HOST-SIDE
    (finite differences) so the shading path has a single code path: a
    normal-map gather + frame perturbation."""
    tex = spec.get("texture")
    if tex is None or textures is None:
        return -1, 1.0
    img = _rasterize_texture(tex, textures)
    scale = float(spec.get("scale", 1.0))
    if is_height:
        h = img.mean(axis=-1) if img.ndim == 3 else img
        gy, gx = np.gradient(h)
        H, W = h.shape
        n = np.stack(
            [-scale * gx * W, -scale * gy * H, np.ones_like(h)], axis=-1
        )
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        img = ((n + 1.0) * 0.5).astype(np.float32)
    textures.append(np.asarray(img, dtype=np.float32))
    return len(textures) - 1, scale


def _compile_medium(med: dict | None) -> MediumData:
    """Medium dict -> MediumData (reference src/medium/ plugin configure).

    Homogeneous: {"sigma_a": rgb, "sigma_s": rgb, "g": float}
    Heterogeneous (heterogeneous.cpp EDensity model): additionally
      "density": volume spec (scene/volume.py — gridvolume/.vol/.npy/
                 constvolume/vdbvolume or a bare 3-D array),
      "scale": float extinction scale,
      "bounds": ((lo),(hi)) world AABB of the grid (overrides the VOL
                file's embedded bounds),
      "phase": "hg" (default) | "isotropic" | "rayleigh".
    """
    ones = np.ones((1, 1, 1), dtype=np.float32)
    eye = np.eye(4, dtype=np.float32)
    if med is None:
        return MediumData(
            sigma_a=jnp.zeros(3), sigma_s=jnp.zeros(3), phase_g=jnp.float32(0.0),
            enabled=False, density=jnp.asarray(ones), world_to_grid=jnp.asarray(eye),
            majorant=jnp.float32(0.0), heterogeneous=False, phase_kind=0,
        )
    from mitsuba_path_guiding_tpu.models.phase import PhaseKind

    scale_f = float(med.get("scale", 1.0))
    sigma_a = np.asarray(med.get("sigma_a", [0.0] * 3), dtype=np.float32) * scale_f
    sigma_s = np.asarray(med.get("sigma_s", [0.0] * 3), dtype=np.float32) * scale_f
    phase_name = med.get("phase", "hg")
    pk = {
        "rayleigh": PhaseKind.RAYLEIGH,
        "kkay": PhaseKind.KKAY,
        "microflake": PhaseKind.MICROFLAKE,
        "mixture": PhaseKind.MIXTURE,
        "mixturephase": PhaseKind.MIXTURE,
    }.get(phase_name, PhaseKind.HG)
    g = 0.0 if phase_name in ("isotropic", "rayleigh") else float(med.get("g", 0.0))
    fiber_kw = {}
    if pk == PhaseKind.MIXTURE:
        # mixturephase.cpp: normalized weights over child phases; here each
        # component is {"type": "hg"|"isotropic"|"rayleigh", "g": float}
        from mitsuba_path_guiding_tpu.models.phase import MIX_HG, MIX_RAYLEIGH

        comps = med.get("phase_components", [])
        ws = np.asarray(
            med.get("phase_weights", [1.0] * len(comps)), dtype=np.float32
        )
        if len(comps) == 0 or len(ws) != len(comps):
            raise ValueError("mixture phase needs matching weights/components")
        if np.any(ws < 0.0) or ws.sum() <= 0.0:
            raise ValueError("invalid mixture phase weights")
        ws = ws / ws.sum()
        gs, kinds = [], []
        for c in comps:
            ct = c.get("type", "hg") if isinstance(c, dict) else str(c)
            if ct == "rayleigh":
                gs.append(0.0)
                kinds.append(MIX_RAYLEIGH)
            elif ct == "isotropic":
                gs.append(0.0)
                kinds.append(MIX_HG)
            elif ct == "hg":
                gs.append(float(c.get("g", 0.0)) if isinstance(c, dict) else 0.0)
                kinds.append(MIX_HG)
            else:
                raise ValueError(f"unsupported mixture phase component '{ct}'")
        fiber_kw["mix_weights"] = jnp.asarray(ws)
        fiber_kw["mix_g"] = jnp.asarray(np.asarray(gs, dtype=np.float32))
        fiber_kw["mix_kinds"] = jnp.asarray(np.asarray(kinds, dtype=np.int32))
    if pk in (PhaseKind.KKAY, PhaseKind.MICROFLAKE):
        axis = np.asarray(med.get("orientation", [0.0, 0.0, 1.0]), dtype=np.float32)
        axis = axis / max(np.linalg.norm(axis), 1e-9)
        fiber_kw["orientation"] = jnp.asarray(axis)
        if pk == PhaseKind.KKAY:
            from mitsuba_path_guiding_tpu.models.phase import kkay_normalization

            e = float(med.get("exponent", 4.0))
            fiber_kw["phase_aux"] = jnp.asarray(
                np.array(
                    [
                        float(med.get("ks", 0.4)),
                        float(med.get("kd", 0.2)),
                        e,
                        kkay_normalization(e),
                    ],
                    dtype=np.float32,
                )
            )
        else:
            from mitsuba_path_guiding_tpu.models.phase import microflake_tables

            aux, table = microflake_tables(float(med.get("stddev", 0.3)))
            fiber_kw["phase_aux"] = jnp.asarray(aux)
            fiber_kw["sigt_table"] = jnp.asarray(table)
    dens_spec = med.get("density", None)
    if dens_spec is None:
        return MediumData(
            sigma_a=jnp.asarray(sigma_a), sigma_s=jnp.asarray(sigma_s),
            phase_g=jnp.float32(g), enabled=True, density=jnp.asarray(ones),
            world_to_grid=jnp.asarray(eye), majorant=jnp.float32(np.max(sigma_a + sigma_s)),
            heterogeneous=False, phase_kind=pk, **fiber_kw,
        )
    from mitsuba_path_guiding_tpu.scene.volume import load_volume_spec

    grid, aabb = load_volume_spec(dens_spec)
    if "bounds" in med:
        aabb = np.asarray(med["bounds"], dtype=np.float32).reshape(2, 3)
    if aabb is None:
        aabb = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], dtype=np.float32)
    lo, hi = aabb[0], aabb[1]
    extent = np.maximum(hi - lo, 1e-8)
    w2g = np.eye(4, dtype=np.float32)
    w2g[:3, :3] = np.diag(1.0 / extent)
    w2g[:3, 3] = -lo / extent
    majorant = float(grid.max()) * float(np.max(sigma_a + sigma_s))
    return MediumData(
        sigma_a=jnp.asarray(sigma_a), sigma_s=jnp.asarray(sigma_s),
        phase_g=jnp.float32(g), enabled=True,
        density=jnp.asarray(grid.astype(np.float32)),
        world_to_grid=jnp.asarray(w2g), majorant=jnp.float32(majorant),
        heterogeneous=True, phase_kind=pk, **fiber_kw,
    )


def _to_world(spec):
    m = spec.get("to_world", None)
    if m is None:
        m = np.eye(4)
        if "center" in spec or "radius" in spec:  # sphere/point conveniences
            r = float(spec.get("radius", 1.0))
            c = spec.get("center", [0.0, 0.0, 0.0])
            m = translate(*c) @ scale(r)
    return np.asarray(m, dtype=np.float64)


def build_scene(desc: dict) -> SceneData:
    shapes = desc.get("shapes", [])
    if not shapes:
        raise ValueError("scene has no shapes")

    # ---- materials (dedup by content) and triangle soup
    mat_rows: list[dict] = []
    mat_cache: dict[str, int] = {}
    texture_images: list = []

    def _intern(row):
        key = repr(sorted((k, repr(v)) for k, v in row.items()))
        if key not in mat_cache:
            mat_cache[key] = len(mat_rows)
            mat_rows.append(row)
        return mat_cache[key]

    def _register_sub(bspec):
        # nested lobes must be plain families (register_sub=None makes
        # wrapper-in-wrapper raise)
        return _intern(_compile_bsdf(bspec, texture_images, register_sub=None))

    def mat_index(bspec):
        return _intern(
            _compile_bsdf(bspec or {"type": "diffuse"}, texture_images, _register_sub)
        )

    tris = {k: [] for k in ("p0", "e1", "e2", "n0", "n1", "n2", "uv0", "uv1", "uv2")}
    tri_mat, tri_emitter = [], []
    # emitter records built in parallel: per emissive triangle one AREA record
    em = {k: [] for k in ("kind", "tri", "radiance", "position", "aux", "cutoff", "area", "power")}

    def add_emitter(kind, radiance, position=(0, 0, 0), aux=(0, 0, 1), cutoff=(0.0, 0.0), tri=-1, area=1.0, power=1.0):
        em["kind"].append(kind)
        em["tri"].append(tri)
        em["radiance"].append(np.asarray(radiance, dtype=np.float64))
        em["position"].append(np.asarray(position, dtype=np.float64))
        em["aux"].append(np.asarray(aux, dtype=np.float64))
        em["cutoff"].append(np.asarray(cutoff, dtype=np.float64))
        em["area"].append(area)
        em["power"].append(max(power, 1e-12))
        return len(em["kind"]) - 1

    # instancing (reference shapes/instance.cpp + shapegroup.cpp): groups
    # are templates; instances stamp them with a transform.  The compiler
    # flattens instances into the world-space soup — full scene-format
    # parity; two-level (TLAS/BLAS) acceleration is a planned memory
    # optimization, not a capability gap.
    groups: dict[str, list] = {}
    flat_shapes = []
    for sh in shapes:
        if sh.get("type") == "shapegroup":
            groups[sh["id"]] = sh["shapes"]
            continue
        if sh.get("type") == "instance":
            tw = _to_world(sh)
            for member in groups[sh["ref"]]:
                member = dict(member)
                member_tw = tw @ _to_world(member)
                member["to_world"] = member_tw
                if "bsdf" in sh and "bsdf" not in member:
                    member["bsdf"] = sh["bsdf"]
                flat_shapes.append(member)
            continue
        flat_shapes.append(sh)

    sss_rows: list[np.ndarray] = []
    tri_sss: list[int] = []
    tri_vcol: list[np.ndarray] = []
    any_vcol = False
    for sh in flat_shapes:
        mesh = SHAPE_BUILDERS[sh["type"]](sh).transformed(_to_world(sh))
        if sh.get("flip_normals"):
            mesh = mesh.flipped()
        p0, e1, e2, n0, n1, n2, uv0, uv1, uv2 = mesh.face_arrays()
        mid = mat_index(sh.get("bsdf"))
        base = len(tri_mat)
        for k, v in zip(tris, (p0, e1, e2, n0, n1, n2, uv0, uv1, uv2)):
            tris[k].append(v)
        nf = len(p0)
        tri_mat.extend([mid] * nf)
        # geometry-driven textures (vertexcolors.cpp / curvature.cpp):
        # bake per-face vertex colors into the optional vcol table
        tex_spec = (sh.get("bsdf") or {}).get("texture") or {}
        ttype = tex_spec.get("type")
        if ttype == "vertexcolors":
            fc = mesh.face_colors()
            if fc is None:
                fc = np.ones((nf, 9), np.float32)
            tri_vcol.append(np.asarray(fc, np.float32))
            any_vcol = True
        elif ttype == "curvature":
            from mitsuba_path_guiding_tpu.scene.shapes import curvature_colors

            cc = curvature_colors(
                mesh,
                kind=tex_spec.get("curvature", "mean"),
                scale=float(tex_spec.get("scale", 1.0)),
            )
            f = mesh.faces
            fc = np.concatenate([cc[f[:, 0]], cc[f[:, 1]], cc[f[:, 2]]], axis=-1)
            tri_vcol.append(np.asarray(fc, np.float32))
            any_vcol = True
        else:
            tri_vcol.append(np.zeros((nf, 9), np.float32))
        # subsurface spec (dipole.cpp parameters) -> per-triangle sss row
        if sh.get("subsurface") is not None:
            ss = sh["subsurface"]
            g_ss = float(ss.get("g", 0.0))
            single = ss.get("type", "dipole") == "singlescatter"
            row16 = np.zeros(16, dtype=np.float32)
            row16[0:3] = _rgb(ss.get("sigma_a"), [0.0014, 0.0025, 0.0142])
            # dipole uses similarity-reduced sigma_s' = sigma_s (1 - g);
            # singlescatter needs the raw coefficient + g for the phase
            sig_s = _rgb(ss.get("sigma_s"), [0.7, 1.22, 1.9])
            row16[3:6] = sig_s if single else sig_s * (1.0 - g_ss)
            row16[6] = float(ss.get("int_ior", 1.5)) / float(ss.get("ext_ior", 1.0)) \
                if "int_ior" in ss or "ext_ior" in ss else float(ss.get("eta", 1.5))
            row16[7] = float(ss.get("scale", 1.0))
            row16[8] = g_ss
            row16[9] = 1.0 if single else 0.0
            sss_rows.append(row16)
            tri_sss.extend([len(sss_rows) - 1] * nf)
        else:
            tri_sss.extend([-1] * nf)
        if "emitter" in sh and sh["emitter"] is not None:
            rad = _rgb(sh["emitter"].get("radiance"), [1.0, 1.0, 1.0])
            lum = float(np.dot(rad, np.asarray(LUM_WEIGHTS)))
            areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
            for f in range(nf):
                eid = add_emitter(
                    EmitterKind.AREA, rad, tri=base + f, area=float(areas[f]),
                    power=lum * float(areas[f]) * np.pi,
                )
                tri_emitter.append(eid)
        else:
            tri_emitter.extend([-1] * nf)

    env_id = -1
    env_tables = None
    env_kind = None
    for espec in desc.get("emitters", []):
        t = espec["type"]
        if t == "envmap":
            from mitsuba_path_guiding_tpu.models.envmap import build_env_tables

            if "image" in espec:
                img = np.asarray(espec["image"], dtype=np.float32)
            else:
                from mitsuba_path_guiding_tpu.util import _read

                img = _read(espec["filename"])
            sc_f = float(espec.get("scale", 1.0))
            env_tables = build_env_tables(img, sc_f)
            mean_lum = float((img @ np.asarray(LUM_WEIGHTS)).mean()) * sc_f
            env_id = add_emitter(
                EmitterKind.ENVMAP, [mean_lum] * 3,
                power=mean_lum * 4 * np.pi,
            )
            env_kind = EmitterKind.ENVMAP
        elif t == "constant":
            rad = _rgb(espec.get("radiance"), [1.0, 1.0, 1.0])
            env_id = add_emitter(
                EmitterKind.CONSTANT, rad,
                power=float(np.dot(rad, np.asarray(LUM_WEIGHTS))) * 4 * np.pi,
            )
            env_kind = EmitterKind.CONSTANT
        elif t == "point":
            inten = _rgb(espec.get("intensity"), [1.0, 1.0, 1.0])
            pos = np.asarray(espec.get("position", _to_world(espec)[:3, 3]), dtype=np.float64)
            add_emitter(
                EmitterKind.POINT, inten, position=pos,
                power=float(np.dot(inten, np.asarray(LUM_WEIGHTS))) * 4 * np.pi,
            )
        elif t == "directional":
            irr = _rgb(espec.get("irradiance"), [1.0, 1.0, 1.0])
            d = np.asarray(espec["direction"], dtype=np.float64)
            d = d / np.linalg.norm(d)
            add_emitter(
                EmitterKind.DIRECTIONAL, irr, position=d,
                power=float(np.dot(irr, np.asarray(LUM_WEIGHTS))),
            )
        elif t == "collimated":
            # delta position + delta direction beam (collimated.cpp):
            # radiates `power` along a single ray; NEE never samples it
            pw = _rgb(espec.get("power"), [1.0, 1.0, 1.0])
            tw = _to_world(espec)
            pos = np.asarray(espec.get("position", tw[:3, 3]), dtype=np.float64)
            if "direction" in espec:
                axis = np.asarray(espec["direction"], dtype=np.float64)
            else:
                axis = tw[:3, 2]
            axis = axis / np.linalg.norm(axis)
            add_emitter(
                EmitterKind.COLLIMATED, pw, position=pos, aux=axis,
                power=float(np.dot(pw, np.asarray(LUM_WEIGHTS))),
            )
        elif t in ("sky", "sun", "sunsky"):
            # procedural clear sky (reference sky.cpp/sun.cpp/sunsky.cpp;
            # Preetham model — see models/sunsky.py for the substitution
            # rationale).  Sky becomes an importance-sampled envmap, sun a
            # directional delta light.
            from mitsuba_path_guiding_tpu.models.envmap import build_env_tables
            from mitsuba_path_guiding_tpu.models.sunsky import (
                hosek_sky_image,
                preetham_sky_image,
                preetham_sun_irradiance,
                sun_direction_from_angles,
            )

            if "sun_direction" in espec:
                sdir = np.asarray(espec["sun_direction"], dtype=np.float64)
                sdir = sdir / np.linalg.norm(sdir)
            else:
                sdir = sun_direction_from_angles(
                    float(espec.get("elevation", 30.0)),
                    float(espec.get("azimuth", 0.0)),
                )
            turb = float(espec.get("turbidity", 3.0))
            sc_f = float(espec.get("scale", 1.0))
            if t in ("sky", "sunsky"):
                if env_id >= 0:
                    raise ValueError("only one environment emitter allowed")
                # Hosek-Wilkie 2012 by default (the reference's sky.cpp
                # model); Preetham 1999 selectable via model="preetham"
                sky_fn = (
                    preetham_sky_image
                    if str(espec.get("model", "hosek")).lower() == "preetham"
                    else hosek_sky_image
                )
                img = sky_fn(
                    sdir, turb, resolution=int(espec.get("resolution", 128)),
                    scale=sc_f * float(espec.get("sky_scale", 1.0)),
                )
                env_tables = build_env_tables(img, 1.0)
                mean_lum = float((img @ np.asarray(LUM_WEIGHTS)).mean())
                env_id = add_emitter(
                    EmitterKind.ENVMAP, [mean_lum] * 3, power=mean_lum * 4 * np.pi
                )
                env_kind = EmitterKind.ENVMAP
            if t in ("sun", "sunsky"):
                irr = preetham_sun_irradiance(
                    sdir, turb, scale=sc_f * float(espec.get("sun_scale", 1.0))
                )
                add_emitter(
                    EmitterKind.DIRECTIONAL, irr, position=-sdir,
                    power=float(np.dot(irr, np.asarray(LUM_WEIGHTS))),
                )
        elif t == "spot":
            inten = _rgb(espec.get("intensity"), [1.0, 1.0, 1.0])
            tw = _to_world(espec)
            pos = tw[:3, 3]
            axis = tw[:3, 2] / np.linalg.norm(tw[:3, 2])
            cutoff = np.cos(np.deg2rad(float(espec.get("cutoff_angle", 20.0))))
            beam = np.cos(np.deg2rad(float(espec.get("beam_width", float(espec.get("cutoff_angle", 20.0)) * 0.75))))
            add_emitter(
                EmitterKind.SPOT, inten, position=pos, aux=axis,
                cutoff=(cutoff, beam),
                power=float(np.dot(inten, np.asarray(LUM_WEIGHTS))) * 2 * np.pi * (1 - cutoff),
            )
        else:
            raise ValueError(f"unknown emitter type {t}")

    if not em["kind"]:
        raise ValueError("scene has no emitters")

    catf = lambda a: np.concatenate(a, axis=0).astype(np.float32)
    h = {k: catf(v) for k, v in tris.items()}
    tri_mat_np = np.asarray(tri_mat, dtype=np.int32)
    tri_em_np = np.asarray(tri_emitter, dtype=np.int32)
    T = len(tri_mat_np)

    # packed shading rows (see Geometry.shade_packed layout)
    gn = np.cross(h["e1"], h["e2"])
    tri_area = 0.5 * np.linalg.norm(gn, axis=-1)
    gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    em_np = {k: np.asarray(v) for k, v in em.items()}
    has_em = tri_em_np >= 0
    eidx = np.maximum(tri_em_np, 0)
    tri_emission = np.where(
        has_em[:, None], np.stack(em_np["radiance"])[eidx] if len(em_np["radiance"]) else np.zeros((T, 3)), 0.0
    )
    shade = np.zeros((T, 32), dtype=np.float32)
    shade[:, 0:3] = gn
    shade[:, 3:6] = h["n0"]
    shade[:, 6:9] = h["n1"]
    shade[:, 9:12] = h["n2"]
    shade[:, 12:14] = h["uv0"]
    shade[:, 14:16] = h["uv1"]
    shade[:, 16:18] = h["uv2"]
    shade[:, 18] = tri_mat_np.astype(np.float32)
    shade[:, 19] = tri_em_np.astype(np.float32)
    shade[:, 20:23] = tri_emission
    shade[:, 25] = tri_area
    # per-triangle UV density (UV units per world unit) — the ray-cone
    # mip-level estimate (mipmap.h's ray differentials re-designed as
    # cone footprints) multiplies this by the texture resolution
    uv_e1 = h["uv1"] - h["uv0"]
    uv_e2 = h["uv2"] - h["uv0"]
    uv_area = 0.5 * np.abs(uv_e1[:, 0] * uv_e2[:, 1] - uv_e1[:, 1] * uv_e2[:, 0])
    shade[:, 26] = np.sqrt(uv_area / np.maximum(tri_area, 1e-20))
    shade[:, 27] = np.asarray(tri_sss, dtype=np.float32)  # sss row (-1 none)

    geo = Geometry(
        p0=jnp.asarray(h["p0"]), e1=jnp.asarray(h["e1"]), e2=jnp.asarray(h["e2"]),
        n0=jnp.asarray(h["n0"]), n1=jnp.asarray(h["n1"]), n2=jnp.asarray(h["n2"]),
        uv0=jnp.asarray(h["uv0"]), uv1=jnp.asarray(h["uv1"]), uv2=jnp.asarray(h["uv2"]),
        mat_id=jnp.asarray(tri_mat_np),
        emitter_id=jnp.asarray(tri_em_np),
        shade_packed=jnp.asarray(shade),
        vcol=jnp.asarray(np.concatenate(tri_vcol, axis=0)) if any_vcol else None,
    )

    p0h, e1h, e2h = h["p0"], h["e1"], h["e2"]
    bvh = build_bvh(p0h, e1h, e2h)
    # SAH-treelet block-list tables for scenes beyond the all-pairs
    # kernel's range (ops/intersect_blocklist.py; the TPU answer to
    # skdtree.h scaling)
    blocks = None
    pairs = None
    if T >= TWOLEVEL_MIN_TRIS:
        from mitsuba_path_guiding_tpu.accel.blocks import build_blocklist
        from mitsuba_path_guiding_tpu.accel.pairs import build_pair_table

        blocks = build_blocklist(p0h, e1h, e2h, bvh)
        # per-ray pair-expansion tables (round-3 hot path); the blocklist
        # kernel stays as the unproven-ray fallback
        pairs = build_pair_table(p0h, e1h, e2h, bvh)
    if bvh.max_depth + 2 > STACK_SIZE:
        raise ValueError(f"BVH depth {bvh.max_depth} exceeds traversal stack {STACK_SIZE}")

    M = len(mat_rows)
    mpk = np.zeros((M, 32), dtype=np.float32)
    mpk[:, 0] = [m["type"] for m in mat_rows]
    mpk[:, 1:4] = np.stack([m["reflectance"] for m in mat_rows])
    mpk[:, 4:7] = np.stack([m["specular"] for m in mat_rows])
    mpk[:, 7:10] = np.stack([m["eta"] for m in mat_rows])
    mpk[:, 10:13] = np.stack([m["k"] for m in mat_rows])
    mpk[:, 13] = [m["alpha"] for m in mat_rows]
    mpk[:, 14] = [m["texture_id"] for m in mat_rows]
    mpk[:, 15] = [m.get("alpha_v", m["alpha"]) for m in mat_rows]
    mpk[:, 16] = [m.get("sub_a", -1) for m in mat_rows]
    mpk[:, 17] = [m.get("sub_b", -1) for m in mat_rows]
    mpk[:, 18] = [m.get("weight", 0.0) for m in mat_rows]
    mpk[:, 19] = [m.get("bump_tex_id", -1) for m in mat_rows]
    mpk[:, 20] = [m.get("bump_scale", 1.0) for m in mat_rows]
    # wireframe texture parameters (texture_id == -4): edge color + width
    mpk[:, 21:24] = np.stack(
        [np.asarray(m.get("wire_edge", (0.0, 0.0, 0.0)), np.float32) for m in mat_rows]
    )
    mpk[:, 24] = [m.get("wire_lw", 0.0) for m in mat_rows]
    # UV tiling factors applied before atlas/normal-map fetches
    mpk[:, 25:27] = [m.get("uv_scale", (1.0, 1.0)) for m in mat_rows]
    # cloth geometry (scene/types.py CLOTH: w, l, areaW, areaF, fb_scale)
    mpk[:, 27:32] = [m.get("cloth_extra", (0.0,) * 5) for m in mat_rows]
    # rough-coating transmittance tables (reference data/microfacet
    # rtrans; roughcoating.cpp m_roughTransmittance): quadrature for
    # rough coat interfaces, exact smooth Fresnel otherwise
    from mitsuba_path_guiding_tpu.models.microfacet_tables import (
        N_COS,
        coat_transmittance_table,
    )
    from mitsuba_path_guiding_tpu.scene.types import BSDFType as _BT

    coat_tab = np.zeros((M, N_COS), np.float32)
    for i, m in enumerate(mat_rows):
        if m["type"] == _BT.COATING:
            coat_tab[i] = coat_transmittance_table(
                float(m.get("alpha", 0.0)), float(np.asarray(m["eta"]).ravel()[0])
            )

    mats = Materials(
        type=jnp.asarray(np.asarray([m["type"] for m in mat_rows], dtype=np.int32)),
        reflectance=jnp.asarray(np.stack([m["reflectance"] for m in mat_rows]).astype(np.float32)),
        specular=jnp.asarray(np.stack([m["specular"] for m in mat_rows]).astype(np.float32)),
        eta=jnp.asarray(np.stack([m["eta"] for m in mat_rows]).astype(np.float32)),
        k=jnp.asarray(np.stack([m["k"] for m in mat_rows]).astype(np.float32)),
        alpha=jnp.asarray(np.asarray([m["alpha"] for m in mat_rows], dtype=np.float32)),
        texture_id=jnp.asarray(np.asarray([m["texture_id"] for m in mat_rows], dtype=np.int32)),
        packed=jnp.asarray(mpk),
        coat_trans=jnp.asarray(coat_tab),
    )

    power = np.asarray(em["power"], dtype=np.float64)
    pmf = power / power.sum()
    cdf = np.cumsum(pmf)
    # per-triangle emitter pmf for MIS on emissive hits (shade row 23)
    shade[:, 23] = np.where(has_em, pmf[eidx].astype(np.float32), 0.0)
    geo = geo._replace(shade_packed=jnp.asarray(shade))

    # packed NEE table (Emitters.packed layout)
    E = len(em["kind"])
    epk = np.zeros((E, 32), dtype=np.float32)
    epk[:, 0] = np.asarray(em["kind"], dtype=np.float32)
    epk[:, 1] = pmf.astype(np.float32)
    epk[:, 2:5] = np.stack(em["radiance"]).astype(np.float32)
    epk[:, 5:8] = np.stack(em["position"]).astype(np.float32)
    epk[:, 8:11] = np.stack(em["aux"]).astype(np.float32)
    epk[:, 11:13] = np.stack(em["cutoff"]).astype(np.float32)
    epk[:, 13] = np.asarray(em["area"], dtype=np.float32)
    etri = np.asarray(em["tri"], dtype=np.int64)
    has_tri = etri >= 0
    ei = np.maximum(etri, 0)
    epk[:, 14:17] = np.where(has_tri[:, None], h["p0"][ei], 0.0)
    epk[:, 17:20] = np.where(has_tri[:, None], h["e1"][ei], 0.0)
    epk[:, 20:23] = np.where(has_tri[:, None], h["e2"][ei], 0.0)
    epk[:, 23:26] = np.where(has_tri[:, None], gn[ei], 0.0)
    from mitsuba_path_guiding_tpu.models.envmap import constant_env_tables

    if env_id >= 0 and env_kind == EmitterKind.ENVMAP:
        env_radiance = np.asarray(em["radiance"][env_id], dtype=np.float32)
        # for ENVMAP env_pdf stores the emitter-pick pmf; the directional
        # factor comes from env_pdf_tex (models/envmap.py)
        env_pdf = np.float32(pmf[env_id])
        tables = env_tables
    elif env_id >= 0:
        env_radiance = np.asarray(em["radiance"][env_id], dtype=np.float32)
        env_pdf = np.float32(pmf[env_id] / (4.0 * np.pi))
        tables = constant_env_tables(env_radiance)
    else:
        env_radiance = np.zeros(3, dtype=np.float32)
        env_pdf = np.float32(0.0)
        tables = constant_env_tables(env_radiance)
    emitters = Emitters(
        kind=jnp.asarray(np.asarray(em["kind"], dtype=np.int32)),
        tri=jnp.asarray(np.asarray(em["tri"], dtype=np.int32)),
        radiance=jnp.asarray(np.stack(em["radiance"]).astype(np.float32)),
        position=jnp.asarray(np.stack(em["position"]).astype(np.float32)),
        aux=jnp.asarray(np.stack(em["aux"]).astype(np.float32)),
        cutoff=jnp.asarray(np.stack(em["cutoff"]).astype(np.float32)),
        area=jnp.asarray(np.asarray(em["area"], dtype=np.float32)),
        pmf=jnp.asarray(pmf.astype(np.float32)),
        cdf=jnp.asarray(cdf.astype(np.float32)),
        env_radiance=jnp.asarray(env_radiance),
        env_pdf=jnp.asarray(env_pdf),
        packed=jnp.asarray(epk),
        **tables,
    )

    sspec = desc.get("sensor", {})
    skind = {
        "perspective": SensorKind.PERSPECTIVE,
        "thinlens": SensorKind.PERSPECTIVE,
        "perspective_rdist": SensorKind.PERSPECTIVE,
        "orthographic": SensorKind.ORTHOGRAPHIC,
        "spherical": SensorKind.SPHERICAL,
        "telecentric": SensorKind.TELECENTRIC,
        "irradiancemeter": SensorKind.IRRADIANCEMETER,
        "radiancemeter": SensorKind.RADIANCEMETER,
        "fluencemeter": SensorKind.FLUENCEMETER,
    }.get(sspec.get("type", "perspective"), SensorKind.PERSPECTIVE)
    fov = float(sspec.get("fov", 45.0))
    # fov is along the x (width) axis unless fov_axis says otherwise;
    # the y tan is filled in at render time from the aspect ratio.
    tan_half = np.tan(np.deg2rad(fov) / 2)
    if skind in (SensorKind.ORTHOGRAPHIC, SensorKind.TELECENTRIC):
        tan_half = float(sspec.get("ortho_width", 1.0))  # half-width
    kc = sspec.get("kc", None)  # perspective_rdist distortion polynomial
    # measurement constants (see models/sensor.py meter branches)
    meas = {SensorKind.IRRADIANCEMETER: np.pi, SensorKind.FLUENCEMETER: 4 * np.pi}
    sensor = Sensor(
        to_world=jnp.asarray(np.asarray(sspec.get("to_world", look_at([0, 0, -5], [0, 0, 0]))).astype(np.float32)),
        tan_half_fov_x=jnp.float32(tan_half),
        tan_half_fov_y=jnp.float32(tan_half),  # scaled by aspect in raygen
        aperture_radius=jnp.float32(sspec.get("aperture_radius", 0.0)),
        focus_distance=jnp.float32(sspec.get("focus_distance", 1.0)),
        near_clip=jnp.float32(sspec.get("near_clip", 1e-3)),
        kind=jnp.int32(skind),
        kc=None if kc is None else jnp.asarray(np.asarray(kc, dtype=np.float32)),
        meas_scale=(
            jnp.float32(meas[skind]) if skind in meas else None
        ),
    )

    medium = _compile_medium(desc.get("medium", None))

    v0 = p0h
    v1 = p0h + e1h
    v2 = p0h + e2h
    lo = np.minimum(np.minimum(v0, v1), v2).min(axis=0)
    hi = np.maximum(np.maximum(v0, v1), v2).max(axis=0)
    pad = 1e-3 * (hi - lo).max() + 1e-6
    from mitsuba_path_guiding_tpu.models.texture import build_atlas

    atlas, sizes = build_atlas(texture_images)
    return SceneData(
        geo=geo, bvh=bvh, mats=mats, emitters=emitters, sensor=sensor, medium=medium,
        aabb_min=jnp.asarray((lo - pad).astype(np.float32)),
        aabb_max=jnp.asarray((hi + pad).astype(np.float32)),
        textures=atlas,
        texture_sizes=sizes,
        sss_packed=(
            jnp.asarray(np.stack(sss_rows)) if sss_rows else None
        ),
        blocks=blocks,
        pairs=pairs,
    )
