"""Built-in test scenes mirroring the benchmark configs (BASELINE.md).

Cornell box geometry follows the classic Cornell data (the reference ships
equivalent scenes as XML under its test data); dimensions in meters-ish
units with the camera on -z looking at +z.
"""
from __future__ import annotations

import numpy as np

from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate, scale, translate


def cornell_box(light_scale: float = 1.0, box_material: str = "diffuse"):
    """The classic Cornell box: white floor/ceiling/back, red left, green
    right, two boxes, area light on the ceiling (BASELINE config 1/2)."""
    white = {"type": "diffuse", "reflectance": [0.725, 0.71, 0.68]}
    red = {"type": "diffuse", "reflectance": [0.63, 0.065, 0.05]}
    green = {"type": "diffuse", "reflectance": [0.14, 0.45, 0.091]}
    if box_material == "mirror":
        tall_mat = {"type": "conductor", "material": "none"}
    elif box_material == "glass":
        tall_mat = {"type": "dielectric", "int_ior": 1.5}
    else:
        tall_mat = white

    shapes = [
        # floor y=0 (normal +y): rectangle is z=0 plane, rotate -90 about x
        {"type": "rectangle", "to_world": translate(0, 0, 0) @ rotate([1, 0, 0], -90) @ scale(1.0), "bsdf": white},
        # ceiling y=2 (normal -y)
        {"type": "rectangle", "to_world": translate(0, 2, 0) @ rotate([1, 0, 0], 90) @ scale(1.0), "bsdf": white},
        # back wall z=1 (normal -z)
        {"type": "rectangle", "to_world": translate(0, 1, 1) @ rotate([1, 0, 0], 180) @ scale(1.0), "bsdf": white},
        # left wall x=-1 (normal +x)
        {"type": "rectangle", "to_world": translate(-1, 1, 0) @ rotate([0, 1, 0], 90) @ scale(1.0), "bsdf": red},
        # right wall x=1 (normal -x)
        {"type": "rectangle", "to_world": translate(1, 1, 0) @ rotate([0, 1, 0], -90) @ scale(1.0), "bsdf": green},
        # tall box
        {
            "type": "cube",
            "to_world": translate(-0.35, 0.6, 0.45) @ rotate([0, 1, 0], 20) @ scale(0.3, 0.6, 0.3),
            "bsdf": tall_mat,
        },
        # short box
        {
            "type": "cube",
            "to_world": translate(0.4, 0.3, -0.1) @ rotate([0, 1, 0], -18) @ scale(0.3, 0.3, 0.3),
            "bsdf": white,
        },
        # light (slightly below ceiling, facing down)
        {
            "type": "rectangle",
            "to_world": translate(0, 1.995, 0) @ rotate([1, 0, 0], 90) @ scale(0.25),
            "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
            "emitter": {"radiance": [17.0 * light_scale, 12.0 * light_scale, 4.0 * light_scale]},
        },
    ]
    return {
        "sensor": {
            "type": "perspective",
            "fov": 60.0,
            "to_world": look_at([0, 1.0, -3.2], [0, 1.0, 0]),
        },
        "shapes": shapes,
        "emitters": [],
    }


def door_room(target_tris: int = 250_000, ajar_deg: float = 60.0,
              light_scale: float = 6.0):
    """Veach-door-class benchmark scene (BASELINE config 3 family): a dark
    front room lit only through an ajar door to a bright back room, with a
    field of finely tessellated glossy spheres carrying the triangle
    budget.  Geometry is concentrated in few objects (the structure real
    production scenes have), unlike a uniform triangle soup.

    Round-4 recalibration: the original ajar=25deg gap + dim light made
    the front room mean radiance ~0.002 — transport so starved that any
    equal-spp comparison drowns in firefly statistics (MLT territory,
    not 8 spp).  ajar=60 + 6x light keeps the room lit ONLY through the
    door (indirect-dominated, the guiding-relevant structure) with
    convergent statistics."""
    import numpy as np

    white = {"type": "diffuse", "reflectance": [0.7, 0.7, 0.7]}
    glossy = {"type": "roughconductor", "alpha": 0.08,
              "eta": [0.2, 0.92, 1.1], "k": [3.9, 2.45, 2.14]}
    shapes = [
        # front room: x in [-3,3], y in [0,3] up, z in [-4,1]
        {"type": "rectangle", "to_world": translate(0, 0, -1.5) @ rotate([1, 0, 0], -90) @ scale(3, 2.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(0, 3, -1.5) @ rotate([1, 0, 0], 90) @ scale(3, 2.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(0, 1.5, -4) @ scale(3, 1.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(-3, 1.5, -1.5) @ rotate([0, 1, 0], 90) @ scale(2.5, 1.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(3, 1.5, -1.5) @ rotate([0, 1, 0], -90) @ scale(2.5, 1.5, 1), "bsdf": white},
        # dividing wall at z=1 with a door opening x in [-0.5, 0.5], y<2.2
        {"type": "rectangle", "to_world": translate(-1.75, 1.5, 1) @ rotate([0, 1, 0], 180) @ scale(1.25, 1.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(1.75, 1.5, 1) @ rotate([0, 1, 0], 180) @ scale(1.25, 1.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(0, 2.6, 1) @ rotate([0, 1, 0], 180) @ scale(0.5, 0.4, 1), "bsdf": white},
        # door panel, hinged at x=-0.5, ajar into the front room
        {"type": "cube",
         "to_world": translate(-0.5, 0, 1) @ rotate([0, 1, 0], -ajar_deg)
         @ translate(0.5, 1.1, 0) @ scale(0.5, 1.1, 0.02),
         "bsdf": {"type": "diffuse", "reflectance": [0.45, 0.3, 0.2]}},
        # bright back room z in [1, 4]
        {"type": "rectangle", "to_world": translate(0, 0, 2.5) @ rotate([1, 0, 0], -90) @ scale(3, 1.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(0, 1.5, 4) @ rotate([0, 1, 0], 180) @ scale(3, 1.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(-3, 1.5, 2.5) @ rotate([0, 1, 0], 90) @ scale(1.5, 1.5, 1), "bsdf": white},
        {"type": "rectangle", "to_world": translate(3, 1.5, 2.5) @ rotate([0, 1, 0], -90) @ scale(1.5, 1.5, 1), "bsdf": white},
        # area light on the back-room ceiling
        {"type": "rectangle", "to_world": translate(0, 2.98, 2.5) @ rotate([1, 0, 0], 90) @ scale(1.0, 1.0, 1),
         "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
         "emitter": {"radiance": [20.0 * light_scale, 18.0 * light_scale,
                                  15.0 * light_scale]}},
    ]
    # tessellated glossy spheres in the front room carry the budget
    n_spheres = 24
    per = max(target_tris // n_spheres, 128)
    res = max(int(np.sqrt(per / 4.0)), 8)  # tris ~ 2*res*(2*res)
    rs = np.random.default_rng(11)
    for i in range(n_spheres):
        gx = (i % 6 - 2.5) * 0.9
        gz = (i // 6) * 0.9 - 3.3
        r = 0.28 + 0.1 * rs.random()
        c = np.array([gx, r, gz]) + rs.normal(0, 0.05, 3) * np.array([1, 0, 1])
        shapes.append({
            "type": "sphere", "sphere_res": res,
            "to_world": translate(*c) @ scale(r),
            "bsdf": glossy if i % 3 else white,
        })
    return {
        "shapes": shapes,
        "sensor": {
            "type": "perspective", "fov": 55.0,
            "to_world": look_at([2.4, 1.5, -3.4], [-0.3, 1.2, 1.0], [0, 1, 0]),
        },
    }


def furnace(albedo=0.5, env_radiance=1.0):
    """White-furnace: a diffuse sphere in a constant environment.  Any
    unbiased integrator must return exactly ``env_radiance`` everywhere
    (energy conservation check, reference-style analytical validation)."""
    return {
        "sensor": {
            "type": "perspective",
            "fov": 45.0,
            "to_world": look_at([0, 0, -4], [0, 0, 0]),
        },
        "shapes": [
            {
                "type": "sphere",
                "center": [0, 0, 0],
                "radius": 1.0,
                "sphere_res": 48,
                "bsdf": {"type": "diffuse", "reflectance": [albedo] * 3},
            }
        ],
        "emitters": [{"type": "constant", "radiance": [env_radiance] * 3}],
    }


def veach_mis(width=512):
    """Veach MIS test: four glossy plates of increasing roughness under four
    area lights of decreasing size (BASELINE config 3 family)."""
    plates = []
    # plates tilted toward camera, varying GGX roughness
    for i, (z, y, a) in enumerate([(1.2, 0.0, 0.005), (0.9, 0.35, 0.02), (0.6, 0.7, 0.05), (0.3, 1.05, 0.1)]):
        plates.append(
            {
                "type": "rectangle",
                "to_world": translate(0, y, z) @ rotate([1, 0, 0], -60) @ scale(1.6, 0.16, 1.0),
                "bsdf": {"type": "roughconductor", "material": "Ag", "alpha": a},
            }
        )
    lights = []
    for x, r, p in [(-1.2, 0.02, 800.0), (-0.4, 0.06, 90.0), (0.4, 0.18, 10.0), (1.2, 0.54, 1.2)]:
        lights.append(
            {
                "type": "sphere",
                "center": [x, 2.2, 0.6],
                "radius": r,
                "sphere_res": 16,
                "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
                "emitter": {"radiance": [p, p, p]},
            }
        )
    floor = {
        "type": "rectangle",
        "to_world": translate(0, -0.35, 0.5) @ rotate([1, 0, 0], -90) @ scale(6, 6, 1),
        "bsdf": {"type": "diffuse", "reflectance": [0.35, 0.35, 0.35]},
    }
    return {
        "sensor": {
            "type": "perspective",
            "fov": 50.0,
            "to_world": look_at([0, 1.2, -3.8], [0, 0.8, 0.6]),
        },
        "shapes": plates + lights + [floor],
        "emitters": [],
    }


def volumetric_box(sigma_s=0.6, sigma_a=0.05, g=0.3, light_scale=1.0):
    """Cornell box filled with a homogeneous scattering medium
    (BASELINE config 4: guided distance + phase sampling)."""
    sc = cornell_box(light_scale=light_scale)
    sc["medium"] = {"sigma_s": [sigma_s] * 3, "sigma_a": [sigma_a] * 3, "g": g}
    return sc


def heterogeneous_box(sigma_s=0.8, sigma_a=0.1, g=0.0, light_scale=1.0, res=32):
    """Cornell box with a procedural heterogeneous density grid (a smooth
    spherical falloff cloud) — exercises the delta/ratio tracking kernels
    (reference heterogeneous.cpp + gridvolume.cpp; BASELINE config 4)."""
    import numpy as np

    sc = cornell_box(light_scale=light_scale)
    z, y, x = np.meshgrid(
        *(np.linspace(0, 1, res),) * 3, indexing="ij"
    )
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    dens = np.clip(1.0 - 2.0 * r, 0.0, 1.0) ** 2
    sc["medium"] = {
        "sigma_s": [sigma_s] * 3,
        "sigma_a": [sigma_a] * 3,
        "g": g,
        "density": dens.astype(np.float32),
        "bounds": ((-0.8, 0.2, -0.8), (0.8, 1.8, 0.8)),
    }
    return sc


def bounce_lamp_room(light_scale: float = 30.0):
    """Indirect-only guiding showcase (the 'torchiere lamp' setup of the
    path-guiding literature): a Cornell-class room whose only emitter is
    an upward-facing panel under the ceiling — every camera path needs a
    ceiling bounce, NEE at the first vertex fails (the panel emits away
    from the room), and the incident radiance at the floor concentrates
    on the bright ceiling disk that cosine sampling wastes samples
    missing.  Statistics stay bounded (area source, short paths) —
    unlike a Veach door at low spp."""
    white = {"type": "diffuse", "reflectance": [0.73, 0.73, 0.73]}
    red = {"type": "diffuse", "reflectance": [0.63, 0.065, 0.05]}
    green = {"type": "diffuse", "reflectance": [0.14, 0.45, 0.09]}
    s = 2.0
    shapes = [
        {"type": "rectangle", "to_world": translate(0, 0, 0) @ rotate([1, 0, 0], -90) @ scale(s), "bsdf": white},
        {"type": "rectangle", "to_world": translate(0, 2 * s, 0) @ rotate([1, 0, 0], 90) @ scale(s), "bsdf": white},
        {"type": "rectangle", "to_world": translate(0, s, s) @ rotate([0, 1, 0], 180) @ scale(s), "bsdf": white},
        {"type": "rectangle", "to_world": translate(-s, s, 0) @ rotate([0, 1, 0], 90) @ scale(s), "bsdf": red},
        {"type": "rectangle", "to_world": translate(s, s, 0) @ rotate([0, 1, 0], -90) @ scale(s), "bsdf": green},
        # upward-facing lamp panel at mid height, off to one side
        {"type": "rectangle",
         "to_world": translate(1.2, 2.6, 0.8) @ rotate([1, 0, 0], -90)
         @ scale(0.35),
         "bsdf": {"type": "diffuse", "reflectance": [0.0] * 3},
         "emitter": {"radiance": [light_scale] * 3}},
    ]
    return {
        "shapes": shapes,
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": look_at([0, 2.0, -1.9 * s], [0, 1.6, 0],
                                       [0, 1, 0])},
    }
