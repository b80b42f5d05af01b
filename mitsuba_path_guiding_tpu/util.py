"""Utility launcher — the ``mtsutil`` equivalent.

Counterpart of /root/reference/src/mitsuba/mtsutil.cpp and the utility
plugins in src/utils/ (tonemap, addimages, joinrgb, scene info):

  python -m mitsuba_path_guiding_tpu.util tonemap in.exr out.png [--key K]
  python -m mitsuba_path_guiding_tpu.util addimages a.exr b.exr out.exr [-w WA WB]
  python -m mitsuba_path_guiding_tpu.util diff a.exr b.exr [-o diff.png]
  python -m mitsuba_path_guiding_tpu.util info scene.xml
  python -m mitsuba_path_guiding_tpu.util denoise in.exr albedo.npy normal.npy out.exr
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _read(path: str) -> np.ndarray:
    low = path.lower()
    if low.endswith(".npy"):
        return np.load(path)
    if low.endswith(".pfm"):
        from mitsuba_path_guiding_tpu.film.film import read_pfm

        return read_pfm(path)
    if low.endswith(".exr"):
        return _read_exr(path)
    raise ValueError(f"cannot read {path} (supported: npy, pfm, exr)")


def _read_exr(path: str) -> np.ndarray:
    """Full scanline EXR reader (NONE/RLE/ZIP/PIZ/PXR24, half/float,
    multichannel) — see film/exr.py."""
    from mitsuba_path_guiding_tpu.film.exr import read_exr_rgb

    return read_exr_rgb(path)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mitsuba_path_guiding_tpu.util")
    sub = ap.add_subparsers(dest="tool", required=True)

    t = sub.add_parser("tonemap")
    t.add_argument("input")
    t.add_argument("output")
    t.add_argument("--key", type=float, default=0.18)
    t.add_argument("--gamma-only", action="store_true")

    a = sub.add_parser("addimages")
    a.add_argument("a")
    a.add_argument("b")
    a.add_argument("output")
    a.add_argument("-w", "--weights", nargs=2, type=float, default=[0.5, 0.5])

    d = sub.add_parser("diff")
    d.add_argument("a")
    d.add_argument("b")
    d.add_argument("-o", "--output", default=None)

    i = sub.add_parser("info")
    i.add_argument("scene")

    dn = sub.add_parser("denoise")
    dn.add_argument("input")
    dn.add_argument("albedo")
    dn.add_argument("normal")
    dn.add_argument("output")

    j = sub.add_parser("joinrgb")  # utils/joinrgb.cpp
    j.add_argument("r")
    j.add_argument("g")
    j.add_argument("b")
    j.add_argument("output")

    s2o = sub.add_parser("scene2obj")  # utils/scene2obj.cpp
    s2o.add_argument("scene")
    s2o.add_argument("output")

    ser = sub.add_parser("serialized2obj")  # utils/serialized2obj.cpp
    ser.add_argument("input")
    ser.add_argument("output")
    ser.add_argument("--index", type=int, default=0)

    imp = sub.add_parser("import")  # converter/mtsimport.cpp (COLLADA/OBJ)
    imp.add_argument("input", help=".dae or .obj file")
    imp.add_argument("output", help="output .obj geometry dump")

    kb = sub.add_parser("kdbench")  # utils/kdbench.cpp (BVH here)
    kb.add_argument("mesh", help=".obj/.ply/.serialized mesh or scene .xml")
    kb.add_argument("-x", "--rays", type=int, default=1 << 20)

    args = ap.parse_args(argv)
    from mitsuba_path_guiding_tpu.film.film import write_image

    if args.tool == "tonemap":
        import jax.numpy as jnp

        from mitsuba_path_guiding_tpu.core.spectrum import reinhard_tonemap

        img = _read(args.input)
        if not args.gamma_only:
            img = np.asarray(reinhard_tonemap(jnp.asarray(img), key=args.key))
        write_image(args.output, np.clip(img, 0, 1))
        print(f"wrote {args.output}")

    elif args.tool == "addimages":
        a_img, b_img = _read(args.a), _read(args.b)
        wa, wb = args.weights
        write_image(args.output, wa * a_img + wb * b_img)
        print(f"wrote {args.output}")

    elif args.tool == "diff":
        a_img, b_img = _read(args.a), _read(args.b)
        err = a_img - b_img
        rmse = float(np.sqrt((err**2).mean()))
        rel_mse = float(((err**2) / (b_img**2 + 1e-2)).mean())
        print(f"RMSE: {rmse:.6f}  relMSE: {rel_mse:.6f}  "
              f"maxAbs: {float(np.abs(err).max()):.6f}")
        if args.output:
            write_image(args.output, np.abs(err))
            print(f"wrote {args.output}")
        return 0 if rmse < 1e30 else 1

    elif args.tool == "info":
        from mitsuba_path_guiding_tpu.scene.builder import build_scene
        from mitsuba_path_guiding_tpu.scene.xml_loader import load_scene_xml

        desc, settings = load_scene_xml(args.scene)
        sc = build_scene(desc)
        print(f"scene: {args.scene}")
        print(f"  triangles: {int(sc.geo.p0.shape[0])}")
        print(f"  materials: {int(sc.mats.type.shape[0])}")
        print(f"  emitters:  {int(sc.emitters.kind.shape[0])}")
        print(f"  bvh nodes: {int(sc.bvh.child0.shape[0])} (depth {sc.bvh.max_depth})")
        print(f"  settings:  {settings}")

    elif args.tool == "denoise":
        import jax.numpy as jnp

        from mitsuba_path_guiding_tpu.film.denoise import atrous_denoise

        img = _read(args.input)
        alb = _read(args.albedo)
        nrm = _read(args.normal)
        depth = jnp.ones(img.shape[:2])
        out = np.asarray(
            atrous_denoise(jnp.asarray(img), jnp.asarray(alb), jnp.asarray(nrm), depth)
        )
        write_image(args.output, out)
        print(f"wrote {args.output}")

    elif args.tool == "joinrgb":
        # merge three monochrome renders into one RGB image
        # (reference utils/joinrgb.cpp)
        r_img, g_img, b_img = _read(args.r), _read(args.g), _read(args.b)
        mono = lambda x: x.mean(axis=-1) if x.ndim == 3 else x
        out = np.stack([mono(r_img), mono(g_img), mono(b_img)], axis=-1)
        write_image(args.output, out)
        print(f"wrote {args.output}")

    elif args.tool == "scene2obj":
        # geometry dump of the compiled scene (reference utils/scene2obj.cpp)
        sc = _load_any_scene(args.scene)
        p0 = np.asarray(sc.geo.p0)
        p1 = p0 + np.asarray(sc.geo.e1)
        p2 = p0 + np.asarray(sc.geo.e2)
        _write_obj(args.output, p0, p1, p2)
        print(f"wrote {args.output} ({len(p0)} triangles)")

    elif args.tool == "serialized2obj":
        from mitsuba_path_guiding_tpu.scene.shapes import load_serialized

        mesh = load_serialized(args.input, args.index)
        with open(args.output, "w") as f:
            for v in mesh.vertices:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            if mesh.normals is not None:
                for n in mesh.normals:
                    f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
            for face in mesh.faces:
                i, jf, k = face + 1
                if mesh.normals is not None:
                    f.write(f"f {i}//{i} {jf}//{jf} {k}//{k}\n")
                else:
                    f.write(f"f {i} {jf} {k}\n")
        print(f"wrote {args.output} ({len(mesh.faces)} faces)")

    elif args.tool == "import":
        # COLLADA/OBJ import -> compiled scene -> geometry dump (the
        # reference mtsimport writes scene XML; geometry parity is the
        # load path, scene authoring stays in the dict/XML schema)
        sc = _load_any_scene(args.input)
        p0 = np.asarray(sc.geo.p0)
        _write_obj(args.output, p0, p0 + np.asarray(sc.geo.e1), p0 + np.asarray(sc.geo.e2))
        print(f"imported {args.input}: {len(p0)} triangles -> {args.output}")

    elif args.tool == "kdbench":
        # acceleration-structure benchmark (reference utils/kdbench.cpp:
        # build + traversal throughput on arbitrary geometry)
        import time as _time

        import jax
        import jax.numpy as jnp

        from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh

        sc = _load_any_scene(args.mesh)
        t0 = _time.time()
        from mitsuba_path_guiding_tpu.accel.bvh import build_bvh

        p0 = np.asarray(sc.geo.p0)
        bvh = build_bvh(p0, np.asarray(sc.geo.e1), np.asarray(sc.geo.e2))
        t_build = _time.time() - t0
        ntri = len(p0)
        print(f"BVH build: {ntri} tris in {t_build*1e3:.1f} ms "
              f"({ntri/max(t_build,1e-9)/1e6:.2f} Mtris/s), "
              f"{int(bvh.child0.shape[0])} nodes, depth {bvh.max_depth}")
        n = args.rays
        lo, hi = np.asarray(sc.aabb_min), np.asarray(sc.aabb_max)
        rs = np.random.default_rng(0)
        o = jnp.asarray(lo + rs.random((n, 3)) * (hi - lo), jnp.float32)
        d_np = rs.normal(size=(n, 3))
        d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True), jnp.float32)
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            from mitsuba_path_guiding_tpu.accel.traverse import intersect_pallas

            f = jax.jit(lambda o_, d_: intersect_pallas(sc.geo, o_, d_).t)
            name = "pallas tiled"
        else:
            f = jax.jit(lambda o_, d_: intersect_bvh(sc.geo, sc.bvh, o_, d_).t)
            name = "BVH"
        jax.block_until_ready(f(o, d))
        t0 = _time.time()
        reps = 5
        for _ in range(reps):
            out = f(o, d)
        jax.block_until_ready(out)
        dt = (_time.time() - t0) / reps
        print(f"{name} traversal: {n} rays in {dt*1e3:.2f} ms "
              f"-> {n/dt/1e6:.1f} Mrays/s")

    return 0


def _load_any_scene(path: str):
    """Scene XML or a bare mesh file -> compiled SceneData."""
    from mitsuba_path_guiding_tpu.scene.builder import build_scene

    low = path.lower()
    if low.endswith(".xml"):
        from mitsuba_path_guiding_tpu.scene.xml_loader import load_scene_xml

        desc, _ = load_scene_xml(path)
        return build_scene(desc)
    if low.endswith(".dae"):
        from mitsuba_path_guiding_tpu.scene.collada import load_dae

        desc = load_dae(path)
        if not desc.get("emitters"):
            desc["emitters"] = [{"type": "constant", "radiance": [1.0] * 3}]
        return build_scene(desc)
    kind = ("obj" if low.endswith(".obj") else
            "ply" if low.endswith(".ply") else
            "serialized" if low.endswith(".serialized") else None)
    if kind is None:
        raise ValueError(f"cannot load {path}")
    desc = {
        "sensor": {"type": "perspective"},
        "shapes": [{"type": kind, "filename": path,
                    "bsdf": {"type": "diffuse"}}],
        "emitters": [{"type": "constant", "radiance": [1.0] * 3}],
    }
    return build_scene(desc)


def _write_obj(path: str, p0, p1, p2):
    with open(path, "w") as f:
        for a, b, c in zip(p0, p1, p2):
            f.write(f"v {a[0]} {a[1]} {a[2]}\n")
            f.write(f"v {b[0]} {b[1]} {b[2]}\n")
            f.write(f"v {c[0]} {c[1]} {c[2]}\n")
        for i in range(len(p0)):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")


if __name__ == "__main__":
    sys.exit(main())
