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
    """Reader for the uncompressed scanline EXRs this package writes."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == bytes([0x76, 0x2F, 0x31, 0x01]), "not an EXR"
    off = 8
    channels = []
    w = h = None
    while True:
        end = data.index(b"\x00", off)
        name = data[off:end].decode()
        if not name:
            off = end + 1
            break
        off = end + 1
        end = data.index(b"\x00", off)
        typ = data[off:end].decode()
        off = end + 1
        (size,) = struct.unpack_from("<I", data, off)
        off += 4
        if name == "channels":
            coff = off
            while data[coff] != 0:
                cend = data.index(b"\x00", coff)
                channels.append(data[coff:cend].decode())
                coff = cend + 1 + 16
        elif name == "dataWindow":
            x0, y0, x1, y1 = struct.unpack_from("<iiii", data, off)
            w, h = x1 - x0 + 1, y1 - y0 + 1
        elif name == "compression":
            assert data[off] == 0, "only uncompressed EXR supported"
        off += size
    off += 8 * h  # skip offset table
    img = np.zeros((h, w, 3), dtype=np.float32)
    order = {c: i for i, c in enumerate(channels)}
    for _ in range(h):
        y, size = struct.unpack_from("<iI", data, off)
        off += 8
        row = np.frombuffer(data[off : off + size], dtype="<f4").reshape(len(channels), w)
        for c, idx in order.items():
            ch = {"R": 0, "G": 1, "B": 2}.get(c)
            if ch is not None:
                img[y, :, ch] = row[idx]
        off += size
    return img


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

    return 0


if __name__ == "__main__":
    sys.exit(main())
