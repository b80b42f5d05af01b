"""Command-line renderer — the ``mitsuba`` CLI equivalent.

Counterpart of /root/reference/src/mitsuba/mitsuba.cpp:52-477: loads a scene
(Mitsuba XML subset or a named built-in), renders with the progressive
guided integrator, and writes the image.  Flags mirror the reference where
they make sense on one process group:

  python -m mitsuba_path_guiding_tpu.render scene.xml -o out.exr
  python -m mitsuba_path_guiding_tpu.render cornell -o out.png -s 64 -g

  -o FILE      output (exr/png/pfm/npy; default <scene>.exr)
  -D key=val   $var define passed to the XML loader (mitsuba.cpp:60)
  -s N         samples per pixel override
  -d N         max path depth override
  -r WxH       resolution override
  -g / -G      enable / disable path guiding (default: on)
  -p N         progressive pass size (samples per progression)
  -t SEC       time budget (reference maxRenderTime)
  -c FILE      checkpoint file: resume if it exists, save on exit (-x skip
               if output exists, mitsuba.cpp:78)
  -x           skip rendering if the output file already exists
  -q           quiet
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mitsuba_path_guiding_tpu.render")
    ap.add_argument("scene", help="scene XML path or built-in name (cornell, furnace, veach, volbox)")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("-D", "--define", action="append", default=[])
    ap.add_argument("-s", "--spp", type=int, default=None)
    ap.add_argument("-d", "--depth", type=int, default=None)
    ap.add_argument("-r", "--resolution", default=None)
    ap.add_argument("-g", "--guide", dest="guide", action="store_true", default=True)
    ap.add_argument("-G", "--no-guide", dest="guide", action="store_false")
    ap.add_argument("-p", "--pass-size", type=int, default=4)
    ap.add_argument("-t", "--time-budget", type=float, default=0.0)
    ap.add_argument("-c", "--checkpoint", default=None)
    ap.add_argument("-x", "--skip-existing", action="store_true")
    ap.add_argument("-q", "--quiet", action="store_true")
    ap.add_argument(
        "-I", "--integrator", default="guided",
        choices=["guided", "path", "bdpt", "pssmlt", "mlt", "erpt", "sppm",
                 "vpl", "ptracer", "photonmapper", "direct", "ao"],
        help="rendering algorithm (reference: integrator element in the XML; "
        "'guided' is the progressive guided path tracer)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nee", dest="nee", action="store_true", default=True)
    ap.add_argument("--no-nee", dest="nee", action="store_false")
    ap.add_argument("--denoise", action="store_true")
    ap.add_argument("--aovs", action="store_true", help="also write albedo/normal/depth AOVs")
    ap.add_argument(
        "--preview", type=int, default=None, metavar="PORT",
        help="serve a live progressive preview at http://127.0.0.1:PORT "
        "(the mtsgui-analogue; 0 picks a free port)",
    )
    ap.add_argument(
        "-v", "--verbose", action="count", default=0,
        help="-v debug, -vv trace log level (reference mitsuba.cpp -v)",
    )
    args = ap.parse_args(argv)

    log = (lambda *a: None) if args.quiet else (lambda *a: print(*a, file=sys.stderr, flush=True))

    from mitsuba_path_guiding_tpu.utils import logger as mlog

    mlog.set_log_level(
        mlog.EWarn if args.quiet
        else (mlog.ETrace if args.verbose >= 2
              else mlog.EDebug if args.verbose == 1 else mlog.EInfo)
    )

    from mitsuba_path_guiding_tpu.scene import scenes as builtin
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig

    defaults = dict(kv.split("=", 1) for kv in args.define)
    builtins = {
        "cornell": builtin.cornell_box,
        "furnace": builtin.furnace,
        "veach": builtin.veach_mis,
        "volbox": builtin.volumetric_box,
    }
    settings = {"width": 256, "height": 256, "spp": 16, "max_depth": 5, "rr_depth": 5}
    if args.scene in builtins:
        desc = builtins[args.scene]()
        scene_name = args.scene
    else:
        from mitsuba_path_guiding_tpu.scene.xml_loader import load_scene_xml

        desc, settings = load_scene_xml(args.scene, defaults)
        scene_name = os.path.splitext(os.path.basename(args.scene))[0]

    out = args.output or f"{scene_name}.exr"
    if args.skip_existing and os.path.exists(out):
        log(f"skipping: {out} exists (-x)")
        return 0

    spp = args.spp or settings["spp"]
    width, height = settings["width"], settings["height"]
    if args.resolution:
        width, height = (int(x) for x in args.resolution.lower().split("x"))
    max_depth = args.depth or settings["max_depth"]

    log(f"scene: {scene_name}  {width}x{height}@{spp}spp depth={max_depth} "
        f"guiding={'on' if args.guide else 'off'}")
    t0 = time.time()
    scene = build_scene(desc)
    log(f"scene compiled in {time.time() - t0:.1f}s: "
        f"{int(scene.geo.p0.shape[0])} triangles, "
        f"{int(scene.emitters.kind.shape[0])} emitters")

    if args.integrator != "guided":
        # one-shot integrators (reference: the scene's integrator plugin)
        rcfg = RenderConfig(
            width=width, height=height, spp=spp, max_depth=max_depth,
            rr_depth=settings.get("rr_depth", 5), seed=args.seed,
            use_nee=args.nee,
        )
        t0 = time.time()
        if args.integrator == "path":
            from mitsuba_path_guiding_tpu.integrators.render import render as _r
            img = _r(scene, rcfg)
        elif args.integrator == "bdpt":
            from mitsuba_path_guiding_tpu.integrators.bdpt import render_bdpt
            img = render_bdpt(scene, rcfg)
        elif args.integrator == "pssmlt":
            from mitsuba_path_guiding_tpu.integrators.pssmlt import render_pssmlt
            img = render_pssmlt(scene, rcfg)
        elif args.integrator == "mlt":
            from mitsuba_path_guiding_tpu.integrators.mlt import render_mlt
            img = render_mlt(scene, rcfg)
        elif args.integrator == "erpt":
            from mitsuba_path_guiding_tpu.integrators.erpt import render_erpt
            img = render_erpt(scene, rcfg)
        elif args.integrator == "sppm":
            from mitsuba_path_guiding_tpu.integrators.sppm import render_sppm
            img = render_sppm(scene, rcfg)
        elif args.integrator == "photonmapper":
            from mitsuba_path_guiding_tpu.integrators.photonmapper import render_photonmapper
            img = render_photonmapper(scene, rcfg)
        elif args.integrator == "vpl":
            from mitsuba_path_guiding_tpu.integrators.vpl import render_vpl
            img = render_vpl(scene, rcfg)
        elif args.integrator == "ptracer":
            from mitsuba_path_guiding_tpu.integrators.ptracer import render_ptracer
            img = render_ptracer(scene, rcfg)
        elif args.integrator == "direct":
            from mitsuba_path_guiding_tpu.integrators.aux_integrators import render_direct
            img = render_direct(scene, rcfg)
        else:  # ao
            from mitsuba_path_guiding_tpu.integrators.aux_integrators import render_ao
            img = render_ao(scene, rcfg)
        log(f"render time ({args.integrator}): {time.time() - t0:.1f}s")
        import numpy as np

        from mitsuba_path_guiding_tpu.film.film import write_image

        img_np = np.asarray(img)
        write_image(out, img_np)
        log(f"wrote {out}  (mean {img_np.mean():.4f})")
        return 0

    from mitsuba_path_guiding_tpu.integrators.progressive import (
        ProgressiveConfig,
        ProgressiveRenderer,
    )

    rcfg = RenderConfig(
        width=width, height=height, spp=0, max_depth=max_depth,
        rr_depth=settings.get("rr_depth", 5), seed=args.seed, use_nee=args.nee,
    )
    n_prog = max(1, (spp + args.pass_size - 1) // args.pass_size)
    pcfg = ProgressiveConfig(
        render=rcfg,
        samples_per_progression=min(args.pass_size, spp),
        n_progressions=n_prog,
        max_seconds=args.time_budget,
        guiding=args.guide,
    )
    preview_srv = None
    if args.preview is not None:
        from mitsuba_path_guiding_tpu.utils.logger import RenderQueue
        from mitsuba_path_guiding_tpu.utils.preview import PreviewServer

        preview_srv = PreviewServer(port=args.preview)
        pcfg.queue = RenderQueue(listeners=[preview_srv])
        log(f"live preview at http://127.0.0.1:{preview_srv.port}")

    renderer = ProgressiveRenderer(scene, pcfg)
    if args.checkpoint and os.path.exists(args.checkpoint):
        from mitsuba_path_guiding_tpu.utils.checkpoint import load_renderer_state

        load_renderer_state(renderer, args.checkpoint)
        log(f"resumed from {args.checkpoint} at {renderer.sample_counter} spp")

    t0 = time.time()
    last = [t0]

    def progress(r):
        now = time.time()
        log(
            f"progression {r.progression}/{n_prog}: {r.sample_counter} spp, "
            f"{now - last[0]:.1f}s"
        )
        last[0] = now

    renderer.cfg.on_postprogression = progress
    img = renderer.render()
    log(f"render time: {time.time() - t0:.1f}s")
    log(renderer.stats.report())

    if args.checkpoint:
        from mitsuba_path_guiding_tpu.utils.checkpoint import save_renderer_state

        save_renderer_state(renderer, args.checkpoint)
        log(f"checkpoint written to {args.checkpoint}")

    import numpy as np

    from mitsuba_path_guiding_tpu.film.film import write_image

    img_np = np.asarray(img)
    if args.denoise:
        from mitsuba_path_guiding_tpu.film.denoise import denoise_with_aux

        img_np, aux = denoise_with_aux(renderer, img_np)
        log("denoised")
    write_image(out, img_np)
    log(f"wrote {out}  (mean {img_np.mean():.4f})")

    if args.aovs:
        from mitsuba_path_guiding_tpu.film.denoise import render_aovs

        aovs = render_aovs(renderer)
        stem = os.path.splitext(out)[0]
        for name, buf in aovs.items():
            write_image(f"{stem}_{name}.npy", np.asarray(buf))
        log(f"wrote AOVs: {', '.join(aovs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
