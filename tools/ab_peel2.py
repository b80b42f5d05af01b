import sys; sys.path.insert(0, ".")
import logging; logging.disable(logging.WARNING)
import mitsuba_path_guiding_tpu.integrators.path as P
P.PAIR_PEEL = True
from bench import _bench_big_scene
r = _bench_big_scene(print)
print(f"AB peel+cap: {r['big_scene_mrays']}")
