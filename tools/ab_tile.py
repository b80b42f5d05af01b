import sys; sys.path.insert(0, ".")
import importlib
import mitsuba_path_guiding_tpu.ops.intersect_pairs as ip
import mitsuba_path_guiding_tpu.integrators.path as P
import logging; logging.disable(logging.WARNING)
eng = sys.argv[1]; tile = int(sys.argv[2])
ip.TILE = tile
P.PAIR_ENGINE = eng
from bench import _bench_big_scene
r = _bench_big_scene(print)
print(f"AB engine={eng} TILE={tile}: {r['big_scene_mrays']}")
