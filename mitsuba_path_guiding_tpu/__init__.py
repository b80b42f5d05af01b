"""mitsuba_path_guiding_tpu — a TPU-native, differentiable, path-guided renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``sherholz/mitsuba-path-guiding`` (Mitsuba 0.6 + path-guiding hooks):
progressive guided path tracing with spatio-directional vMF-mixture guiding
caches, surface + volumetric transport with NEE/MIS/RR, deterministic
per-pixel sampling, reconstruction-filter films, and multi-host sharded
rendering via ``jax.sharding`` meshes.

Architecture (TPU-first, not a port):
  - wavefront path tracing: fixed-capacity SoA ray populations advanced by a
    ``lax.scan`` bounce loop with alive masks (reference megakernel
    ``Li()`` recursion, e.g. /root/reference/src/integrators/path/path.cpp:119,
    becomes breadth-first stages),
  - scenes compile to flat arrays + small-enum dispatch (reference dlopen
    plugin registry, /root/reference/src/libcore/plugin.cpp:65-96, becomes
    registries of pure functions over pytrees),
  - the dynamic tile scheduler (/root/reference/src/libcore/sched.cpp)
    becomes static pixel/ray sharding over a device Mesh with psum merges.
"""

__version__ = "0.1.0"

from mitsuba_path_guiding_tpu.core import math as mmath  # noqa: F401
from mitsuba_path_guiding_tpu.core import rng, spectrum, warp  # noqa: F401
