import sys; sys.path.insert(0, ".")
import numpy as np
from mitsuba_path_guiding_tpu.integrators.irrcache import build_irradiance_cache
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
sys.path.insert(0, 'tests')
from test_irrcache import _record_E_at

cornell = build_scene(cornell_box())
cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4, seed=2)
cache = build_irradiance_cache(cornell, cfg, n_records=256, rays_per_record=256)
pos = np.asarray(cache.pos); nrm = np.asarray(cache.normal); ok = np.asarray(cache.valid)
floor = ok & (nrm[:, 1] > 0.99) & (np.abs(pos[:, 0]) < 0.5) & (np.abs(pos[:, 2]) < 0.5) & (pos[:, 1] < 0.01)
idx = np.where(floor)[0][:6]
h = 0.15
for i in idx:
    g = np.asarray(cache.grad_t)[i]
    for tang in ([1.0,0,0],[0,0,1.0]):
        t = np.asarray(tang)
        pts = np.stack([pos[i] + h*t, pos[i] - h*t])
        nss = np.stack([nrm[i], nrm[i]])
        Epm = _record_E_at(cornell, pts, nss, cfg, rays=16384)
        dnum = (Epm[0]-Epm[1]).mean()/(2*h)
        dpred = (t @ g).mean()
        print(f"rec {i} tang {tang}: dnum={dnum:+.4f} dpred={dpred:+.4f}")
