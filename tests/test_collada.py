"""COLLADA importer (reference src/converter/collada.cpp mtsimport)."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.collada import load_dae
from mitsuba_path_guiding_tpu.scene.transforms import look_at

DAE = '''<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <asset><up_axis>{up}</up_axis></asset>
 <library_effects>
  <effect id="redfx"><profile_COMMON><technique sid="c"><lambert>
   <diffuse><color>0.8 0.1 0.1 1</color></diffuse></lambert></technique></profile_COMMON></effect>
 </library_effects>
 <library_materials>
  <material id="redmat"><instance_effect url="#redfx"/></material>
 </library_materials>
 <library_geometries>
  <geometry id="quad"><mesh>
   <source id="pos"><float_array id="pa" count="12">-1 -1 0 1 -1 0 1 1 0 -1 1 0</float_array>
    <technique_common><accessor source="#pa" count="4" stride="3"/></technique_common></source>
   <vertices id="vv"><input semantic="POSITION" source="#pos"/></vertices>
   <triangles material="m0" count="2">
    <input semantic="VERTEX" source="#vv" offset="0"/>
    <p>0 1 2 0 2 3</p>
   </triangles>
  </mesh></geometry>
 </library_geometries>
 <library_visual_scenes>
  <visual_scene id="scene">
   <node><translate>0 0 1</translate>
    <instance_geometry url="#quad">
     <bind_material><technique_common>
      <instance_material symbol="m0" target="#redmat"/>
     </technique_common></bind_material>
    </instance_geometry>
   </node>
  </visual_scene>
 </library_visual_scenes>
</COLLADA>'''


def test_dae_geometry_materials_render(tmp_path):
    f = tmp_path / "s.dae"
    f.write_text(DAE.format(up="Y_UP"))
    desc = load_dae(str(f))
    assert len(desc["shapes"]) == 1
    sh = desc["shapes"][0]
    assert sh["faces"].shape == (2, 3)
    np.testing.assert_allclose(sh["bsdf"]["reflectance"], [0.8, 0.1, 0.1])
    desc["sensor"] = {"type": "orthographic", "to_world": look_at([0, 0, -3], [0, 0, 1])}
    desc["emitters"] = [{"type": "constant", "radiance": [1.0] * 3}]
    img = np.asarray(render(build_scene(desc), RenderConfig(width=16, height=16, spp=8, max_depth=2)))
    assert np.isfinite(img).all()
    assert img[8, 8, 0] > 1.5 * img[8, 8, 2]  # the quad is red


def test_dae_z_up_conversion(tmp_path):
    """Z_UP assets rotate into the Y-up convention (collada.cpp fix)."""
    f = tmp_path / "z.dae"
    f.write_text(DAE.format(up="Z_UP"))
    desc = load_dae(str(f))
    from mitsuba_path_guiding_tpu.scene.transforms import apply_points

    v = apply_points(desc["shapes"][0]["to_world"], desc["shapes"][0]["vertices"])
    # the z=+1 offset becomes y=+1; the quad lies in the XZ plane
    np.testing.assert_allclose(v[:, 1], 1.0, atol=1e-6)
