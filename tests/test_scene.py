"""Scene construction: board coordinates, builder flattening, materials."""
import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.config import (BOARD_POSITION,
                                                   SQUARE_EDGE_SIZE)
from ray_tracer_fragment_shader_tpu.scene import (Material, SceneBuilder,
                                                  convert_board_coordinate)
from ray_tracer_fragment_shader_tpu.scene import primitives as prim


def test_board_coordinate_reference_values():
    # convertStringCoordinate (MySdlApplication.cpp:1326-1346):
    # firstSquare (-160,0,160), row letter -> -z, column digit -> +x,
    # +1.5 squares of height.
    p = convert_board_coordinate("a1")
    np.testing.assert_allclose(p, [-160 + 20, 60, 160 - 20])
    p = convert_board_coordinate("b4")
    np.testing.assert_allclose(p, [-160 + 3.5 * 40, 60, 160 - 1.5 * 40])
    p = convert_board_coordinate("h8")
    np.testing.assert_allclose(p, [160 - 20, 60, -160 + 20])


def test_board_coordinate_rejects_bad_input():
    with pytest.raises(ValueError):
        convert_board_coordinate("b42")


def test_demo_scene_counts():
    b = (SceneBuilder().add_checkerboard().add_light("b6")
         .add_tetrahedron("b4").add_sphere("d7").add_cube("a7"))
    scene = b.build()
    # 2 checker + 4 tetra + 12 cube triangles
    assert int(np.sum(np.asarray(scene.tri_valid))) == 18
    assert int(np.sum(np.asarray(scene.sph_valid))) == 1
    # scene group + tetra group + cube group
    assert scene.num_groups == 3
    assert scene.num_lights == 1
    # scene bounding sphere = sqrt(3)*board_half at board position (g_scene)
    np.testing.assert_allclose(np.asarray(scene.grp_center)[0], BOARD_POSITION)
    np.testing.assert_allclose(np.asarray(scene.grp_radius)[0],
                               np.sqrt(3) * 160, rtol=1e-6)


def test_light_height_rule():
    # loadScene: light = BOARD_POSITION + (0, 3.5*sq, 0) + coord
    # (MySdlApplication.cpp:1511); coord already has +1.5*sq.
    scene = SceneBuilder().add_light("b6").build()
    lp = np.asarray(scene.light_pos)[0]
    assert lp[1] == pytest.approx(1.5 * SQUARE_EDGE_SIZE + 3.5 * SQUARE_EDGE_SIZE)


def test_material_dedup_and_checker_rows():
    b = SceneBuilder()
    m = Material(diffuse=(0.5, 0.5, 0.5))
    i1 = b.material_id(m)
    i2 = b.material_id(Material(diffuse=(0.5, 0.5, 0.5)))
    assert i1 == i2
    scene = b.add_checkerboard().build()
    assert scene.checker_mats == (0, 1)
    # row 0 = white square, row 1 = black square (:583-585)
    np.testing.assert_allclose(np.asarray(scene.mat_diffuse)[0], [0.5] * 3)
    np.testing.assert_allclose(np.asarray(scene.mat_diffuse)[1], [0.1] * 3)


def test_board_map_dedup_and_order():
    # map<string,int> semantics: one object per coordinate, sorted iteration.
    scene = (SceneBuilder()
             .load_board_map({"d7": "sphere", "b4": "tetrahedron",
                              "a7": "cube", "b6": "light"})
             .build())
    assert int(np.sum(np.asarray(scene.sph_valid))) == 1
    assert int(np.sum(np.asarray(scene.tri_valid))) == 16  # tetra 4 + cube 12
    assert scene.num_lights == 1


def test_cylinder_reference_is_invisible():
    # Cylinder::intersection is an empty override (:1000-1020).
    assert prim.cylinder((0, 0, 0), 20, 20, style="reference") == []
    fixed = prim.cylinder((0, 0, 0), 20, 20, style="fixed")
    assert len(fixed) == 2 * 8 + 2 * 10  # caps fans + side quads


def test_cone_triangle_count():
    tris = prim.cone((0, 0, 0), 20, 20, style="reference")
    assert len(tris) == 8 + 10  # base fan + side fan
    # apex is at the cone's position (the -top shift cancels, :1040+1059)
    apex = tris[-1][2]
    np.testing.assert_allclose(apex, [0, 0, 0], atol=1e-12)


def test_chain_exact_flags():
    s1 = SceneBuilder().add_sphere("a1").build()
    assert s1.chain_exact and not s1.has_transmission
    s2 = SceneBuilder().add_tetrahedron("a1").build()
    assert s2.chain_exact and s2.has_transmission
    s3 = (SceneBuilder()
          .add_sphere("a1", material=Material(transparency=(0.5, 0.5, 0.5)))
          .build())
    assert not s3.chain_exact and s3.has_transmission


def test_scene_radius_modes():
    auto = SceneBuilder(scene_radius=None).add_sphere("a1", radius=10).build()
    r = float(np.asarray(auto.grp_radius)[0])
    center = np.asarray(auto.sph_center)[0]
    dist = np.linalg.norm(center - np.asarray(auto.board_pos))
    assert r >= dist + 10
    explicit = SceneBuilder(scene_radius=999.0).add_sphere("a1").build()
    assert float(np.asarray(explicit.grp_radius)[0]) == pytest.approx(999.0)
