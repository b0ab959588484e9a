"""Rendered-RGB parity: JAX renderer vs the float64 NumPy oracle
(SURVEY.md section 4, test strategy item 1)."""
import dataclasses

import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.core.renderer import render_image
from ray_tracer_fragment_shader_tpu.oracle import oracle_render
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 48


def _compare(name, size=SIZE, atol=2e-3, frac_budget=0.001, **kwargs):
    scene, cam, cfg = presets.PRESETS[name](size=size, **kwargs)
    img = np.asarray(render_image(scene, cam, cfg))
    ora = oracle_render(scene, cam, cfg)
    d = np.abs(img - ora).max(-1)
    # f32-vs-f64 silhouette pixels may disagree on hit/miss; bound their count
    frac_bad = (d > atol).mean()
    assert frac_bad <= frac_budget, (
        f"{name}: {frac_bad:.4f} of pixels differ by more than {atol}"
        f" (max {d.max():.4g})")
    assert img.mean() == pytest.approx(ora.mean(), rel=0.02)
    return img, ora


def test_single_sphere_primary():
    _compare("single_sphere")


def test_three_spheres_shadows():
    _compare("three_spheres_ground")


def test_full_reflective_depth2():
    _compare("full_reflective")


def test_fit_target_depth1():
    _compare("fit_target")


def test_procedural_spheres_small():
    _compare("procedural_spheres", n=16, depth=2, frac_budget=0.002)


def test_reference_demo_transmission():
    """The canonical demo scene with the transparent tetrahedron exercises
    transmitted rays (chain mode handles it: all-ones transparency)."""
    scene, cam, cfg = presets.reference_demo()
    cfg = dataclasses.replace(cfg, width=SIZE, height=SIZE, samples=1,
                              max_depth=3)
    img = np.asarray(render_image(scene, cam, cfg))
    ora = oracle_render(scene, cam, cfg)
    d = np.abs(img - ora).max(-1)
    assert (d > 2e-3).mean() <= 0.001
    assert img.mean() > 0.01  # non-trivial image


def test_prune_matches_noprune_on_wellformed_scene():
    """For geometry fully inside its bounding spheres the prune is a pure
    optimization; images must agree."""
    scene, cam, cfg = presets.full_reflective(size=SIZE)
    a = np.asarray(render_image(scene, cam, dataclasses.replace(cfg, prune=True)))
    b = np.asarray(render_image(scene, cam, dataclasses.replace(cfg, prune=False)))
    assert np.abs(a - b).max() < 1e-5


def test_tree_mode_parity_fractional_transparency():
    """Fractional transparency forces the full binary bounce tree; compare
    against the oracle's literal recursion."""
    from ray_tracer_fragment_shader_tpu.scene import Material, SceneBuilder
    from ray_tracer_fragment_shader_tpu.config import CameraConfig, RenderConfig
    glass = Material(ambient=(0.02, 0.02, 0.02), diffuse=(0.1, 0.1, 0.1),
                     specular=(0.3, 0.3, 0.3), transparency=(0.5, 0.5, 0.5),
                     refraction=0.9)
    scene = (SceneBuilder()
             .add_checkerboard()
             .add_sphere("d4", radius=60.0, material=glass)
             .add_light("b6")
             .build())
    assert not scene.chain_exact
    cam = CameraConfig(pixel_scale=512.0 / SIZE)
    cfg = RenderConfig(width=SIZE, height=SIZE, max_depth=2, samples=1)
    img = np.asarray(render_image(scene, cam, cfg))
    ora = oracle_render(scene, cam, cfg)
    d = np.abs(img - ora).max(-1)
    assert (d > 2e-3).mean() <= 0.002
