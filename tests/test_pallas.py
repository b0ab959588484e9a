"""Pallas kernel parity vs the core renderer (interpreter mode on CPU)."""
import dataclasses

import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.core.renderer import render_image
from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
    pack_scene, render_image_pallas)
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 32


def _compare(name, frac_budget=0.01, **kwargs):
    scene, cam, cfg = presets.PRESETS[name](size=SIZE, **kwargs)
    a = np.asarray(render_image(scene, cam, cfg))
    b = np.asarray(render_image_pallas(scene, cam, cfg, block_h=8,
                                       block_w=128))
    d = np.abs(a - b).max(-1)
    # budget for decision-boundary pixels (horizon-row checker parity etc.)
    assert (d > 1e-3).mean() <= frac_budget, (
        f"{name}: {(d > 1e-3).mean():.4f} mismatching, max {d.max():.3g}")
    assert a.mean() == pytest.approx(b.mean(), rel=0.05)


def test_single_sphere():
    _compare("single_sphere", frac_budget=0.0)


def test_three_spheres_shadows():
    _compare("three_spheres_ground")


def test_full_reflective_bounces():
    _compare("full_reflective")


def test_reference_demo_transmission_chain():
    scene, cam, cfg = presets.reference_demo()
    cfg = dataclasses.replace(cfg, width=SIZE, height=SIZE, samples=1,
                              max_depth=3)
    a = np.asarray(render_image(scene, cam, cfg))
    b = np.asarray(render_image_pallas(scene, cam, cfg, block_h=8,
                                       block_w=128))
    d = np.abs(a - b).max(-1)
    # the demo's 1:1 pixel scale puts a whole image row on the board-plane
    # horizon where checker parity is decision-boundary noise
    assert (d > 1e-3).mean() <= 0.02


def test_nonsquare_padding():
    scene, cam, cfg = presets.single_sphere(size=SIZE)
    cfg = dataclasses.replace(cfg, width=48, height=24)
    a = np.asarray(render_image(scene, cam, cfg))
    b = np.asarray(render_image_pallas(scene, cam, cfg, block_h=8,
                                       block_w=128))
    assert b.shape == (24, 48, 3)
    assert np.abs(a - b).max() < 1e-3


def test_supersampling_matches_core():
    scene, cam, cfg = presets.single_sphere(size=16)
    cfg = dataclasses.replace(cfg, samples=4)
    a = np.asarray(render_image(scene, cam, cfg))
    b = np.asarray(render_image_pallas(scene, cam, cfg, block_h=8,
                                       block_w=128))
    # same PRNG keys and jitter distribution -> identical sample sets
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_rejects_fractional_transparency():
    from ray_tracer_fragment_shader_tpu.scene import Material, SceneBuilder
    from ray_tracer_fragment_shader_tpu.config import CameraConfig, RenderConfig
    scene = (SceneBuilder()
             .add_sphere("d4", material=Material(transparency=(0.5, 0.5, 0.5)))
             .add_light("b6").build())
    with pytest.raises(ValueError):
        render_image_pallas(scene, CameraConfig(), RenderConfig(width=16, height=16))


def test_pack_scene_compacts_padding():
    scene, _, _ = presets.full_reflective(size=16)
    packed = pack_scene(scene)
    assert packed["tri"].shape[0] == int(np.asarray(scene.tri_valid).sum())
    assert packed["sph"].shape[0] == int(np.asarray(scene.sph_valid).sum())
