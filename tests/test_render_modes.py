"""Renderer-mode consistency: chain vs tree, chunking, jit, supersampling."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.core.renderer import (render_image,
                                                          render_image_jit)
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 48


def test_chain_equals_tree_on_chain_exact_scene():
    scene, cam, cfg = presets.full_reflective(size=SIZE)
    assert scene.chain_exact
    a = np.asarray(render_image(scene, cam, dataclasses.replace(cfg, mode="chain")))
    b = np.asarray(render_image(scene, cam, dataclasses.replace(cfg, mode="tree")))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_chunking_invariance():
    scene, cam, cfg = presets.three_spheres_ground(size=SIZE)
    a = np.asarray(render_image(scene, cam, dataclasses.replace(cfg, chunk_size=1 << 20)))
    b = np.asarray(render_image(scene, cam, dataclasses.replace(cfg, chunk_size=512)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_jit_matches_eager():
    scene, camcfg, cfg = presets.three_spheres_ground(size=SIZE)
    cam = Camera.from_config(camcfg, cfg.width, cfg.height)
    a = np.asarray(render_image(scene, cam, cfg))
    b = np.asarray(render_image_jit(scene, cam, cfg))
    np.testing.assert_allclose(a, b, atol=1e-3)  # XLA fusion reorders f32 ops


def test_supersampling_converges_to_center():
    """Multisampled render with 0.5-unit 3-D jitter stays close to the
    centered render away from edges (the reference's adaptive supersampler
    exists for exactly this smoothing, MySdlApplication.cpp:1294-1311)."""
    scene, cam, cfg = presets.three_spheres_ground(size=32)
    center = np.asarray(render_image(scene, cam, cfg))
    multi = np.asarray(render_image(
        scene, cam, dataclasses.replace(cfg, samples=8)))
    # interior pixels: away from geometric edges the jitter has little effect
    diff = np.abs(center - multi).max(-1)
    assert np.median(diff) < 5e-3
    assert multi.mean() == pytest.approx(center.mean(), rel=0.1)


def test_supersampling_deterministic_by_seed():
    scene, cam, cfg = presets.three_spheres_ground(size=16)
    cfg = dataclasses.replace(cfg, samples=4)
    a = np.asarray(render_image(scene, cam, cfg))
    b = np.asarray(render_image(scene, cam, cfg))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_image(scene, cam, dataclasses.replace(cfg, seed=7)))
    assert np.abs(a - c).max() > 0


def test_background_is_black():
    """Rays that miss everything contribute black (rayTraceRay returns with
    color unchanged, MySdlApplication.cpp:1203)."""
    scene, cam, cfg = presets.single_sphere(size=SIZE)
    img = np.asarray(render_image(scene, cam, cfg))
    corner = img[:4, :4]  # top-left corner is empty sky in this framing
    np.testing.assert_array_equal(corner, 0.0)
