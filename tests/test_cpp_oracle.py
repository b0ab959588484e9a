"""C++ oracle: build, run, cross-validate against the NumPy oracle (two
independent float64 implementations of the reference semantics must agree to
machine precision)."""
import dataclasses
import shutil

import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.oracle import oracle_render
from ray_tracer_fragment_shader_tpu.scene import presets

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="needs g++")


def _cpp():
    from ray_tracer_fragment_shader_tpu.oracle.native import cpp_oracle_render
    return cpp_oracle_render


def test_matches_numpy_oracle_simple():
    scene, cam, cfg = presets.single_sphere(size=32)
    a = _cpp()(scene, cam, cfg)
    b = oracle_render(scene, cam, cfg)
    np.testing.assert_allclose(a, b, atol=1e-11)


def test_matches_numpy_oracle_bounces():
    scene, cam, cfg = presets.full_reflective(size=32)
    a = _cpp()(scene, cam, cfg)
    b = oracle_render(scene, cam, cfg)
    np.testing.assert_allclose(a, b, atol=1e-11)


def test_matches_numpy_oracle_transmission():
    scene, cam, cfg = presets.reference_demo()
    cfg = dataclasses.replace(cfg, width=24, height=24, samples=1, max_depth=4)
    a = _cpp()(scene, cam, cfg)
    b = oracle_render(scene, cam, cfg)
    np.testing.assert_allclose(a, b, atol=1e-11)


def test_prune_flag_respected():
    scene, cam, cfg = presets.three_spheres_ground(size=24)
    a = _cpp()(scene, cam, dataclasses.replace(cfg, prune=True))
    b = _cpp()(scene, cam, dataclasses.replace(cfg, prune=False))
    # well-formed scene: prune is invisible
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_jax_renderer_vs_cpp_oracle_512():
    """The fast C++ oracle allows a bigger parity sweep than the NumPy one."""
    import jax
    from ray_tracer_fragment_shader_tpu.core.renderer import render_image
    scene, cam, cfg = presets.full_reflective(size=128)
    a = np.asarray(render_image(scene, cam, cfg))
    b = _cpp()(scene, cam, cfg)
    d = np.abs(a - b).max(-1)
    assert (d > 2e-3).mean() < 0.002
