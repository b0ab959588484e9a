"""Opt-in bf16 split-precision shading (RenderConfig.bf16_shading).

The mode runs the any-hit shadow sweeps and the Phong blend in bfloat16
(PERF.md §7: 2-per-lane VPU, measured 2.41x on the kernels' op mix) with
geometry/epsilon tests in f32.  Its parity bars are LOOSER than the default
path's f64-oracle bars and are pinned here: shading drift bounded by bf16's
~3 decimal digits, plus a small fraction of shadow-boundary lit/unlit flips.
"""
import dataclasses

import jax
import numpy as np
import optax
import pytest

from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
    fit_value_and_grad)
from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
    render_image_pallas)
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 64


def _renders(preset, size=SIZE, **cfg_over):
    scene, camcfg, cfg = preset(size=size)
    cfg = dataclasses.replace(cfg, **cfg_over)
    cam = Camera.from_config(camcfg, size, size)
    a = np.asarray(render_image_pallas(scene, cam, cfg))
    b = np.asarray(render_image_pallas(
        scene, cam, dataclasses.replace(cfg, bf16_shading=True)))
    return a, b


@pytest.mark.parametrize("preset", [presets.full_reflective,
                                    presets.fit_target])
def test_bf16_shading_parity_bars(preset):
    """The mode's documented bars: p99 per-pixel error < 1e-2 (bf16 shading
    drift) and < 0.5% of pixels past 3e-2 (shadow-boundary lit flips)."""
    a, b = _renders(preset)
    d = np.abs(a - b).max(-1)
    assert np.quantile(d, 0.99) < 1e-2, np.quantile(d, 0.99)
    assert (d > 3e-2).mean() < 5e-3, (d > 3e-2).mean()
    assert np.isfinite(b).all()


def test_bf16_shading_fit_descends_and_grads_close():
    """Gradients under bf16 shading: the adjoint replays shading in f32
    against the bf16 forward's recorded topology (config.py docstring) —
    grads must stay within a few percent of the f32 path's and the fit must
    descend."""
    size = 32
    scene, camcfg, cfg = presets.fit_target(size=size)
    cfg_bf = dataclasses.replace(cfg, bf16_shading=True)
    cam = Camera.from_config(camcfg, size, size)
    target = render_image_pallas(scene, cam, cfg_bf)
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.0)

    loss_b, g_b = fit_value_and_grad(params, scene, cam, cfg_bf, target)
    loss_f, g_f = fit_value_and_grad(params, scene, cam, cfg, target)
    assert float(loss_b) == pytest.approx(float(loss_f), rel=0.1)
    for fname in ("sph_center", "sph_radius", "light_pos", "mat_diffuse"):
        a, b = np.asarray(getattr(g_f, fname)), np.asarray(getattr(g_b,
                                                                   fname))
        r = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
        assert r < 5e-2, f"{fname}: rel diff {r:.3g}"
        assert np.abs(b).max() > 0

    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 2.0)
    opt = optax.adam(0.05)
    state = opt.init(params)
    losses = []
    for _ in range(8):
        loss, grads = fit_value_and_grad(params, scene, cam, cfg_bf, target)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert min(losses[1:]) < losses[0]
    assert np.isfinite(losses).all()


def test_bf16_shading_transparent_scene_renders():
    """Transparent scenes: nearest-occluder shadow sweeps stay f32 by
    design (ordering is precision-sensitive); only the Phong blend runs
    bf16 — drift stays within the same bars."""
    from ray_tracer_fragment_shader_tpu.scene import Material, SceneBuilder
    glass = Material(ambient=(0.02, 0.02, 0.02), diffuse=(0.1, 0.1, 0.2),
                     specular=(0.4, 0.4, 0.4), transparency=(1.0, 1.0, 1.0),
                     refraction=0.9)
    scene = (SceneBuilder().add_checkerboard()
             .add_sphere("d5", material=glass).add_sphere("c3")
             .add_light("b6").build())
    camcfg = presets._cam(SIZE)
    cfg = presets.fit_target(size=SIZE)[2]
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    a = np.asarray(render_image_pallas(scene, cam, cfg))
    b = np.asarray(render_image_pallas(
        scene, cam, dataclasses.replace(cfg, bf16_shading=True)))
    d = np.abs(a - b).max(-1)
    assert np.quantile(d, 0.99) < 1e-2
    assert (d > 3e-2).mean() < 5e-3
