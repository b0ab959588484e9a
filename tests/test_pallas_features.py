"""Kernel-path feature parity (VERDICT r1 item 5): adaptive supersampling in
the Pallas forward, and fused fwd+bwd on supersampled (samples>1) targets."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.core.renderer import render_image
from ray_tracer_fragment_shader_tpu.diff.fit import FitParams, l2_loss
from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
    fit_value_and_grad)
from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
    render_image_pallas)
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 32
BLOCKS = dict(block_h=8, block_w=128)


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)


def test_adaptive_pallas_matches_adaptive_core():
    """Same seed => identical jitter streams => the adaptive masks follow the
    same trajectory; only decision-boundary pixels may differ."""
    scene, camcfg, cfg = presets.fit_target(size=SIZE)
    cfg = dataclasses.replace(cfg, samples=6, adaptive=True)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    a = np.asarray(render_image(scene, cam, cfg))
    b = np.asarray(render_image_pallas(scene, cam, cfg, **BLOCKS))
    d = np.abs(a - b).max(-1)
    assert (d > 1e-3).mean() <= 0.02, f"{(d > 1e-3).mean():.3%} pixels differ"
    assert a.mean() == pytest.approx(b.mean(), rel=0.05)


def test_multisample_fused_loss_matches_core():
    """samples=4: the fused forward mean-image equals the core's (same PRNG
    stream), so the losses agree."""
    scene, camcfg, cfg = presets.fit_target(size=SIZE)
    cfg = dataclasses.replace(cfg, samples=4)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    target = render_image(scene, cam, cfg)
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.5)
    loss_f, grads_f = fit_value_and_grad(params, scene, cam, cfg, target,
                                         **BLOCKS)
    loss_c = l2_loss(params, scene, cam, cfg, target)
    assert float(loss_f) == pytest.approx(float(loss_c), rel=5e-3)
    assert np.abs(np.asarray(grads_f.sph_center)).max() > 0


def test_multisample_fused_grads_match_core_autodiff():
    """Fused per-sample adjoint vs jax.grad of the supersampled core loss."""
    scene, camcfg, cfg = presets.fit_target(size=SIZE)
    cfg = dataclasses.replace(cfg, samples=4)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    target = render_image(scene, cam, cfg) * 0.9  # nonzero cotangent

    params = FitParams.from_scene(scene)
    _, grads_f = fit_value_and_grad(params, scene, cam, cfg, target, **BLOCKS)
    grads_c = jax.grad(l2_loss)(params, scene, cam, cfg, target)

    for fname, tol in [("sph_center", 1e-2), ("sph_radius", 1e-2),
                       ("light_pos", 3e-2), ("mat_diffuse", 3e-2),
                       ("mat_specular", 3e-2), ("mat_ambient", 3e-2)]:
        r = _rel(getattr(grads_c, fname), getattr(grads_f, fname))
        assert r < tol, f"{fname}: rel diff {r:.3g}"


def test_fused_supports_adaptive():
    """Round 5: adaptive supersampling HAS a fixed-topology fast-path
    backward (acceptance masks + divisor recorded as residuals) — the
    round-4 rejection is gone.  Parity is asserted in
    tests/test_adjoint_fused.py::test_adaptive_matches_replay_backward_
    per_sample; here just the smoke path."""
    import numpy as np
    scene, camcfg, cfg = presets.fit_target(size=SIZE)
    cfg = dataclasses.replace(cfg, samples=2, adaptive=True)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    target = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
    params = FitParams.from_scene(scene)
    loss, grads = fit_value_and_grad(params, scene, cam, cfg, target,
                                     **BLOCKS)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grads.sph_center)).all()
