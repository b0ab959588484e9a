"""Bounce-tree replay adjoint (VERDICT r1 item 6): fractional-transparency
scenes get a non-naive backward — preorder-node residuals from the tree
kernel + differentiable tree replay (kernels/adjoint.py::replay_render_tree).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.config import RenderConfig
from ray_tracer_fragment_shader_tpu.core.renderer import render_image
from ray_tracer_fragment_shader_tpu.diff.fit import FitParams, l2_loss
from ray_tracer_fragment_shader_tpu.kernels.adjoint import (
    l2_loss_pallas, replay_render_tree)
from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
    render_forward_with_residuals)
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.scene import Material, SceneBuilder
from ray_tracer_fragment_shader_tpu.scene.presets import _cam

SIZE = 32
BLOCKS = dict(block_h=8, block_w=128)


def _scene():
    glass = Material(ambient=(0.02, 0.02, 0.02), diffuse=(0.1, 0.1, 0.2),
                     specular=(0.4, 0.4, 0.4), transparency=(0.5, 0.5, 0.5),
                     refraction=0.9)
    scene = (SceneBuilder()
             .add_checkerboard()
             .add_sphere("d5", material=glass)
             .add_sphere("c3")
             .add_light("b6")
             .build())
    assert not scene.chain_exact
    return scene


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)


@pytest.fixture(scope="module")
def setup():
    scene = _scene()
    cfg = RenderConfig(width=SIZE, height=SIZE, max_depth=2, samples=1)
    camcfg = _cam(SIZE)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    return scene, cam, cfg


def test_tree_replay_reproduces_forward(setup):
    """Pinned-topology replay == the tree kernel's own radiance."""
    scene, cam, cfg = setup
    img, res = render_forward_with_residuals(scene, cam, cfg, **BLOCKS)
    rep = replay_render_tree(scene, cam, cfg, res)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(img), atol=1e-4)


def test_tree_grads_match_core_autodiff(setup):
    """Tree-replay VJP vs jax.grad of the core tree renderer, under a
    uniform cotangent (insensitive to the few decision-boundary pixels where
    kernel and core pick different hits — same device as the chain tests in
    test_adjoint_fused.py)."""
    from ray_tracer_fragment_shader_tpu.kernels.adjoint import (
        render_image_diff)
    scene, cam, cfg = setup
    params = FitParams.from_scene(scene)

    g_tree = jax.grad(lambda p: jnp.mean(
        render_image_diff(p.into_scene(scene), cam, cfg)))(params)
    g_core = jax.grad(lambda p: jnp.mean(
        render_image(p.into_scene(scene), cam, cfg)))(params)

    for fname, tol in [("sph_center", 1e-2), ("sph_radius", 1e-2),
                       ("light_pos", 3e-2), ("mat_diffuse", 3e-2),
                       ("mat_specular", 3e-2), ("mat_ambient", 3e-2)]:
        r = _rel(getattr(g_core, fname), getattr(g_tree, fname))
        assert r < tol, f"{fname}: rel diff {r:.3g}"
        assert np.abs(np.asarray(getattr(g_tree, fname))).max() > 0


def test_tree_l2_fit_descends(setup):
    """End-to-end: Adam on the tree-replay L2 loss reduces it (the
    capability VERDICT item 6 asks for — training fractional-T scenes
    without naive autodiff).  Perturbs material diffuse — a smooth,
    near-quadratic direction of the loss — so descent is deterministic
    (geometry directions of mirror/glass scenes are rugged; see
    diff/multiview.py for the robust geometry recipe)."""
    import optax
    scene, cam, cfg = setup
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    target = render_image_pallas(scene, cam, cfg, **BLOCKS)
    params = FitParams.from_scene(scene).replace(
        mat_diffuse=scene.mat_diffuse * 1.6 + 0.05)
    opt = optax.adam(0.02)
    state = opt.init(params)
    losses = []
    for _ in range(8):
        loss, grads = jax.value_and_grad(l2_loss_pallas)(
            params, scene, cam, cfg, target)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]
    assert np.isfinite(losses).all()


def test_fused_tree_adjoint_matches_xla_replay(setup):
    """The in-kernel tree adjoint — single-dispatch fused fwd+loss+bwd with
    preorder-node residuals in VMEM scratch — equals jax.value_and_grad of
    the XLA tree replay on a fractional-transparency scene (VERDICT r2
    item 5: the ``chain_exact`` guard is gone)."""
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    scene, cam, cfg = setup
    target = render_image_pallas(scene, cam, cfg, **BLOCKS)
    params = FitParams.from_scene(scene).replace(
        mat_diffuse=scene.mat_diffuse * 1.3 + 0.02,
        sph_center=scene.sph_center + 0.6)

    loss_f, g_f = fit_value_and_grad(params, scene, cam, cfg, target,
                                     **BLOCKS)
    loss_x, g_x = jax.value_and_grad(l2_loss_pallas)(
        params, scene, cam, cfg, target)

    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)
    # Sphere-gradient tolerance is wider than the others: the kernel body
    # computes 1/|v| and sqrt via one rsqrt (ivl, vlen = x*rsqrt(x)) where
    # the XLA replay uses safe_div(1, safe_sqrt(x)) — a systematic sub-ulp
    # bias (~1e-5 relative per pixel, verified by per-pixel cotangent
    # decomposition) that accumulates coherently across the glass sphere's
    # pixels while the summed gradient itself suffers heavy cancellation
    # (single pixels contribute +-5e-5 to a 2.4e-5 total).
    for fname, tol in [("sph_center", 1e-2), ("sph_radius", 1e-2),
                       ("light_pos", 2e-4), ("mat_diffuse", 2e-4),
                       ("mat_specular", 2e-4), ("mat_ambient", 2e-4)]:
        r = _rel(getattr(g_x, fname), getattr(g_f, fname))
        assert r < tol, f"{fname}: rel diff {r:.3g}"
        assert np.abs(np.asarray(getattr(g_f, fname))).max() > 0


def test_fused_tree_adjoint_supersampled_matches_core(setup):
    """Supersampled fractional-transparency fit: the per-sample recompute
    tree adjoint (tree re-trace into VMEM scratch + in-kernel tree adjoint,
    one dispatch per sample) matches jax.grad of the supersampled core tree
    loss — same jitter PRNG stream, so only decision-boundary pixels can
    differ (same tolerances as the chain test in test_pallas_features.py)."""
    import dataclasses

    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad)
    scene, cam, cfg = setup
    cfg_s = dataclasses.replace(cfg, samples=2)
    target = render_image(scene, cam, cfg_s) * 0.9  # nonzero cotangent
    params = FitParams.from_scene(scene)

    loss_f, g_f = fit_value_and_grad(params, scene, cam, cfg_s, target,
                                     **BLOCKS)
    loss_c, g_c = jax.value_and_grad(l2_loss)(params, scene, cam, cfg_s,
                                              target)
    assert float(loss_f) == pytest.approx(float(loss_c), rel=5e-3)
    for fname, tol in [("sph_center", 1e-2), ("mat_diffuse", 3e-2),
                       ("light_pos", 3e-2)]:
        r = _rel(getattr(g_c, fname), getattr(g_f, fname))
        assert r < tol, f"{fname}: rel diff {r:.3g}"
