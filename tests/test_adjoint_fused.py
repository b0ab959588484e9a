"""Fused in-kernel backward (kernels/adjoint_fused.py): gradient parity with
the XLA replay adjoint and with core autodiff (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ray_tracer_fragment_shader_tpu.core.renderer import render_image
from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
from ray_tracer_fragment_shader_tpu.kernels.adjoint import l2_loss_pallas
from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
    fit_value_and_grad)
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 32
FIELDS = ["sph_center", "sph_radius", "light_pos", "mat_diffuse",
          "mat_specular", "mat_ambient"]


@pytest.fixture(scope="module")
def setup():
    scene, camcfg, cfg = presets.full_reflective(size=SIZE)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    target = render_image(scene, cam, cfg)
    return scene, cam, cfg, target


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)


def test_matches_replay_adjoint(setup):
    """Same pinned topology, same math — the two backends should agree to
    float32 reassociation error."""
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.5)

    loss_r, grads_r = jax.value_and_grad(l2_loss_pallas)(
        params, scene, cam, cfg, target)
    loss_f, grads_f = fit_value_and_grad(params, scene, cam, cfg, target)

    assert abs(float(loss_r) - float(loss_f)) <= 1e-6 * max(float(loss_r), 1)
    for fname in FIELDS:
        # tile-order accumulation vs whole-image reductions: f32
        # reassociation puts the two backends ~1e-4 apart at worst
        r = _rel(getattr(grads_r, fname), getattr(grads_f, fname))
        assert r < 5e-4, f"{fname}: rel diff {r:.3g}"
        assert np.abs(np.asarray(getattr(grads_f, fname))).max() > 0


def test_matches_core_autodiff(setup):
    """Fused kernel grads vs jax.grad of the XLA reference renderer, under a
    uniform cotangent (insensitive to the few decision-boundary pixels where
    kernel and core pick different hits — same device as test_adjoint.py)."""
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_grads_pallas)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_forward_with_residuals)

    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene)

    grads_c = jax.grad(lambda p: jnp.mean(
        render_image(p.into_scene(scene), cam, cfg)))(params)

    _, res = render_forward_with_residuals(scene, cam, cfg)
    g = jnp.full((SIZE, SIZE, 3), 1.0 / (SIZE * SIZE * 3), jnp.float32)
    grads_f = fit_grads_pallas(scene, cam, cfg, res, g)

    # fit_grads_pallas returns compacted sphere rows; core grads are padded
    take = np.nonzero(np.asarray(scene.sph_valid))[0]
    for fname, tol in [("sph_center", 5e-3), ("sph_radius", 5e-3),
                       ("light_pos", 3e-2), ("mat_diffuse", 3e-2),
                       ("mat_specular", 3e-2), ("mat_ambient", 3e-2)]:
        c = np.asarray(getattr(grads_c, fname))
        if fname.startswith("sph_"):
            c = c[take]
        r = _rel(c, grads_f[fname])
        assert r < tol, f"{fname}: rel diff {r:.3g}"


def test_single_kernel_matches_two_phase(setup):
    """The one-dispatch fused fwd+bwd kernel (residuals in VMEM scratch) vs
    the split residual-forward + backward-kernel path: identical math,
    so loss and every gradient leaf agree to float32 noise."""
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.5)
    loss_1, grads_1 = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="fused")
    loss_2, grads_2 = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="split")
    assert abs(float(loss_1) - float(loss_2)) <= 1e-6 * max(float(loss_2), 1)
    for fname in FIELDS:
        r = _rel(getattr(grads_1, fname), getattr(grads_2, fname))
        assert r < 1e-5, f"{fname}: rel diff {r:.3g}"


def test_twophase_packed_matches_fused(setup):
    """The packed two-phase path (default): single-plane packed residuals
    + in-kernel cotangent prologue.  Same replay adjoint, same gather
    transpose — loss and gradients are BIT-identical to the fused kernel
    (the residual pack/unpack is integer-exact by construction)."""
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.5)
    loss_f, grads_f = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="fused")
    loss_t, grads_t = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="twophase")
    assert float(loss_f) == float(loss_t)
    for fname in FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(grads_f, fname)),
                                      np.asarray(getattr(grads_t, fname)))


def test_twophase_packed_transmitting_chain():
    """Packed two-phase on a chain-exact scene WITH full transparency
    (the Snell/select branch live) and 2 lights (two lit bits in the
    packed plane): still bit-identical to the fused kernel."""
    from ray_tracer_fragment_shader_tpu.scene import (Material, SceneBuilder)
    from ray_tracer_fragment_shader_tpu.scene import presets
    glass = Material(ambient=(0.02, 0.02, 0.02), diffuse=(0.1, 0.1, 0.2),
                     specular=(0.4, 0.4, 0.4), transparency=(1.0, 1.0, 1.0),
                     refraction=0.9)
    scene = (SceneBuilder().add_checkerboard()
             .add_sphere("d5", material=glass).add_sphere("c3")
             .add_light("b6").add_light("f7", color=(0.8, 0.9, 1.0))
             .build())
    assert scene.chain_exact and scene.has_transmission
    camcfg = presets._cam(SIZE)
    cfg = presets.fit_target(size=SIZE)[2]
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    target = render_image(scene, cam, cfg)
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.0)
    loss_f, grads_f = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="fused")
    loss_t, grads_t = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="twophase")
    assert float(loss_f) == float(loss_t)
    for fname in FIELDS:
        # same math, but the two program shapes may fma-contract the
        # cotangent formation differently — reassociation-level only
        r = _rel(getattr(grads_f, fname), getattr(grads_t, fname))
        assert r < 1e-6, f"{fname}: rel diff {r:.3g}"


def test_pack_widths_bounds():
    """Field widths are powers of two covering the tables, and the f32
    exact-integer budget is enforced."""
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        pack_widths)
    bw_bi, bw_mid = pack_widths(nt=2, ns=64, m=5, nl=2)
    assert bw_bi >= 2 + 64 + 2 and bw_mid >= 6
    assert (bw_bi & (bw_bi - 1) == 0) if isinstance(bw_bi, int) else True
    with pytest.raises(ValueError, match="packed residual"):
        pack_widths(nt=0, ns=2 ** 20, m=100, nl=7)


def test_fused_fit_descends(setup):
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 2.0)
    opt = optax.adam(0.05)
    state = opt.init(params)
    losses = []
    for _ in range(6):
        loss, grads = fit_value_and_grad(params, scene, cam, cfg, target)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_jits(setup):
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene)
    loss, grads = jax.jit(
        lambda p: fit_value_and_grad(p, scene, cam, cfg, target))(params)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grads.sph_center)).all()


def test_prepared_inputs_match_inline(setup):
    """prepare_fit_inputs + prep= must be bit-identical to the inline path
    (same planes, same kernel) and reject block-shape mismatches."""
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        prepare_fit_inputs)
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.0)

    loss_i, grads_i = fit_value_and_grad(params, scene, cam, cfg, target,
                                         block_h=8, block_w=128)
    prep = prepare_fit_inputs(cam, cfg, target, block_h=8, block_w=128)
    loss_p, grads_p = fit_value_and_grad(params, scene, cam, cfg, target,
                                         block_h=8, block_w=128, prep=prep)
    assert float(loss_i) == float(loss_p)
    for fname in FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(grads_i, fname)),
                                      np.asarray(getattr(grads_p, fname)))

    with pytest.raises(ValueError, match="block"):
        fit_value_and_grad(params, scene, cam, cfg, target,
                           block_h=16, block_w=128, prep=prep)


def test_prep_provenance_checked(setup):
    """A stale prep passed alongside a DIFFERENT target must raise, not
    silently compute gradients against the old target (ADVICE r3, medium);
    target=None explicitly defers to the prep's planes."""
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        prepare_fit_inputs)
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.0)
    prep = prepare_fit_inputs(cam, cfg, target, block_h=8, block_w=128)

    other_target = target * 0.5
    with pytest.raises(ValueError, match="different `target`"):
        fit_value_and_grad(params, scene, cam, cfg, other_target,
                           block_h=8, block_w=128, prep=prep)

    # the sanctioned way to say "use the prep's planes"
    loss_none, _ = fit_value_and_grad(params, scene, cam, cfg, None,
                                      block_h=8, block_w=128, prep=prep)
    loss_same, _ = fit_value_and_grad(params, scene, cam, cfg, target,
                                      block_h=8, block_w=128, prep=prep)
    assert float(loss_none) == float(loss_same)


def test_make_fit_step_pallas_descends(setup):
    """The user-facing fused fit-step constructor (prep hoisted once) —
    the code path the headline bench times — descends and matches the
    un-prepped fused loss on its first step."""
    from ray_tracer_fragment_shader_tpu.diff.fit import make_fit_step_pallas
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 2.0)
    opt = optax.adam(0.05)
    state = opt.init(params)
    step = make_fit_step_pallas(scene, cam, cfg, target, opt)

    loss_ref, _ = fit_value_and_grad(params, scene, cam, cfg, target)
    losses = []
    for _ in range(6):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[0] == pytest.approx(float(loss_ref), rel=1e-6)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
