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
    transpose.  With the phase-2 block pinned to the forward block the
    result is BIT-identical to the fused kernel (the residual pack/unpack
    is integer-exact by construction); on the default path the backward
    runs its own sweep-winning block (16x256), so the per-tile gradient
    accumulation ORDER differs — reassociation-level equality only."""
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fused_loss_grads_pallas, twophase_loss_grads_pallas)
    scene, cam, cfg, target = setup
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 1.5)
    scene_p = params.into_scene(scene)

    # bit-exactness at matched blocks
    sq_f, gc_f = fused_loss_grads_pallas(scene_p, cam, cfg, target)
    sq_t, gc_t = twophase_loss_grads_pallas(scene_p, cam, cfg, target,
                                            bwd_block=(8, 512))
    assert float(sq_f) == float(sq_t)
    for k in gc_f:
        np.testing.assert_array_equal(np.asarray(gc_f[k]),
                                      np.asarray(gc_t[k]))

    # the default path (phase-2 block 16x256): reassociation-level parity
    loss_f, grads_f = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="fused")
    loss_t, grads_t = fit_value_and_grad(params, scene, cam, cfg, target,
                                         mode="twophase")
    assert abs(float(loss_f) - float(loss_t)) <= 1e-6 * max(float(loss_f), 1)
    for fname in FIELDS:
        r = _rel(getattr(grads_f, fname), getattr(grads_t, fname))
        assert r < 5e-4, f"{fname}: rel diff {r:.3g}"


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
    assert abs(float(loss_f) - float(loss_t)) <= 1e-6 * max(float(loss_f), 1)
    for fname in FIELDS:
        # same math, but different fma contraction of the cotangent
        # formation AND a different phase-2 tile accumulation order
        # (default bwd block 16x256) — reassociation-level only
        r = _rel(getattr(grads_f, fname), getattr(grads_t, fname))
        assert r < 5e-4, f"{fname}: rel diff {r:.3g}"


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


def test_adaptive_matches_replay_backward_per_sample(setup):
    """Adaptive supersampling (the reference's default render mode) on the
    kernel fast path, with REAL jitter: constant-color regions converge at
    k=1 (divisor quirk) while detailed pixels accept all samples, so the
    accept/divisor planes are genuinely mixed.  The fast path's gradients
    must equal the sum of per-sample XLA-replay backward gradients
    (fit_grads_pallas — an independent backward implementation) weighted by
    the same recorded accept_k / divisor planes."""
    import dataclasses

    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_grads_pallas, grads_to_fitparams)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_forward_with_residuals, render_image_pallas)
    from ray_tracer_fragment_shader_tpu.ops.rays import (sample_jitter,
                                                         screen_points)

    scene, cam, cfg = setup[0], setup[1], setup[2]
    S = 3
    cfg_a = dataclasses.replace(cfg, samples=S, adaptive=True)
    cfg1 = dataclasses.replace(cfg, samples=1, force_jitter=False)
    target = render_image_pallas(scene, cam, cfg_a) * 0.9
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 0.3)
    scene_p = params.into_scene(scene)

    loss_a, g_a = fit_value_and_grad(params, scene, cam, cfg_a, target)

    # reproduce the forward emulation to get img/accepts/divisor (this
    # replication is exact: same kernels, same PRNG stream)
    keys = jax.random.split(jax.random.PRNGKey(cfg_a.seed), S)
    pts0 = screen_points(cam, SIZE, SIZE)
    accum = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
    divisor = jnp.full((SIZE, SIZE), float(S), jnp.float32)
    done = jnp.zeros((SIZE, SIZE), bool)
    accepts, jits = [], []
    for k in range(S):
        jit = sample_jitter(keys[k], pts0.shape[0], cfg_a.jitter_scale,
                            dtype=pts0.dtype)
        jits.append(jit)
        c = render_image_pallas(scene_p, cam, cfg1, pts=pts0 + jit)
        accepts.append(jnp.logical_not(done))
        accum_after = jnp.where(done[..., None], accum, accum + c)
        d = k * accum_after - (k + 1.0) * accum
        dnorm = jnp.sqrt(jnp.sum(d * d, -1))
        newly = jnp.logical_and(~done,
                                dnorm < cfg.small_number * k * (k + 1.0))
        divisor = jnp.where(newly, float(k), divisor)
        done = jnp.logical_or(done, newly)
        accum = accum_after
    img = accum / divisor[..., None]
    # the accept planes must actually be mixed for this test to bite
    assert 0 < float(jnp.mean(jnp.where(accepts[-1], 1.0, 0.0))) < 1
    g = (2.0 / img.size) * (img - target)

    # independent backward: per-sample XLA-replay kernel with the same
    # accept_k/divisor weighting
    expected = None
    for k in range(S):
        _, res = render_forward_with_residuals(scene_p, cam, cfg1,
                                               pts=pts0 + jits[k])
        wk = jnp.where(accepts[k], 1.0, 0.0) / divisor
        gk = fit_grads_pallas(scene_p, cam, cfg1, res, g * wk[..., None],
                              pts=pts0 + jits[k])
        expected = gk if expected is None else jax.tree_util.tree_map(
            jnp.add, expected, gk)
    g_e = grads_to_fitparams(params, scene_p, expected)

    loss_direct = float(jnp.mean((img - target) ** 2))
    assert float(loss_a) == pytest.approx(loss_direct, rel=1e-5)
    for fname in FIELDS:
        r = _rel(getattr(g_e, fname), getattr(g_a, fname))
        assert r < 5e-4, f"{fname}: rel diff {r:.3g}"
        assert np.abs(np.asarray(getattr(g_a, fname))).max() > 0


def test_adaptive_divisor_quirk_gradient():
    """Zero jitter: every pixel converges at k=1 with divisor 1 but TWO
    accumulated samples (the preserved reference quirk,
    test_adaptive.py::test_divisor_quirk_on_identical_samples), so
    img = 2c.  Under fixed topology d/dp mean((2c - t)^2) =
    2 * d/dp mean((c - (t - c0))^2) with c0 = stop_grad(c) — so the
    adaptive fast-path gradients must equal exactly 2x the single-sample
    gradients at the shifted target.  Cross-checks the accept/divisor
    weighting against the independently-tested single-sample path with no
    core-vs-kernel boundary-pixel noise."""
    import dataclasses

    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.scene import presets as _p
    scene, camcfg, cfg = _p.fit_target(size=SIZE)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    cfg_a = dataclasses.replace(cfg, samples=4, adaptive=True,
                                force_jitter=True, jitter_scale=0.0)
    params = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + 0.3)
    scene_p = params.into_scene(scene)
    c0 = render_image_pallas(scene_p, cam, cfg)      # single sample
    img_a = render_image_pallas(scene_p, cam, cfg_a)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(2.0 * c0),
                               rtol=1e-6)            # the quirk itself
    target = render_image_pallas(scene, cam, cfg_a) * 0.9

    loss_a, g_a = fit_value_and_grad(params, scene, cam, cfg_a, target)
    loss_1, g_1 = fit_value_and_grad(params, scene, cam, cfg,
                                     target - np.asarray(c0))
    assert float(loss_a) == pytest.approx(
        float(np.mean((np.asarray(img_a) - np.asarray(target)) ** 2)),
        rel=1e-5)
    for fname in FIELDS:
        a = np.asarray(getattr(g_a, fname))
        b = 2.0 * np.asarray(getattr(g_1, fname))
        r = np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
        assert r < 1e-4, f"{fname}: rel diff {r:.3g}"
        assert np.abs(a).max() > 0


def test_default_block_policy():
    """Scene/phase/depth-aware tile defaults (PERF.md §5/§6 sweeps): small
    scenes 8x512 fwd / 16x256 bwd; 64-sphere scenes keep 8x512 fwd but
    take 64x512 bwd (64x256 past depth 3 for VMEM margin) and 64x256
    fused.  Explicit ints always pass through."""
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        _resolve_blocks, compact_scene, default_blocks)
    small = compact_scene(presets.full_reflective(size=32)[0])
    big = compact_scene(presets.procedural_spheres(size=32)[0])
    assert default_blocks(small, "fwd") == (8, 512)
    assert default_blocks(small, "bwd") == (16, 256)
    assert default_blocks(small, "fused") == (8, 512)
    assert default_blocks(big, "fwd") == (8, 512)
    assert default_blocks(big, "bwd", depth=3) == (64, 512)
    assert default_blocks(big, "bwd", depth=5) == (64, 256)
    assert default_blocks(big, "fused") == (64, 256)
    assert _resolve_blocks(big, 32, 128, "bwd") == (32, 128)
    assert _resolve_blocks(big, None, None, "bwd", 3) == (64, 512)
