"""Multi-view inverse rendering (diff/multiview.py): orbit views, pyramid,
restarts, recovery metrics."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
from ray_tracer_fragment_shader_tpu.diff.multiview import (
    downsample, fit_multiview, multiview_loss, orbit_views, recovery_report,
    render_views)
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 64


def _setup(n_views=3):
    scene, camcfg, cfg = presets.fit_target(size=SIZE)
    views = orbit_views(camcfg, n_views, span_deg=80.0)
    return scene, views, cfg


def test_orbit_views_preserve_distance_and_frame():
    _, views, _ = _setup(5)
    look = np.asarray(views[0].look_at)
    d = [np.linalg.norm(np.asarray(v.eye) - look) for v in views]
    assert np.allclose(d, d[0], rtol=1e-6)
    assert views[0].eye == presets.CameraConfig().eye  # base view first
    eyes = np.asarray([v.eye for v in views])
    assert np.unique(np.round(eyes, 6), axis=0).shape[0] == 5


def test_downsample_matches_coarse_render_exactly():
    """Decimated full-res target == coarse render at the true parameters
    (the property that makes the pyramid's coarse objectives unbiased)."""
    scene, views, cfg = _setup(1)
    from ray_tracer_fragment_shader_tpu.diff.multiview import (_stage_config,
                                                               _stage_views)
    full = render_views(scene, views, cfg)
    coarse_cfg = _stage_config(cfg, SIZE // 2)
    coarse_views = _stage_views(views, SIZE, SIZE // 2)
    coarse = render_views(scene, coarse_views, coarse_cfg)
    np.testing.assert_allclose(np.asarray(downsample(full, SIZE // 2)),
                               np.asarray(coarse), atol=1e-6)
    img = jnp.arange(8 * 8 * 3, dtype=jnp.float32).reshape(8, 8, 3)
    assert downsample(img, 4).shape == (4, 4, 3)
    assert downsample(jnp.stack([img, img], 0), 2).shape == (2, 2, 2, 3)


def test_multiview_loss_zero_at_truth_and_depth_sensitivity():
    scene, views, cfg = _setup(3)
    targets = render_views(scene, views, cfg)
    cams = [Camera.from_config(v, SIZE, SIZE) for v in views]
    p = FitParams.from_scene(scene)
    l0 = float(multiview_loss(p, scene, cams, cfg, targets, None))
    assert l0 < 1e-10

    # displace one sphere along the *base view's* depth axis: the multi-view
    # loss must notice more strongly (relatively) than the single view does
    look = np.asarray(views[0].look_at) - np.asarray(views[0].eye)
    look = look / np.linalg.norm(look)
    dc = jnp.asarray(8.0 * look, jnp.float32)
    p_off = p.replace(sph_center=p.sph_center + dc[None, :])
    l_multi = float(multiview_loss(p_off, scene, cams, cfg, targets, None))
    l_single = float(multiview_loss(p_off, scene, cams[:1], cfg,
                                    targets[:1], None))
    assert l_multi > 0.0
    assert l_multi > l_single  # extra azimuths expose the depth shift


def test_fit_multiview_recovers_geometry():
    size = 96
    scene, camcfg, cfg = presets.fit_target(size=size)
    views = orbit_views(camcfg, 2, span_deg=80.0)
    targets = render_views(scene, views, cfg)
    cams = [Camera.from_config(v, size, size) for v in views]
    rng = np.random.RandomState(1)
    nv = int(np.asarray(scene.sph_valid).sum())
    dc = np.zeros((scene.num_spheres, 3), np.float32)
    dc[:nv] = rng.uniform(-6, 6, (nv, 3))
    init = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + jnp.asarray(dc),
        sph_radius=scene.sph_radius
        * jnp.asarray(1 + rng.uniform(-0.08, 0.08, scene.num_spheres),
                      jnp.float32))
    err0 = recovery_report(init, scene)
    res = fit_multiview(scene, views, cfg, targets, init=init,
                        sizes=(48,), sigmas=(1.5, 1.0),
                        steps_per_sigma=40, restarts=2, restart_steps=10,
                        restart_jitter=(4.0, 0.05, 0.0),
                        geom_lr=0.4, light_lr=0.0, seed=0)
    err1 = recovery_report(res.params, scene)
    assert np.isfinite(res.history).all()
    # compare like-for-like: hard multi-view loss at full resolution
    l_init = float(multiview_loss(init, scene, cams, cfg, targets, None))
    l_fit = float(multiview_loss(res.params, scene, cams, cfg, targets, None))
    assert l_fit < l_init
    # measured: 6.89 -> 0.91 world units (one board square = 40)
    assert err1["center_err_max"] < 0.3 * err0["center_err_max"]
    assert len(res.restart_losses) == 2


def test_stage_gating_never_worsens():
    """Every stage keeps its best iterate: stage_log must show
    loss <= loss_entry for all stages (VERDICT r3 item 6 — the old
    behaviour let hard-polish stages RAISE the loss)."""
    size = 48
    scene, camcfg, cfg = presets.fit_target(size=size)
    views = orbit_views(camcfg, 2, span_deg=80.0)
    targets = render_views(scene, views, cfg)
    rng = np.random.RandomState(2)
    nv = int(np.asarray(scene.sph_valid).sum())
    dc = np.zeros((scene.num_spheres, 3), np.float32)
    dc[:nv] = rng.uniform(-4, 4, (nv, 3))
    init = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center + jnp.asarray(dc))
    res = fit_multiview(scene, views, cfg, targets, init=init,
                        sizes=(48,), sigmas=(1.5, None),
                        steps_per_sigma=10, restarts=1, restart_steps=4,
                        geom_lr=0.4, light_lr=0.5, light_polish_steps=8,
                        seed=0)
    assert len(res.stage_log) == 3  # 2 sigma stages + light polish
    for entry in res.stage_log:
        assert entry["loss"] <= entry["loss_entry"] + 1e-12, entry
    assert res.stage_log[-1].get("stage") == "light_polish"


def test_light_polish_descends_light_error():
    """With geometry at truth and only the light perturbed, the light-only
    polish must reduce the light position error (VERDICT r3 item 5: the
    round-3 artifact showed light error INCREASING 13.07 -> 16.13)."""
    size = 48
    scene, camcfg, cfg = presets.fit_target(size=size)
    views = orbit_views(camcfg, 2, span_deg=80.0)
    targets = render_views(scene, views, cfg)
    init = FitParams.from_scene(scene).replace(
        light_pos=scene.light_pos + jnp.asarray([[8.0, -6.0, 5.0]],
                                                jnp.float32))
    err0 = recovery_report(init, scene)
    assert err0["light_err_max"] > 10.0
    res = fit_multiview(scene, views, cfg, targets, init=init,
                        sizes=(48,), sigmas=(None,), steps_per_sigma=1,
                        restarts=1, restart_steps=1, geom_lr=0.0,
                        light_lr=1.0, light_polish_steps=60, seed=0)
    err1 = recovery_report(res.params, scene)
    assert err1["light_err_max"] < err0["light_err_max"]


def test_recovery_report_zero_at_truth():
    scene, _, _ = _setup(1)
    rep = recovery_report(FitParams.from_scene(scene), scene)
    assert rep["center_err_max"] == 0.0
    assert rep["light_err_max"] == 0.0
