"""Gradient correctness: analytic (autodiff) vs central finite differences
(SURVEY.md section 4, test strategy item 2).  Gradients are defined through
fixed hit topology; tests perturb parameters at interior points."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.core.renderer import render_image
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 48


@pytest.fixture(scope="module")
def fit_setup():
    scene, cam, cfg = presets.fit_target(size=SIZE)
    target = render_image(scene, cam, cfg)

    def loss(p):
        s = scene.replace(sph_center=p["c"], sph_radius=p["r"],
                          light_pos=p["l"],
                          mat_diffuse=p["d"])
        img = render_image(s, cam, cfg)
        return jnp.mean((img - target) ** 2)

    p0 = {"c": scene.sph_center + 2.0, "r": scene.sph_radius * 1.08,
          "l": scene.light_pos + 5.0, "d": scene.mat_diffuse * 0.9}
    return loss, p0


def test_grads_finite(fit_setup):
    loss, p0 = fit_setup
    g = jax.grad(loss)(p0)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite grad in {k}"
    # geometry and light gradients must actually flow
    assert np.abs(np.asarray(g["r"])).max() > 0
    assert np.abs(np.asarray(g["c"])).max() > 0
    assert np.abs(np.asarray(g["d"])).max() > 0


def _fd_check(loss, p0, key, index, eps, rel_tol, abs_floor=1e-7):
    g = jax.grad(loss)(p0)
    gval = float(np.asarray(g[key]).ravel()[index])
    flat = np.asarray(p0[key], np.float64).ravel().copy()

    def at(val):
        arr = flat.copy()
        arr[index] = val
        p = dict(p0)
        p[key] = jnp.asarray(arr.reshape(p0[key].shape), p0[key].dtype)
        return float(loss(p))

    x0 = flat[index]
    fd = (at(x0 + eps) - at(x0 - eps)) / (2 * eps)
    if abs(fd) < abs_floor and abs(gval) < abs_floor:
        return
    assert gval == pytest.approx(fd, rel=rel_tol, abs=abs_floor), (
        f"{key}[{index}]: analytic {gval} vs fd {fd}")


def test_fd_radius(fit_setup):
    loss, p0 = fit_setup
    _fd_check(loss, p0, "r", 0, eps=1e-2, rel_tol=0.05)


def test_fd_center(fit_setup):
    loss, p0 = fit_setup
    for axis in range(3):
        _fd_check(loss, p0, "c", axis, eps=1e-2, rel_tol=0.08)


def test_fd_light(fit_setup):
    loss, p0 = fit_setup
    _fd_check(loss, p0, "l", 1, eps=1e-1, rel_tol=0.08)


def test_fd_diffuse(fit_setup):
    loss, p0 = fit_setup
    # material rows: checker white diffuse (row 0, channel 0)
    _fd_check(loss, p0, "d", 0, eps=1e-3, rel_tol=0.05)


def test_grad_through_tree_mode():
    scene, cam, cfg = presets.full_reflective(size=24)
    cfg = dataclasses.replace(cfg, mode="tree", max_depth=1)

    def loss(r):
        img = render_image(scene.replace(sph_radius=r), cam, cfg)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(scene.sph_radius))
    assert np.isfinite(g).all()


def test_grad_wrt_camera():
    scene, camcfg, cfg = presets.three_spheres_ground(size=24)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    cam = Camera.from_config(camcfg, cfg.width, cfg.height)

    def loss(eye):
        return jnp.mean(render_image(scene, cam.replace(eye=eye), cfg))

    g = np.asarray(jax.grad(loss)(cam.eye))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
