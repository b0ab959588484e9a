"""Soft-silhouette differentiable rendering (diff/soft.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ray_tracer_fragment_shader_tpu.core.renderer import render_image
from ray_tracer_fragment_shader_tpu.diff.fit import (FitParams,
                                                     default_fit_optimizer)
from ray_tracer_fragment_shader_tpu.diff.soft import render_soft, soft_l2_loss
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 48


def _setup():
    scene, camcfg, cfg = presets.fit_target(size=SIZE)
    cam = Camera.from_config(camcfg, SIZE, SIZE)
    return scene, cam, cfg


def test_soft_converges_to_hard_as_sigma_shrinks():
    scene, cam, cfg = _setup()
    hard = np.asarray(render_image(scene, cam, cfg))
    d_coarse = np.abs(np.asarray(render_soft(scene, cam, cfg, sigma=8.0)) - hard).mean()
    d_fine = np.abs(np.asarray(render_soft(scene, cam, cfg, sigma=0.25)) - hard).mean()
    assert d_fine < d_coarse
    assert d_fine < 5e-3


def test_occupancy_gradient_exists():
    """The whole point: d(soft image)/d(center) is nonzero through the
    silhouette alpha — the hard renderer's fixed-topology gradient has no
    such term for pure occupancy shifts."""
    scene, cam, cfg = _setup()
    g = jax.grad(lambda c: jnp.mean(
        render_soft(scene.replace(sph_center=c), cam, cfg, sigma=2.0)))(
            scene.sph_center)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 1e-6


def test_soft_fit_descends():
    scene, cam, cfg = _setup()
    target = render_image(scene, cam, cfg)
    rng = np.random.RandomState(0)
    p = FitParams.from_scene(scene).replace(
        sph_center=scene.sph_center
        + jnp.asarray(rng.uniform(-2, 2, (scene.num_spheres, 3)), jnp.float32))
    opt = default_fit_optimizer(geom_lr=0.1, light_lr=0.0, mat_lr=0.0)
    state = opt.init(p)

    @jax.jit
    def step(p, state):
        loss, g = jax.value_and_grad(soft_l2_loss)(p, scene, cam, cfg,
                                                   target, sigma=2.0)
        up, state = opt.update(g, state, p)
        return optax.apply_updates(p, up), state, loss

    losses = []
    for _ in range(40):
        p, state, loss = step(p, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < losses[0]
