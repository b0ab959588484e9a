"""Soft-silhouette rendering for differentiable fitting.

Fixed-hit-topology gradients (the convention of every renderer here, see
SEMANTICS.md) carry **no occupancy term**: moving a sphere never changes
which pixels it covers, in the gradient's view.  An L2 photometric loss on a
hard render is therefore dominated near silhouettes by discrete pixel flips
the optimizer cannot see — geometry fits stall or random-walk.

``render_soft`` is the standard remedy (SoftRas-style): each primary ray
alpha-blends the nearest-by-silhouette sphere over the scene-without-it,
with ``alpha = sigmoid(-(b - r)/sigma)`` where ``b`` is the ray's
closest-approach distance to the sphere center.  Alpha depends smoothly on
centers and radii, so occupancy gradients exist; as sigma -> 0 the image
converges to the hard render away from edges.  The sphere side is shaded
locally (depth 0) at the closest-approach surface point — a continuous
extension across the silhouette; the background side is the full hard chain
with that sphere excluded.

Intended use: optimize the soft loss with annealed sigma, then (optionally)
polish with the hard loss inside the converged basin.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core.renderer import render_rays_chain, _unit
from ..ops.intersect import intersect_scene
from ..ops.rays import Camera, primary_rays, screen_points
from ..ops.shading import shade_local
from ..scene.flat import FlatScene
from ..utils.jmath import dot3, safe_div, safe_sqrt


def render_soft(scene: FlatScene, camera: Camera, config: RenderConfig,
                sigma: float = 2.0, occupancy_only_geometry: bool = False):
    """[H,W,3] soft-silhouette render; ``sigma`` is the silhouette softness
    in world units (~ pixel_scale units on screen).

    ``occupancy_only_geometry``: route sphere-geometry gradients exclusively
    through the silhouette alpha, cutting the fixed-topology shading path
    (hit point/normal/reflection as functions of center/radius).  For
    mirror-like spheres that shading path is rugged (reflected checkerboard)
    and systematically biased — measured to make radii run away by tens of
    world units — while the alpha path is smooth and well-signed.  Light and
    material gradients still flow through shading."""
    if occupancy_only_geometry:
        shade_scene = scene.replace(
            sph_center=jax.lax.stop_gradient(scene.sph_center),
            sph_radius=jax.lax.stop_gradient(scene.sph_radius))
    else:
        shade_scene = scene
    w, h = config.width, config.height
    pts = screen_points(camera, w, h)
    o, v = primary_rays(camera, pts)
    P = o.shape[0]

    vlen2 = dot3(v, v)
    u = v * safe_div(jnp.ones_like(vlen2), safe_sqrt(vlen2, vlen2 > 0),
                     vlen2 > 0)[:, None]

    # --- per-sphere signed silhouette distance along each ray ---
    c, r = scene.sph_center, scene.sph_radius          # [Ns,3],[Ns]
    delta = c[None, :, :] - o[:, None, :]              # [P,Ns,3] (primary
    # rays share one origin so this stays small; Ns <= ~64)
    ud = jnp.sum(u[:, None, :] * delta, -1)            # [P,Ns]
    b2 = jnp.sum(delta * delta, -1) - ud * ud
    b = safe_sqrt(b2, b2 > 0)
    d_sil = b - r[None, :]                             # <0 inside silhouette
    in_front = jnp.logical_and(ud > 0.0, scene.sph_valid[None, :])
    d_masked = jnp.where(in_front, d_sil, 3e38)

    j = jnp.argmin(d_masked, axis=1)                   # nearest silhouette
    nsph = scene.num_spheres
    oh = (jnp.arange(nsph)[None, :] == j[:, None]).astype(u.dtype)
    d_j = jnp.sum(d_masked * oh, axis=1)
    have_sphere = d_j < 1e37
    alpha = jax.nn.sigmoid(-d_j / sigma) * have_sphere.astype(u.dtype)

    # --- the two hard renders: the normal image (exact inside the sphere,
    # reflections/shadows included) and the scene-without-the-sphere
    # background; the alpha blend creates the occupancy gradient
    # d out / d alpha = hard - background in the silhouette band.
    c_hard = render_rays_chain(shade_scene, o, v, max_depth=config.max_depth,
                               small=config.small_number,
                               attenuation_factor=config.attenuation_factor,
                               prune=config.prune)
    nt = scene.num_triangles
    excl = jnp.where(have_sphere, nt + j, -1)
    c_bg = render_rays_chain(shade_scene, o, v, max_depth=config.max_depth,
                             small=config.small_number,
                             attenuation_factor=config.attenuation_factor,
                             prune=config.prune, exclude0=excl)

    out = alpha[:, None] * c_hard + (1.0 - alpha)[:, None] * c_bg
    return out.reshape(h, w, 3)


def soft_l2_loss(params, scene: FlatScene, camera: Camera,
                 config: RenderConfig, target, sigma: float = 2.0):
    img = render_soft(params.into_scene(scene), camera, config, sigma=sigma)
    return jnp.mean((img - target) ** 2)


def fit_soft(scene: FlatScene, camera: Camera, config: RenderConfig, target,
             params=None, steps: int = 300, sigmas=(4.0, 2.0, 1.0),
             geom_lr: float = 0.3, light_lr: float = 0.5,
             mat_lr: float = 0.0, log_every: int = 0):
    """Annealed soft fit: optimize the soft loss over a sigma schedule.
    ``target`` should be the *hard* target image (the soft render converges
    to it as sigma shrinks)."""
    import optax
    from .fit import FitParams, default_fit_optimizer

    params = FitParams.from_scene(scene) if params is None else params
    opt = default_fit_optimizer(geom_lr=geom_lr, light_lr=light_lr,
                                mat_lr=mat_lr)
    state = opt.init(params)
    history = []

    for sigma in sigmas:
        @jax.jit
        def step(params, state, sigma=sigma):
            loss, g = jax.value_and_grad(soft_l2_loss)(
                params, scene, camera, config, target, sigma=sigma)
            up, state = opt.update(g, state, params)
            return optax.apply_updates(params, up), state, loss

        for i in range(steps // len(sigmas)):
            params, state, loss = step(params, state)
            history.append(float(loss))
            if log_every and i % log_every == 0:
                print(f"sigma={sigma} step {i}: loss {float(loss):.6g}")
    return params, history
