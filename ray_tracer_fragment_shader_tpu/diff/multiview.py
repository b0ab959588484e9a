"""Multi-view differentiable fitting — the robust config-4 recipe.

Single-view recovery of mirror-like sphere geometry (BASELINE config 4) is
ill-conditioned: translation along the viewing ray barely changes the image
(depth near-unidentifiability) and reflections make the photometric loss
rugged.  The reference has no notion of any of this (it is a forward-only
CPU renderer, Hw4/MySdlApplication.cpp:1184-1324); this module is where the
"differentiable" half of the framework earns its keep.

The recipe (ROADMAP round-1 item 1):

* **Multi-view targets** — a handful of cameras orbiting the look-at point.
  A second azimuth turns the depth direction of view A into the lateral
  direction of view B, making the joint loss well-conditioned in all three
  center coordinates.
* **Multiscale loss pyramid** — fit coarse-to-fine.  At 64^2 the silhouette
  band of a sphere is a few pixels wide in *screen* units but enormous in
  world units, so the soft-silhouette gradient (diff/soft.py) has a wide
  basin; each finer stage starts inside the previous basin.
* **Soft-silhouette annealing within each stage** (sigma schedule), ending
  with hard-render polish at the finest scale.
* **Stochastic restarts** — several jittered initializations race through
  the coarsest stage; the best continues.  Cheap (coarse renders) and
  effective against reflection-induced local minima.

Everything here is plain JAX over the existing renderers: the per-view
renders are independent programs XLA fuses per stage, and each stage is one
jitted step function reused across iterations.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CameraConfig, RenderConfig
from ..core.renderer import render_image
from ..diff.fit import FitParams, default_fit_optimizer
from ..diff.soft import render_soft
from ..ops.rays import Camera
from ..scene.flat import FlatScene


# ---------------------------------------------------------------------------
# Views
# ---------------------------------------------------------------------------

def orbit_views(base: CameraConfig, n_views: int,
                span_deg: float = 90.0) -> List[CameraConfig]:
    """``n_views`` cameras obtained by rotating the eye about the vertical
    axis through the look-at point, spanning ``span_deg`` degrees centred on
    the base azimuth.  View 0 is the base camera when n_views is odd."""
    if n_views == 1:
        return [base]
    eye = np.asarray(base.eye, np.float64)
    look = np.asarray(base.look_at, np.float64)
    rel = eye - look
    out = []
    offsets = np.linspace(-span_deg / 2.0, span_deg / 2.0, n_views)
    # keep the base view first so single-view comparisons share view 0
    order = np.argsort(np.abs(offsets), kind="stable")
    for k in order:
        th = math.radians(float(offsets[k]))
        c, s = math.cos(th), math.sin(th)
        rot = np.array([c * rel[0] + s * rel[2], rel[1],
                        -s * rel[0] + c * rel[2]])
        out.append(dataclasses.replace(base, eye=tuple(look + rot)))
    return out


def render_views(scene: FlatScene, views: Sequence[CameraConfig],
                 config: RenderConfig) -> jnp.ndarray:
    """Hard render per view -> [V,H,W,3] (the fit targets)."""
    imgs = [render_image(scene, v, config) for v in views]
    return jnp.stack(imgs, 0)


# ---------------------------------------------------------------------------
# Multiscale pyramid
# ---------------------------------------------------------------------------

def downsample(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Decimate an [H,W,3] (or [V,H,W,3]) image to size^2 by strided point
    sampling; H must be a multiple of ``size``.

    Decimation, not box filtering, on purpose: a coarse render at pixel
    scale ``f*s`` samples **exactly** the full-res pixel grid strided by
    ``f`` (screen points are ``base + i*scale*right``, ops/rays.py), so the
    decimated target makes the coarse loss exactly zero at the true
    parameters.  A box-filtered target instead carries an aliasing-bias
    floor (checkerboard edges) that dwarfs the parameter signal at coarse
    scales and corrupts the gradients."""
    h = img.shape[-3]
    if h == size:
        return img
    if h % size:
        raise ValueError(f"size {size} must divide image height {h}")
    f = h // size
    return img[..., ::f, ::f, :]


def _stage_config(config: RenderConfig, size: int) -> RenderConfig:
    return dataclasses.replace(config, width=size, height=size)


def _stage_views(views: Sequence[CameraConfig], full_size: int,
                 size: int) -> List[CameraConfig]:
    """Same world-space frame at a coarser resolution: scale world units per
    pixel so frame width (pixels * pixel_scale) is preserved."""
    scale = full_size / size
    return [dataclasses.replace(v, pixel_scale=v.pixel_scale * scale)
            for v in views]


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def multiview_loss(params: FitParams, scene: FlatScene,
                   cameras: Sequence[Camera], config: RenderConfig,
                   targets: jnp.ndarray, sigma: Optional[float]) -> jnp.ndarray:
    """Mean L2 over views; soft-silhouette render when sigma is given (world
    units), hard render when sigma is None.

    Geometry must be fit in soft mode: the hard render's fixed-topology
    gradients carry no occupancy term, so the optimizer compensates
    silhouette mismatch through shading instead — measured here to *diverge*
    (sphere radii run away by tens of world units).  In soft mode both
    centers and radii get honest occupancy gradients through the silhouette
    alpha (d_sil = b - r, diff/soft.py).  Hard mode is for light/material
    polish with frozen geometry."""
    if sigma is None:
        params = params.replace(
            sph_radius=jax.lax.stop_gradient(params.sph_radius),
            sph_center=jax.lax.stop_gradient(params.sph_center))
    s = params.into_scene(scene)
    total = 0.0
    for k, cam in enumerate(cameras):
        if sigma is None:
            img = render_image(s, cam, config)
        else:
            img = render_soft(s, cam, config, sigma=sigma,
                              occupancy_only_geometry=True)
        total = total + jnp.mean((img - targets[k]) ** 2)
    return total / len(cameras)


# ---------------------------------------------------------------------------
# The fit driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MultiviewFitResult:
    params: FitParams
    history: List[float]
    stage_log: List[Dict]
    restart_losses: List[float]


def _make_step(scene, cameras, config, targets, sigma, opt):
    def loss_fn(params):
        return multiview_loss(params, scene, cameras, config, targets, sigma)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, state = opt.update(g, state, params)
        return optax.apply_updates(params, up), state, loss
    return step, jax.jit(loss_fn)


def _run_stage(params, step, loss_fn, opt, steps, history):
    """Run one pyramid stage with a FRESH optimizer state and best-params
    tracking: every evaluated loss (each step's pre-update loss plus one
    final evaluation) is a candidate, and the stage returns the best —
    so a stage can never end worse than it started under its own
    objective.  Returns (params, entry_loss, best_loss).

    Both guards exist because the round-3 artifact showed the old
    behaviour (one Adam state threaded through every stage, last iterate
    kept) actively RAISING the loss in every hard-polish stage: stale
    soft-stage momentum walks the parameters away from the optimum and
    nothing claws it back."""
    state = opt.init(params)
    best_p, best_l, entry_l = params, None, None
    for _ in range(steps):
        new_params, state, loss = step(params, state)
        l = float(loss)          # loss at `params`, pre-update
        history.append(l)
        if entry_l is None:
            entry_l = l
        if best_l is None or l < best_l:
            best_p, best_l = params, l
        params = new_params
    l = float(loss_fn(params))   # the last iterate is also a candidate
    history.append(l)
    if best_l is None or l < best_l:
        best_p, best_l = params, l
    return best_p, entry_l if entry_l is not None else l, best_l


def _jitter_params(params: FitParams, rng: np.random.RandomState,
                   center_scale: float, radius_scale: float,
                   light_scale: float) -> FitParams:
    ns = params.sph_center.shape[0]
    nl = params.light_pos.shape[0]
    return params.replace(
        sph_center=params.sph_center
        + jnp.asarray(rng.uniform(-center_scale, center_scale, (ns, 3)),
                      jnp.float32),
        sph_radius=params.sph_radius
        * jnp.asarray(1.0 + rng.uniform(-radius_scale, radius_scale, ns),
                      jnp.float32),
        light_pos=params.light_pos
        + jnp.asarray(rng.uniform(-light_scale, light_scale, (nl, 3)),
                      jnp.float32))


def fit_multiview(scene: FlatScene, views: Sequence[CameraConfig],
                  config: RenderConfig, targets,
                  init: Optional[FitParams] = None,
                  sizes: Sequence[int] = (64, 128),
                  sigmas: Sequence[Optional[float]] = (1.5, 1.0, None),
                  steps_per_sigma: int = 60,
                  restarts: int = 4, restart_steps: int = 40,
                  restart_jitter: Tuple[float, float, float] = (15.0, 0.1, 20.0),
                  geom_lr: float = 0.6, light_lr: float = 1.0,
                  mat_lr: float = 0.0, seed: int = 0,
                  light_polish_steps: int = 120,
                  log_every: int = 0) -> MultiviewFitResult:
    """Coarse-to-fine, sigma-annealed, restarted multi-view fit.

    ``targets``: [V,H,W,3] hard renders at the *full* config resolution.
    ``sizes``: pyramid stages, coarse->fine; the full resolution is appended
    automatically when absent.  Each stage runs the whole ``sigmas``
    schedule; sigma is in **pixels of the current stage** (converted to
    world units via the stage pixel scale, so coarse stages get wide
    world-space occupancy basins automatically).  Keep sigma >= ~1 px: a
    sub-pixel band under-samples the sigmoid and the geometry random-walks
    (measured).  ``None`` = hard-render polish: geometry frozen (see
    multiview_loss), lights/materials refined through exact shading.

    Every stage starts from a FRESH optimizer state and keeps its best
    iterate (``_run_stage``), so no stage can end worse than it started
    under its own objective — ``stage_log`` records ``loss_entry`` and
    ``loss`` (final = best) per stage, with ``loss <= loss_entry`` by
    construction.  After the pyramid, ``light_polish_steps`` of a
    LIGHT-ONLY hard-render stage run at the full resolution (geometry
    frozen by hard mode, materials frozen by a zero rate): the light
    position is the one parameter group the soft stages systematically
    bias (soft-silhouette shading trades edge darkening against light
    distance), so it gets a dedicated, gated refinement."""
    targets = jnp.asarray(targets)
    full = config.width
    if config.height != full:
        raise ValueError("multiview fit assumes square images")
    sizes = [s for s in sizes if s < full] + [full]
    init = FitParams.from_scene(scene) if init is None else init
    opt = default_fit_optimizer(geom_lr=geom_lr, light_lr=light_lr,
                                mat_lr=mat_lr)

    def stage_pieces(size):
        cfg_s = _stage_config(config, size)
        svs = _stage_views(views, full, size)
        cams = [Camera.from_config(v, size, size) for v in svs]
        tgts = downsample(targets, size)
        return cfg_s, cams, tgts, float(svs[0].pixel_scale)

    # --- restart race through the coarsest stage, first sigma ---
    cfg0, cams0, tgt0, px0 = stage_pieces(sizes[0])
    sigma0 = None if sigmas[0] is None else sigmas[0] * px0
    race_step, _ = _make_step(scene, cams0, cfg0, tgt0, sigma0, opt)
    rng = np.random.RandomState(seed)
    candidates = [init] + [
        _jitter_params(init, rng, *restart_jitter)
        for _ in range(max(restarts - 1, 0))]
    restart_losses: List[float] = []
    best_params, best_loss = None, np.inf
    for cand in candidates:
        p, st = cand, opt.init(cand)
        loss = np.inf
        for _ in range(restart_steps):
            p, st, loss = race_step(p, st)
        loss = float(loss)
        restart_losses.append(loss)
        if loss < best_loss:
            best_params, best_loss = p, loss

    # --- pyramid with sigma annealing ---
    params = best_params
    history: List[float] = []
    stage_log: List[Dict] = []
    for size in sizes:
        cfg_s, cams, tgts, px = stage_pieces(size)
        for sigma_px in sigmas:
            sigma = None if sigma_px is None else sigma_px * px
            step, loss_fn = _make_step(scene, cams, cfg_s, tgts, sigma, opt)
            params, l_entry, l_best = _run_stage(params, step, loss_fn, opt,
                                                 steps_per_sigma, history)
            if log_every:
                print(f"size={size} sigma_px={sigma_px}: "
                      f"loss {l_entry:.6g} -> {l_best:.6g}")
            stage_log.append(dict(size=size, sigma_px=sigma_px,
                                  sigma_world=sigma, loss_entry=l_entry,
                                  loss=l_best))

    # --- light-only polish: hard render, full size, fresh Adam ---
    if (light_polish_steps > 0 and light_lr > 0
            and params.light_pos.shape[0] > 0):
        cfg_f, cams_f, tgts_f, _ = stage_pieces(sizes[-1])
        opt_l = default_fit_optimizer(geom_lr=0.0, light_lr=light_lr,
                                      mat_lr=0.0)
        step_l, loss_l = _make_step(scene, cams_f, cfg_f, tgts_f, None,
                                    opt_l)
        params, l_entry, l_best = _run_stage(params, step_l, loss_l, opt_l,
                                             light_polish_steps, history)
        if log_every:
            print(f"light polish: loss {l_entry:.6g} -> {l_best:.6g}")
        stage_log.append(dict(size=sizes[-1], sigma_px=None,
                              sigma_world=None, stage="light_polish",
                              loss_entry=l_entry, loss=l_best))
    return MultiviewFitResult(params=params, history=history,
                              stage_log=stage_log,
                              restart_losses=restart_losses)


# ---------------------------------------------------------------------------
# Recovery metrics
# ---------------------------------------------------------------------------

def recovery_report(params: FitParams, true_scene: FlatScene) -> Dict[str, float]:
    """Quantified recovery error vs the scene that generated the targets:
    worst-sphere center distance, worst relative radius error, worst light
    distance (world units; one board square = 40).  Only *valid* spheres
    count — FlatScene pads the sphere table, and padding rows are invisible
    to the renderer and hence to every gradient."""
    valid = np.asarray(true_scene.sph_valid).astype(bool)
    c_err = np.linalg.norm(
        np.asarray(params.sph_center) - np.asarray(true_scene.sph_center),
        axis=-1)[valid]
    r_err = np.abs(np.asarray(params.sph_radius)
                   - np.asarray(true_scene.sph_radius))[valid]
    r_rel = r_err / np.maximum(np.asarray(true_scene.sph_radius)[valid], 1e-9)
    l_err = np.linalg.norm(
        np.asarray(params.light_pos) - np.asarray(true_scene.light_pos),
        axis=-1)
    return dict(center_err_max=float(c_err.max()),
                center_err_mean=float(c_err.mean()),
                radius_err_max=float(r_err.max()),
                radius_rel_err_max=float(r_rel.max()),
                light_err_max=float(l_err.max()) if l_err.size else 0.0)
