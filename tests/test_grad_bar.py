"""BASELINE gradient bar: grad max-abs-err <= 1e-4 vs an independent f64
reference (BASELINE.md "gradient accuracy vs NumPy/CPU reference").

Ground truth: central finite differences through the float64 NumPy oracle
(oracle/numpy_ref.py — an independent implementation sharing no JAX code).
Candidate: the fully in-kernel fused Pallas adjoint (kernels/adjoint_fused).

The functional is J(params) = mean_k w_k . rgb_k over a set of *interior*
pixels: hit topology (primitive/material/lit flags at every bounce level)
constant over each pixel's 3x3 neighborhood, grazing-angle kinks (|n.s|,
|u.r| near 0) excluded — the fixed-topology convention under which the
adjoint's gradients are defined (SURVEY.md §7 "Hard parts").  J and the
parameters are O(1)-scaled (mean of unit-range pixel values; world-unit
geometry), so the raw max-abs-err is the BASELINE metric, not a rel-err
proxy.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
    fit_grads_pallas)
from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
    compact_scene, render_forward_with_residuals)
from ray_tracer_fragment_shader_tpu.ops.rays import Camera
from ray_tracer_fragment_shader_tpu.oracle.numpy_ref import (
    OracleScene, _intersect, trace_ray)
from ray_tracer_fragment_shader_tpu.scene import presets

SIZE = 128
BLOCKS = dict(block_h=8, block_w=128)
BAR = 1e-4  # BASELINE.json: grad max-abs-err vs reference


def _camera_f64(camcfg, w, h):
    eye = np.asarray(camcfg.eye, np.float64)
    look_at = np.asarray(camcfg.look_at, np.float64)
    up = np.asarray(camcfg.up, np.float64)
    look = look_at - eye
    right = np.cross(look, up); right /= np.linalg.norm(right)
    up2 = np.cross(right, look); up2 /= np.linalg.norm(up2)
    bx, by = camcfg.bottom(w, h)
    base = look_at + bx * right + by * up2
    return eye, base, right, up2, camcfg.pixel_scale


def _stable_interior_pixels(res, cfg, scene, camcfg):
    """Pixels whose residual topology is constant over a 3x3 neighborhood
    and whose level-0 shading sits away from the |.| kinks."""
    bi = np.asarray(res["bi"])            # [D+1,H,W]
    mid = np.asarray(res["mid"])
    lit = np.asarray(res["lit"])          # [L,D+1,H,W]
    planes = np.concatenate([bi, mid, lit.reshape(-1, *bi.shape[1:])], 0)
    h, w = bi.shape[1:]
    ok = np.ones((h, w), bool)
    ok[0, :] = ok[-1, :] = ok[:, 0] = ok[:, -1] = False
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            if dj == di == 0:
                continue
            shifted = np.roll(planes, (dj, di), axis=(1, 2))
            ok &= np.all(planes == shifted, axis=0)
    ok &= bi[0] >= 0.0  # primary hit

    # drop grazing shading: |n.s_hat| or |u.refl| near the abs() kink
    sc = OracleScene.from_flat(scene, small=cfg.small_number)
    eye, base, right, up2, scale = _camera_f64(camcfg, cfg.width, cfg.height)
    pix = []
    for j, i in np.argwhere(ok):
        pt = base + (i * scale) * right + (j * scale) * up2
        v = pt - eye
        hit = _intersect(sc, eye, v, cfg.small_number, cfg.prune)
        if hit is None:
            continue
        u = v / np.linalg.norm(v)
        sv = sc.light_pos[0] - hit.point
        ndots = abs(float(hit.normal @ (sv / np.linalg.norm(sv))))
        udotr = abs(float(u @ hit.refl_dir))
        if ndots > 0.05 and udotr > 0.05:
            pix.append((j, i))
    return pix


def test_fused_adjoint_grad_max_abs_err_le_1e4_vs_f64_oracle_fd():
    scene, camcfg, cfg = presets.fit_target(size=SIZE)
    scene = compact_scene(scene)
    cam = Camera.from_config(camcfg, cfg.width, cfg.height)

    img, res = render_forward_with_residuals(scene, cam, cfg, interpret=True,
                                             **BLOCKS)
    pix = _stable_interior_pixels(res, cfg, scene, camcfg)
    assert len(pix) >= 64, f"only {len(pix)} stable interior pixels"
    # stratify: direct sphere hits carry the geometry gradients, board hits
    # the material/light ones — take up to 16 of each, spread out
    bi0 = np.asarray(res["bi"])[0]
    nt = int(np.asarray(scene.tri_valid).sum())
    sph_pix = [p for p in pix if bi0[p] >= nt]
    brd_pix = [p for p in pix if bi0[p] < nt]
    assert len(sph_pix) >= 4, f"only {len(sph_pix)} stable sphere pixels"
    pick = lambda lst, n: lst[:: max(1, len(lst) // n)][:n]
    pix = pick(sph_pix, 16) + pick(brd_pix, 16)
    K = len(pix)

    rng = np.random.RandomState(0)
    w_rgb = rng.uniform(0.25, 1.0, size=(K, 3))

    # ---- candidate gradient: fused in-kernel adjoint ----
    g = np.zeros((cfg.height, cfg.width, 3), np.float32)
    for k, (j, i) in enumerate(pix):
        g[j, i] = w_rgb[k] / K
    grads = fit_grads_pallas(scene, cam, cfg, res, jnp.asarray(g),
                             interpret=True, **BLOCKS)
    grads = {k: np.asarray(v, np.float64) for k, v in grads.items()}

    # ---- ground truth: central FD through the f64 oracle ----
    eye, base, right, up2, scale = _camera_f64(camcfg, cfg.width, cfg.height)
    rays = [base + (i * scale) * right + (j * scale) * up2 - eye
            for (j, i) in pix]

    def J(flat):
        sc = OracleScene.from_flat(flat, small=cfg.small_number)
        total = 0.0
        for k in range(K):
            rgb = trace_ray(sc, eye, rays[k], cfg.max_depth,
                            cfg.small_number, cfg.attenuation_factor,
                            cfg.prune)
            total += float(w_rgb[k] @ rgb)
        return total / K

    def fd(field, idx, eps):
        arr = np.array(getattr(scene, field), np.float64)
        hi, lo = arr.copy(), arr.copy()
        hi[idx] += eps
        lo[idx] -= eps
        jp = J(scene.replace(**{field: hi}))
        jm = J(scene.replace(**{field: lo}))
        return (jp - jm) / (2.0 * eps)

    checks = []  # (label, fused, fd)
    ns = scene.num_spheres
    m = scene.num_materials
    for i in range(ns):
        for a in range(3):
            checks.append((f"sph_center[{i},{a}]",
                           grads["sph_center"][i, a],
                           fd("sph_center", (i, a), 1e-3)))
        checks.append((f"sph_radius[{i}]", grads["sph_radius"][i],
                       fd("sph_radius", (i,), 1e-3)))
    for a in range(3):
        checks.append((f"light_pos[0,{a}]", grads["light_pos"][0, a],
                       fd("light_pos", (0, a), 1e-2)))
    for j in range(m):
        for a in range(3):
            for field in ("mat_ambient", "mat_diffuse", "mat_specular"):
                checks.append((f"{field}[{j},{a}]", grads[field][j, a],
                               fd(field, (j, a), 1e-4)))

    fused = np.array([c[1] for c in checks])
    truth = np.array([c[2] for c in checks])
    err = np.abs(fused - truth)
    worst = int(np.argmax(err))
    # the bar is meaningful only if the gradients aren't all ~0
    assert np.abs(truth).max() > 1e-3, "degenerate test: all-zero gradients"
    assert err.max() <= BAR, (
        f"max-abs-err {err.max():.3e} > {BAR} at {checks[worst][0]} "
        f"(fused {checks[worst][1]:.6e}, fd {checks[worst][2]:.6e}); "
        f"|grad|_max={np.abs(truth).max():.3e}")
