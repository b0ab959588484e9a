"""The BASELINE gradient bar on the REAL TPU kernel path (VERDICT r2
item 4): tests/test_grad_bar.py asserts max-abs-err <= 1e-4 in interpret
mode, where ``fast_recip=not interpret`` disables the approx-reciprocal +
Newton step (kernels/render_pallas.py) — so the chip's actual arithmetic
was never held to the bar.  This script runs the SAME harness
(oracle/gradcheck.py: stable interior pixels, f64-oracle central FD) with
the kernels executing on the TPU, fast_recip on:

  * chain scene (fit_target), fused two-phase adjoint;
  * fractional-transparency TREE scene with 2 lights, in-kernel tree
    adjoint (recompute path);
  * camera-eye gradients through the XLA replay vjp.

Writes artifacts/grad_bar_tpu.json and exits nonzero if any bar fails.

Usage:  python scripts/grad_bar_tpu.py [--size 128]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_chain(size):
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_grads_pallas)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        compact_scene, render_forward_with_residuals)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.oracle.gradcheck import (
        make_functional, param_checks, stable_interior_pixels,
        stratified_pick, summarize)
    from ray_tracer_fragment_shader_tpu.scene import presets

    scene, camcfg, cfg = presets.fit_target(size=size)
    scene = compact_scene(scene)
    cam = Camera.from_config(camcfg, cfg.width, cfg.height)
    # interpret=False on TPU: the fast_recip kernel arithmetic
    img, res = render_forward_with_residuals(scene, cam, cfg,
                                             interpret=False)
    pix = stable_interior_pixels(res, cfg, scene, camcfg)
    pix, _ = stratified_pick(pix, res, scene, n_each=16)
    rng = np.random.RandomState(0)
    w_rgb = rng.uniform(0.25, 1.0, size=(len(pix), 3))
    g = np.zeros((cfg.height, cfg.width, 3), np.float32)
    for k, (j, i) in enumerate(pix):
        g[j, i] = w_rgb[k] / len(pix)
    grads = fit_grads_pallas(scene, cam, cfg, res, jnp.asarray(g),
                             interpret=False)
    grads = {k: np.asarray(v, np.float64) for k, v in grads.items()}
    J = make_functional(scene, cfg, camcfg, pix, w_rgb)
    return summarize(param_checks(J, scene, grads))


def run_tree(size):
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        recompute_grads_pallas)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        compact_scene, render_forward_with_residuals)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.oracle.gradcheck import (
        make_functional, param_checks, stable_interior_pixels,
        stratified_pick, summarize)
    from ray_tracer_fragment_shader_tpu.scene import (Material, SceneBuilder,
                                                      presets)

    glass = Material(ambient=(0.02, 0.02, 0.02), diffuse=(0.1, 0.1, 0.2),
                     specular=(0.4, 0.4, 0.4), transparency=(0.5, 0.5, 0.5),
                     refraction=0.9)
    scene = (SceneBuilder().add_checkerboard()
             .add_sphere("d5", material=glass).add_sphere("c3")
             .add_light("b6").add_light("f7", color=(0.8, 0.9, 1.0))
             .build())
    scene = compact_scene(scene)
    camcfg = presets._cam(size)
    cfg = dataclasses.replace(presets.fit_target(size=size)[2], max_depth=2)
    cam = Camera.from_config(camcfg, cfg.width, cfg.height)
    img, res = render_forward_with_residuals(scene, cam, cfg,
                                             interpret=False)
    pix = stable_interior_pixels(res, cfg, scene, camcfg)
    pix, _ = stratified_pick(pix, res, scene, n_each=8)
    rng = np.random.RandomState(0)
    w_rgb = rng.uniform(0.25, 1.0, size=(len(pix), 3))
    g = np.zeros((cfg.height, cfg.width, 3), np.float32)
    for k, (j, i) in enumerate(pix):
        g[j, i] = w_rgb[k] / len(pix)
    grads = recompute_grads_pallas(scene, cam, cfg, jnp.asarray(g),
                                   interpret=False)
    grads = {k: np.asarray(v, np.float64) for k, v in grads.items()}
    J = make_functional(scene, cfg, camcfg, pix, w_rgb)
    return summarize(param_checks(J, scene, grads))


def run_camera(size):
    from ray_tracer_fragment_shader_tpu.kernels.adjoint import (
        render_image_diff)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        compact_scene, render_forward_with_residuals)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.oracle.gradcheck import (
        fd_eye, make_functional, stable_interior_pixels, stratified_pick,
        summarize)
    from ray_tracer_fragment_shader_tpu.scene import presets

    scene, camcfg, cfg = presets.fit_target(size=size)
    scene = compact_scene(scene)
    cam = Camera.from_config(camcfg, cfg.width, cfg.height)
    img, res = render_forward_with_residuals(scene, cam, cfg,
                                             interpret=False)
    pix = stable_interior_pixels(res, cfg, scene, camcfg)
    pix, _ = stratified_pick(pix, res, scene, n_each=8)
    rng = np.random.RandomState(1)
    w_rgb = rng.uniform(0.25, 1.0, size=(len(pix), 3))
    jj = jnp.asarray([p[0] for p in pix])
    ii = jnp.asarray([p[1] for p in pix])
    w = jnp.asarray(w_rgb, jnp.float32)

    def img_J(camera):
        img = render_image_diff(scene, camera, cfg)
        return jnp.sum(w * img[jj, ii]) / len(pix)

    g_cam = jax.grad(img_J)(cam)
    J = make_functional(scene, cfg, camcfg, pix, w_rgb)
    checks = [(f"eye[{a}]", float(np.asarray(g_cam.eye)[a]),
               fd_eye(J, a, 1e-3)) for a in range(3)]
    return summarize(checks)


def package_content_hash(repo: str) -> str:
    """sha256 over the package's .py sources (path + content, sorted) —
    identifies exactly the kernel code a run executed, independent of git
    state (tests/test_tpu_gates.py recomputes it to validate the committed
    artifact)."""
    import hashlib
    pkg = os.path.join(repo, "ray_tracer_fragment_shader_tpu")
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg)):
        dirnames.sort()
        for fn in sorted(filenames):
            if not fn.endswith((".py", ".cpp", ".h")):
                continue
            p = os.path.join(dirpath, fn)
            h.update(os.path.relpath(p, pkg).encode())
            with open(p, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--bar", type=float, default=1e-4)
    ap.add_argument("--out", default="artifacts/grad_bar_tpu.json")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", (
        "this script asserts the bar on the real TPU kernel (fast_recip "
        "on); run tests/test_grad_bar.py for the interpret-mode bar")

    import datetime
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        sha = subprocess.check_output(["git", "rev-parse", "HEAD"],
                                      cwd=repo, text=True).strip()
    except Exception:
        sha = "unknown"
    out = dict(device=jax.devices()[0].device_kind, size=args.size,
               bar=args.bar, fast_recip=True, git_sha=sha,
               # content hash of the package SOURCE this run executed —
               # stale-proof provenance (a commit SHA is one commit behind
               # by construction when the artifact itself gets committed)
               package_hash=package_content_hash(repo),
               date=datetime.date.today().isoformat())
    ok = True
    for name, fn, size in (("chain_fit_target", run_chain, args.size),
                           ("tree_two_lights", run_tree, 64),
                           ("camera_eye", run_camera, 64)):
        s = fn(size)
        s["pass"] = bool(s["max_abs_err"] <= args.bar)
        ok &= s["pass"]
        out[name] = s
        print(name, json.dumps(s), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
