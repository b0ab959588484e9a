"""Depth sweep / compile-latency proof (VERDICT r1 item 7).

Compiles and times the chain kernel at the reference's MAX_DEPTH=5
(Hw4/MySdlApplication.cpp:48) and the bounce-tree kernel at depth>=3
(2^(depth+1)-1 inlined node visits) on the real TPU, recording compile
seconds and step time.  Results are committed to PERF.md.

Usage: python scripts/depth_sweep.py [--size 1024]
"""
from __future__ import annotations

import argparse
import json
import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def time_render(scene, camera, config, iters=32, reps=3):
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.utils.timing import (
        scan_diff_median, scan_runner)

    def one_iter(accum, eps):
        cam2 = camera.replace(eye=camera.eye + eps)
        img = render_image_pallas(scene, cam2, config)
        return accum + jnp.mean(img), None

    run_1, run_n = scan_runner(one_iter, iters)
    timing = scan_diff_median(run_1, run_n, iters, reps=reps)
    # sub-ms rows at 32 iters sit at the tunnel-noise floor (cf.
    # roofline_validate.py): re-estimate with enough iterations that the
    # scan difference dominates
    if timing["dt"] < 1e-3 and iters < 256:
        run_1, run_n = scan_runner(one_iter, 256)
        timing = scan_diff_median(run_1, run_n, 256, reps=reps)
    return timing["warmup_s"], max(timing["dt"], 1e-9)


def time_fused_fwd_bwd(scene, camera, config, iters=32, reps=3):
    """Compile + step time of the single-dispatch fused fwd+loss+bwd kernel
    (VERDICT r2 item 6: the depth-5 compile proof must cover the fused
    kernel, not just the forward)."""
    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.utils.timing import (
        scan_diff_median, scan_runner)

    target = jax.jit(lambda s: render_image_pallas(s, camera, config))(scene)
    jax.block_until_ready(target)
    params0 = FitParams.from_scene(scene)

    def one_iter(accum, eps):
        p = params0.replace(sph_center=params0.sph_center + eps)
        loss, grads = fit_value_and_grad(p, scene, camera, config, target)
        return accum + loss + jnp.mean(grads.sph_radius), None

    run_1, run_n = scan_runner(one_iter, iters)
    timing = scan_diff_median(run_1, run_n, iters, reps=reps)
    return timing["warmup_s"], max(timing["dt"], 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tree-size", type=int, default=512)
    ap.add_argument("--out", default="artifacts/depth_sweep.json")
    args = ap.parse_args()

    import dataclasses

    from ray_tracer_fragment_shader_tpu.config import RenderConfig
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.scene import (Material, SceneBuilder,
                                                      presets)
    from ray_tracer_fragment_shader_tpu.scene.presets import _cam

    rows = []

    # chain kernel at depths 2/3/5 on the headline scene
    for depth in (2, 3, 5):
        scene, camcfg, cfg = presets.full_reflective(size=args.size,
                                                     depth=depth)
        cam = Camera.from_config(camcfg, cfg.width, cfg.height)
        compile_s, dt = time_render(scene, cam, cfg)
        rays = args.size * args.size / dt
        rows.append(dict(kernel="chain", depth=depth, size=args.size,
                         compile_s=round(compile_s, 1),
                         step_ms=round(dt * 1e3, 2),
                         mrays_per_s=round(rays / 1e6, 1)))
        print(json.dumps(rows[-1]), flush=True)

    # fused single-dispatch fwd+loss+bwd at depths 2/3/5 (reference
    # MAX_DEPTH=5, Hw4/MySdlApplication.cpp:48)
    for depth in (2, 3, 5):
        scene, camcfg, cfg = presets.full_reflective(size=args.size,
                                                     depth=depth)
        cam = Camera.from_config(camcfg, cfg.width, cfg.height)
        compile_s, dt = time_fused_fwd_bwd(scene, cam, cfg)
        rays = args.size * args.size / dt
        rows.append(dict(kernel="fused_fwd_bwd", depth=depth, size=args.size,
                         compile_s=round(compile_s, 1),
                         step_ms=round(dt * 1e3, 2),
                         mrays_per_s=round(rays / 1e6, 1)))
        print(json.dumps(rows[-1]), flush=True)

    # bounce-tree kernel (fractional transparency) at depths 2/3/4
    glass = Material(ambient=(0.02, 0.02, 0.02), diffuse=(0.1, 0.1, 0.2),
                     specular=(0.4, 0.4, 0.4), transparency=(0.5, 0.5, 0.5),
                     refraction=0.9)
    tree_scene = (SceneBuilder().add_checkerboard()
                  .add_sphere("d5", material=glass).add_sphere("c3")
                  .add_light("b6").build())
    for depth in (2, 3, 4):
        cfg = RenderConfig(width=args.tree_size, height=args.tree_size,
                           max_depth=depth, samples=1)
        cam = Camera.from_config(_cam(args.tree_size), args.tree_size,
                                 args.tree_size)
        compile_s, dt = time_render(tree_scene, cam, cfg)
        rays = args.tree_size * args.tree_size / dt
        rows.append(dict(kernel="tree", depth=depth, size=args.tree_size,
                         nodes=2 ** (depth + 1) - 1,
                         compile_s=round(compile_s, 1),
                         step_ms=round(dt * 1e3, 2),
                         mrays_per_s=round(rays / 1e6, 1)))
        print(json.dumps(rows[-1]), flush=True)

    out = dict(device=jax.devices()[0].device_kind, rows=rows)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
