"""Time the reference's OWN default workload on the kernel path: the demo
scene (initScene) at 500x500, MAX_DEPTH=5, 16-sample ADAPTIVE supersampling
— exactly Hw4/MySdlApplication.cpp:570 (window), :48 (MAX_DEPTH), :52
(SUPER_SAMPLE_NUMBER) and :1294-1311 (the adaptive loop) — and write
artifacts/bench_reference_demo.json (VERDICT r4 missing #3).

The reference renders this frame single-threaded on a 2014 CPU in minutes;
this pins "the reference's own frame in N ms on one TPU chip".

Usage: python scripts/bench_reference_demo.py [--iters 8] [--reps 3]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="artifacts/bench_reference_demo.json")
    args = ap.parse_args()

    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.scene import presets
    from ray_tracer_fragment_shader_tpu.utils.timing import (
        scan_diff_median, scan_runner)

    scene, camcfg, cfg = presets.reference_demo()
    # the reference's own defaults, verbatim
    cfg = dataclasses.replace(cfg, width=500, height=500, max_depth=5,
                              samples=16, adaptive=True)
    camera = Camera.from_config(camcfg, cfg.width, cfg.height)

    def one_iter(accum, eps):
        cam2 = camera.replace(eye=camera.eye + eps)
        img = render_image_pallas(scene, cam2, cfg)
        return accum + jnp.mean(img), None

    run_1, run_n = scan_runner(one_iter, args.iters)
    timing = scan_diff_median(run_1, run_n, args.iters, reps=args.reps)
    dt = max(timing["dt"], 1e-9)
    rays = cfg.width * cfg.height * cfg.samples

    out = dict(
        metric="reference_default_frame_ms",
        workload="initScene demo, 500x500, depth 5, 16-sample adaptive "
                 "(MySdlApplication.cpp:570,48,52,1294-1311)",
        frame_time_ms=round(dt * 1e3, 3),
        frame_time_ms_reps=[round(d * 1e3, 3) for d in timing["dts"]],
        rays_per_s=round(rays / dt, 1),
        ray_accounting="size*size*samples primary rays (all 16 samples are "
                       "computed SPMD; convergence masks accumulation)",
        device=jax.devices()[0].device_kind,
        timing=dict(iters=args.iters, reps=args.reps,
                    method=timing["method"],
                    spread=round(timing["spread"], 4)),
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
