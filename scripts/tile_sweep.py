"""Tile-shape sweep for the fused Pallas forward kernel (ROADMAP item 6).

Times render_image_pallas on the headline config (full reflective scene,
1024^2, depth-3) across (block_h, block_w) candidates, using the same
scan-based timing methodology as bench.py (per-dispatch tunnel latency is
tens of ms, so N iterations run inside one jitted scan).

Usage: python scripts/tile_sweep.py [--fwd-bwd]
Prints one line per shape: block_h block_w step_ms rays_per_s.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-bwd", action="store_true",
                    help="sweep the fused fwd+bwd step instead of forward")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=3)
    def at_least_2(v):
        iv = int(v)
        if iv < 2:
            raise argparse.ArgumentTypeError(
                "--iters must be >= 2 (per-iter time comes from the "
                "difference between a 1-iter and an N-iter run)")
        return iv

    ap.add_argument("--iters", type=at_least_2, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", default=None,
                    help="fit mode for --fwd-bwd: twophase/fused/split "
                         "(default: the fit_value_and_grad default)")
    ap.add_argument("--shapes", type=str,
                    default="32x256,64x256,32x512,16x512,64x512,128x256,8x1024")
    args = ap.parse_args()

    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.scene import presets

    scene, camcfg, config = presets.full_reflective(size=args.size,
                                                    depth=args.depth)
    camera = Camera.from_config(camcfg, config.width, config.height)
    rays = args.size * args.size * config.samples

    target = None
    params0 = None
    if args.fwd_bwd:
        # target via the fast kernel — the core XLA path at 1024^2 costs
        # many minutes of (tunnel) compile for no benefit (cf. bench.py)
        target = jax.jit(lambda s: render_image_pallas(scene, camera,
                                                       config))(scene)
        float(jnp.sum(target))
        params0 = FitParams.from_scene(scene)

    shapes = []
    for tok in args.shapes.split(","):
        h, w = tok.strip().split("x")
        shapes.append((int(h), int(w)))

    for bh, bw in shapes:
        def one_iter(accum, eps, bh=bh, bw=bw):
            if args.fwd_bwd:
                p = params0.replace(sph_center=params0.sph_center + eps)
                loss, grads = fit_value_and_grad(p, scene, camera, config,
                                                 target, block_h=bh,
                                                 block_w=bw, mode=args.mode)
                return accum + loss + jnp.mean(grads.sph_radius), None
            cam2 = camera.replace(eye=camera.eye + eps)
            img = render_image_pallas(scene, cam2, config,
                                      block_h=bh, block_w=bw)
            return accum + jnp.mean(img), None

        from ray_tracer_fragment_shader_tpu.utils.timing import (
            scan_diff_median, scan_runner)

        try:
            run_1, run_n = scan_runner(one_iter, args.iters)
            timing = scan_diff_median(run_1, run_n, args.iters,
                                      reps=args.reps)
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"{bh:4d} x {bw:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        dt = max(timing["dt"], 1e-9)
        print(f"{bh:4d} x {bw:5d}  step={dt*1e3:7.2f} ms  "
              f"rays/s={rays/dt/1e6:7.1f} M  "
              f"(reps {[round(d*1e3, 2) for d in timing['dts']]} ms, "
              f"warmup {timing['warmup_s']:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
