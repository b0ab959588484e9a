"""A/B the RTFS_SWEEP_UNROLL knob (render_pallas._sweep_loop) on the
headline config: fori_loop sweeps vs fully-unrolled sweeps, forward and
fused fwd+bwd.  The unroll removes per-iteration scalar-core bookkeeping
(loop branch, dynamic SMEM addressing) at the cost of program size; this
measures whether that bookkeeping is a real part of the gap to the
register-resident mix-rate SOL (utils/roofline.py).

Usage: python scripts/unroll_probe.py [--size 1024] [--iters 32] [--reps 3]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--block", type=str, default="32x256")
    args = ap.parse_args()
    bh, bw = (int(t) for t in args.block.split("x"))

    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.scene import presets
    from ray_tracer_fragment_shader_tpu.utils.timing import (
        scan_diff_median, scan_runner)

    scene, camcfg, config = presets.full_reflective(size=args.size,
                                                    depth=args.depth)
    camera = Camera.from_config(camcfg, config.width, config.height)
    target = jax.jit(lambda s: render_image_pallas(
        s, camera, config, block_h=bh, block_w=bw))(scene)
    float(jnp.sum(target))
    params0 = FitParams.from_scene(scene)

    for unroll in ("0", "1"):
        os.environ["RTFS_SWEEP_UNROLL"] = unroll  # read at trace time
        for mode in ("fwd", "fwd_bwd"):
            def one_iter(accum, eps):
                if mode == "fwd":
                    cam2 = camera.replace(eye=camera.eye + eps)
                    img = render_image_pallas(scene, cam2, config,
                                              block_h=bh, block_w=bw)
                    return accum + jnp.mean(img), None
                p = params0.replace(sph_center=params0.sph_center + eps)
                loss, grads = fit_value_and_grad(
                    p, scene, camera, config, target,
                    block_h=bh, block_w=bw)
                return accum + loss + jnp.mean(grads.sph_radius), None

            run_1, run_n = scan_runner(one_iter, args.iters)
            timing = scan_diff_median(run_1, run_n, args.iters,
                                      reps=args.reps)
            print(json.dumps(dict(
                unroll=unroll == "1", mode=mode, block=[bh, bw],
                step_ms=round(timing["dt"] * 1e3, 3),
                reps_ms=[round(d * 1e3, 3) for d in timing["dts"]],
                warmup_s=round(timing["warmup_s"], 1))), flush=True)


if __name__ == "__main__":
    main()
