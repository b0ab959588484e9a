"""Headline benchmark: rays/s/chip, forward+backward, on the full reflective
scene at 1024^2 with depth-3 reflections (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N, ...}

``vs_baseline`` = ``sol_fraction``: the reference publishes no numbers (2014
homework, no benchmarks — SURVEY.md section 6), so the meaningful baseline is
the hardware speed of light: measured step time vs the roofline step time
(exact static VPU-op count of the kernels / measured VPU issue rate on this
chip — utils/roofline.py).  1.0 = at speed of light; BASELINE.json's bar is
>= 0.90.  Self-describing extras: ray accounting (primary rays only —
``size*size*samples``; shadow/bounce rays are part of the per-ray work, not
the ray count), device, kernel block shape, per-pixel op counts and the
measured VPU rate.

Timing methodology (utils/timing.py — shared with the tile/depth/scaling
sweeps): all iterations run inside a single jitted lax.scan (each
iteration's params perturbed by a tiny iteration-dependent epsilon to defeat
CSE), the final scalar is fetched to force completion, the per-iteration
time is the difference between a 1-iter and an N-iter run (dispatch latency
cancels), N >= 32, and the reported time is the MEDIAN of BENCH_REPS
independent estimates with the spread emitted — a single small-N estimate
carries ±8% tunnel noise, more than the 0.90-bar margin.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: Mosaic/XLA compiles of the big render
# programs cost minutes through the tunnel; pay them once per machine.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    depth = int(os.environ.get("BENCH_DEPTH", "3"))
    iters = int(os.environ.get("BENCH_ITERS", "64"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    forward_only = os.environ.get("BENCH_FORWARD_ONLY", "0") == "1"
    # backend: the fused Pallas kernels (default) or XLA
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    # adjoint: "twophase" = packed-residual forward + cotangent-prologue
    # backward kernel (default, fastest — PERF.md §2); "fused" =
    # single-kernel fwd+loss+adjoint; "fused2" = the round-3 two-phase
    # (unpacked residuals + XLA cotangent glue); anything else = XLA replay
    adjoint = os.environ.get("BENCH_ADJOINT", "twophase")

    from ray_tracer_fragment_shader_tpu.core.renderer import render_image
    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams, l2_loss
    from ray_tracer_fragment_shader_tpu.kernels.adjoint import l2_loss_pallas
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.scene import presets

    # preset: full_reflective (BASELINE config 3, the headline) or
    # procedural_spheres (BASELINE config 5: 64 spheres, 4096^2, depth 3)
    preset = os.environ.get("BENCH_PRESET", "full_reflective")
    if preset == "procedural_spheres":
        scene, camcfg, config = presets.procedural_spheres(size=size,
                                                           depth=depth)
    else:
        scene, camcfg, config = presets.full_reflective(size=size,
                                                        depth=depth)
    if os.environ.get("BENCH_CHUNK"):
        config = dataclasses.replace(config,
                                     chunk_size=int(os.environ["BENCH_CHUNK"]))
    camera = Camera.from_config(camcfg, config.width, config.height)

    target = None
    if not forward_only:
        # target via the fast kernel (the core XLA path at 4096^2 would
        # dominate bench wall-clock for no benefit)
        target = jax.jit(lambda s: render_image_pallas(s, camera, config))(
            scene)
        float(jnp.sum(target))  # force completion

    params0 = FitParams.from_scene(scene)

    render_fwd = (render_image_pallas if backend == "pallas"
                  else render_image)
    loss_fn = l2_loss_pallas if backend == "pallas" else l2_loss

    # tile shape: env override, else the scene's measured default for the
    # phase actually being timed (kernels/render_pallas.py::default_blocks
    # — e.g. the fused fwd+bwd kernel on BASELINE config 5 wants 64x256,
    # while forward-only and the two-phase forward want 8x512)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        compact_scene, default_blocks)
    blk_phase = ("fwd" if forward_only or adjoint != "fused" else "fused")
    dbh, dbw = default_blocks(compact_scene(scene), phase=blk_phase,
                              depth=depth)
    bh = int(os.environ.get("BENCH_BLOCK_H", dbh))
    bw = int(os.environ.get("BENCH_BLOCK_W", dbw))

    # step-invariant padded input planes (ray dirs, target, mask): prepared
    # once and reused per step, the same configuration a real fit loop gets
    # from diff/fit.py::make_fit_step_pallas (which calls
    # prepare_fit_inputs once at construction) — XLA does not hoist these
    # out of the scan body on its own
    prep = None
    if (not forward_only and backend == "pallas"
            and adjoint in ("fused", "twophase")):
        from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
            prepare_fit_inputs)
        prep = prepare_fit_inputs(camera, config, target,
                                  block_h=bh, block_w=bw)

    def one_iter(accum, eps):
        if forward_only:
            # perturb the camera so the (concrete) scene stays compactable
            cam2 = camera.replace(eye=camera.eye + eps)
            if backend == "pallas":
                img = render_image_pallas(scene, cam2, config,
                                          block_h=bh, block_w=bw)
            else:
                img = render_fwd(scene, cam2, config)
            return accum + jnp.mean(img), None
        p = params0.replace(sph_center=params0.sph_center + eps)
        if backend == "pallas" and adjoint in ("fused", "fused2",
                                               "twophase"):
            loss, grads = fit_value_and_grad(
                p, scene, camera, config, target,
                block_h=bh, block_w=bw,
                mode={"fused2": "split"}.get(adjoint, adjoint), prep=prep)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(p, scene, camera,
                                                      config, target)
        return accum + loss + jnp.mean(grads.sph_radius), None

    from ray_tracer_fragment_shader_tpu.utils.timing import (
        scan_diff_median, scan_runner)

    run_1, run_n = scan_runner(one_iter, iters)
    timing = scan_diff_median(run_1, run_n, iters, reps=reps)
    dt = max(timing["dt"], 1e-9)

    rays = size * size * config.samples
    rays_per_s = rays / dt

    # --- roofline: measured VPU issue rate vs the kernels' static op count
    # (utils/roofline.py).  Only meaningful for the Pallas kernels.
    # Best-effort: the SOL block is a DIAGNOSTIC — a failure here must
    # never discard the already-completed step timing (round-3 postmortem:
    # a broken roofline probe zeroed the whole bench artifact).
    sol = {}
    if backend == "pallas" and jax.default_backend() == "tpu":
        try:
            from ray_tracer_fragment_shader_tpu.utils.roofline import (
                sol_report)
            rep = sol_report(scene, config, pixels=size * size,
                             fwd_s=dt if forward_only else None,
                             fwd_bwd_s=None if forward_only else dt)
            key = ("sol_fraction_fwd" if forward_only
                   else "sol_fraction_fwd_bwd")
            rate_key = ("mix_rate_fwd_ops_per_s" if forward_only
                        else "mix_rate_fwd_bwd_ops_per_s")
            sol = {
                "sol_fraction": round(rep[key], 4),
                "ops_per_pixel_fwd": rep["ops_per_pixel_fwd"],
                "ops_per_pixel_bwd": rep["ops_per_pixel_bwd"],
                # denominator: register-resident issue rate measured at THIS
                # kernel's jaxpr-derived op-class mix (utils/roofline.py)
                "mix_rate_ops_per_s": round(rep[rate_key], 0),
            }
        except Exception as exc:  # noqa: BLE001 — diagnostic only
            sol = {"sol_error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"# sol_report failed (timing still valid): {exc!r}"[:500],
                  file=sys.stderr)

    tag = "" if preset == "full_reflective" else f"_{preset}"
    out = {
        "metric": f"rays_per_s_per_chip_{'fwd' if forward_only else 'fwd_bwd'}"
                  f"_{size}x{size}_depth{depth}{tag}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        # fraction of hardware speed of light (BASELINE bar: >= 0.90);
        # null for non-Pallas backends where the roofline doesn't apply
        "vs_baseline": sol.get("sol_fraction", None),
        "ray_accounting": "primary rays only (size*size*samples); shadow "
                          "and bounce rays are per-ray work",
        "device": jax.devices()[0].device_kind,
        "backend": backend,
        "adjoint": adjoint if not forward_only else None,
        "block": [bh, bw],
        "step_time_ms": round(dt * 1e3, 3),
        "step_time_ms_reps": [round(d * 1e3, 3) for d in timing["dts"]],
        "timing": {"iters": iters, "reps": reps,
                   "method": timing["method"],
                   "spread": round(timing["spread"], 4)},
        **sol,
    }
    print(json.dumps(out))
    print(f"# device={jax.devices()[0].device_kind} step_time={dt*1e3:.2f}ms "
          f"(median of {reps} x {iters}-iter scan-diff estimates "
          f"{[round(d*1e3, 2) for d in timing['dts']]}, "
          f"warmup {timing['warmup_s']:.1f}s) "
          f"mode={'fwd' if forward_only else 'fwd+bwd'}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
