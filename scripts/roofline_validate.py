"""Validate the roofline model against measured step times (VERDICT r2
item 2: "predict step times across the existing depth sweep / config-5 /
tile sweep and show residuals <= 10%").

For a set of configurations spanning scene size (4..64 spheres, 2..18
triangles), depth (2/3/5), resolution (512^2..4096^2) and mode (fwd,
fwd+bwd), this measures the real step time (shared scan-difference harness,
utils/timing.py) and the model's speed-of-light time (jaxpr-derived flat op
counts / mix-calibrated VPU issue rate — utils/roofline.py: the denominator
is measured by a register-resident chain whose op-class schedule is
generated from each kernel's own counts).

The model is a lower bound, so the test of its *shape* is that the achieved
efficiency  eff = sol_time / measured_time  is consistent across rows: the
prediction  t_pred = sol_time / median_eff  should match every measured time
within ~10%.  Writes artifacts/roofline/model_vs_measured.json and prints
the PERF.md table.

Usage: python scripts/roofline_validate.py [--iters 32] [--reps 3]
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


def measure(scene, camcfg, config, mode, iters, reps, block=(None, None)):
    # block (None, None): each kernel entry point resolves the scene's
    # measured default (render_pallas.py::default_blocks) — the grid now
    # validates the model at the shapes users actually get
    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.utils.timing import (
        scan_diff_median, scan_runner)
    camera = Camera.from_config(camcfg, config.width, config.height)
    bh, bw = block

    if mode == "fwd":
        def one_iter(accum, eps):
            cam2 = camera.replace(eye=camera.eye + eps)
            img = render_image_pallas(scene, cam2, config,
                                      block_h=bh, block_w=bw)
            return accum + jnp.mean(img), None
    else:
        target = jax.jit(lambda s: render_image_pallas(
            s, camera, config, block_h=bh, block_w=bw))(scene)
        jax.block_until_ready(target)
        params0 = FitParams.from_scene(scene)

        def one_iter(accum, eps):
            p = params0.replace(sph_center=params0.sph_center + eps)
            loss, grads = fit_value_and_grad(p, scene, camera, config,
                                             target, block_h=bh, block_w=bw)
            return accum + loss + jnp.mean(grads.sph_radius), None

    run_1, run_n = scan_runner(one_iter, iters)
    timing = scan_diff_median(run_1, run_n, iters, reps=reps)
    # sub-ms rows at 32 iters sit at the tunnel-noise floor (a round-5
    # 512^2 row measured 0.395 ms = a physically impossible 1.44
    # efficiency; 256 iters gave 0.717 at spread 0.01) — re-estimate with
    # enough iterations that the scan difference dominates the noise
    if timing["dt"] < 1e-3 and iters < 256:
        run_1, run_n = scan_runner(one_iter, 256)
        timing = scan_diff_median(run_1, run_n, 256, reps=reps)
    return max(timing["dt"], 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out",
                    default="artifacts/roofline/model_vs_measured.json")
    args = ap.parse_args()

    import dataclasses

    from ray_tracer_fragment_shader_tpu.scene import presets
    from ray_tracer_fragment_shader_tpu.utils.roofline import sol_report

    def cfgs():
        # (label, scene, camcfg, config, mode)
        s, c, cf = presets.full_reflective(size=1024, depth=3)
        yield "full_reflective 1024^2 d3", s, c, cf, "fwd"
        yield "full_reflective 1024^2 d3", s, c, cf, "fwd_bwd"
        s, c, cf = presets.full_reflective(size=1024, depth=2)
        yield "full_reflective 1024^2 d2", s, c, cf, "fwd_bwd"
        s, c, cf = presets.full_reflective(size=1024, depth=5)
        yield "full_reflective 1024^2 d5", s, c, cf, "fwd_bwd"
        s, c, cf = presets.full_reflective(size=512, depth=3)
        yield "full_reflective 512^2 d3", s, c, cf, "fwd_bwd"
        s, c, cf = presets.procedural_spheres(size=2048, depth=3)
        yield "procedural_64sph 2048^2 d3", s, c, cf, "fwd"
        yield "procedural_64sph 2048^2 d3", s, c, cf, "fwd_bwd"
        s, c, cf = presets.fit_target(size=512)
        cf = dataclasses.replace(cf, samples=1, force_jitter=False)
        yield "fit_target 512^2 d%d" % cf.max_depth, s, c, cf, "fwd_bwd"

    rows = []
    for label, scene, camcfg, config, mode in cfgs():
        pixels = config.width * config.height
        dt = measure(scene, camcfg, config, mode, args.iters, args.reps)
        rep = sol_report(scene, config, pixels,
                         fwd_s=dt if mode == "fwd" else None,
                         fwd_bwd_s=dt if mode == "fwd_bwd" else None)
        sol_s = rep["sol_fwd_s" if mode == "fwd" else "sol_fwd_bwd_s"]
        eff = rep["sol_fraction_fwd" if mode == "fwd"
                  else "sol_fraction_fwd_bwd"]
        rows.append(dict(label=label, mode=mode, pixels=pixels,
                         depth=config.max_depth,
                         ops_fwd=rep["ops_per_pixel_fwd"],
                         ops_bwd=rep["ops_per_pixel_bwd"],
                         mix_rate=round(rep["mix_rate_fwd_ops_per_s"
                                            if mode == "fwd" else
                                            "mix_rate_fwd_bwd_ops_per_s"], 0),
                         measured_ms=round(dt * 1e3, 3),
                         sol_ms=round(sol_s * 1e3, 3),
                         sol_fraction=round(eff, 4)))
        print(json.dumps(rows[-1]))

    effs = sorted(r["sol_fraction"] for r in rows)
    med = effs[len(effs) // 2]
    for r in rows:
        pred = r["sol_ms"] / med
        r["pred_ms"] = round(pred, 3)
        r["residual_pct"] = round(100 * (pred - r["measured_ms"])
                                  / r["measured_ms"], 1)

    out = dict(device=jax.devices()[0].device_kind,
               median_sol_fraction=med,
               iters=args.iters, reps=args.reps, rows=rows)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)

    print("\n| config | mode | measured ms | SOL ms | eff | pred ms | resid |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['label']} | {r['mode']} | {r['measured_ms']} | "
              f"{r['sol_ms']} | {r['sol_fraction']} | {r['pred_ms']} | "
              f"{r['residual_pct']}% |")
    print(f"\nmedian efficiency: {med}")


if __name__ == "__main__":
    main()
