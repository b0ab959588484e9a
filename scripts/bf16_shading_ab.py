"""A/B the opt-in bf16 split-precision shading mode (RenderConfig.
bf16_shading) on the real chip, writing artifacts/roofline/
bf16_shading_ab.json.

Round-5 RESULT — NEGATIVE (the mode stays opt-in and off):

    fwd f32             1.99 ms     fwd  bf16-shading   2.67 ms
    fwd+bwd f32         2.65 ms     fwd+bwd bf16        3.35 ms

Why the 2.41x bf16 probe (scripts/bf16_probe.py) did not transfer: the
probe's chains are REGISTER-RESIDENT — every operand is a live vector.
The real sweeps are scalar-broadcast-heavy: in f32, an SMEM scalar times a
vector plane fuses the splat into the op for free; Mosaic has NO scalar
bf16 arithmetic at all, so the bf16 path needs an explicit splat+cast
plane per scalar operand (~16 per triangle per sweep) plus f32 upcasts at
every compare.  The cast traffic exceeds the 2-per-lane fma win.  The
mode is kept for its API surface (documented looser parity,
tests/test_bf16_shading.py) and as the banked negative result.

Usage: python scripts/bf16_shading_ab.py
"""
from __future__ import annotations

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


def main() -> None:
    from ray_tracer_fragment_shader_tpu.diff.fit import FitParams
    from ray_tracer_fragment_shader_tpu.kernels.adjoint_fused import (
        fit_value_and_grad, prepare_fit_inputs)
    from ray_tracer_fragment_shader_tpu.kernels.render_pallas import (
        render_image_pallas)
    from ray_tracer_fragment_shader_tpu.ops.rays import Camera
    from ray_tracer_fragment_shader_tpu.scene import presets
    from ray_tracer_fragment_shader_tpu.utils.timing import (
        scan_diff_median, scan_runner)

    scene, camcfg, config = presets.full_reflective(size=1024, depth=3)
    cfg_bf = dataclasses.replace(config, bf16_shading=True)
    camera = Camera.from_config(camcfg, 1024, 1024)
    out = dict(device=jax.devices()[0].device_kind, size=1024, depth=3)

    a = np.asarray(jax.jit(
        lambda s: render_image_pallas(s, camera, config))(scene))
    b = np.asarray(jax.jit(
        lambda s: render_image_pallas(s, camera, cfg_bf))(scene))
    d = np.abs(a - b).max(-1)
    out["parity"] = dict(p99=float(np.quantile(d, 0.99)),
                         frac_gt_3e2=float((d > 3e-2).mean()))

    def time_fwd(cfg):
        def one(accum, eps):
            cam2 = camera.replace(eye=camera.eye + eps)
            return accum + jnp.mean(render_image_pallas(scene, cam2, cfg)), None
        r1, rn = scan_runner(one, 64)
        return scan_diff_median(r1, rn, 64, reps=3)["dt"] * 1e3

    out["fwd_f32_ms"] = round(time_fwd(config), 3)
    out["fwd_bf16_ms"] = round(time_fwd(cfg_bf), 3)

    target = jax.jit(lambda s: render_image_pallas(s, camera, cfg_bf))(scene)
    float(jnp.sum(target))
    params0 = FitParams.from_scene(scene)

    def time_fit(cfg):
        prep = prepare_fit_inputs(camera, cfg, target)

        def one(accum, eps):
            p = params0.replace(sph_center=params0.sph_center + eps)
            loss, grads = fit_value_and_grad(p, scene, camera, cfg, target,
                                             prep=prep)
            return accum + loss + jnp.mean(grads.sph_radius), None
        r1, rn = scan_runner(one, 64)
        return scan_diff_median(r1, rn, 64, reps=3)["dt"] * 1e3

    out["fwd_bwd_f32_ms"] = round(time_fit(config), 3)
    out["fwd_bwd_bf16_ms"] = round(time_fit(cfg_bf), 3)
    out["verdict"] = ("NEGATIVE on v5e: scalar-splat + cmp-upcast tax "
                      "exceeds the 2-per-lane fma win (see module "
                      "docstring); mode stays opt-in")
    path = "artifacts/roofline/bf16_shading_ab.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
