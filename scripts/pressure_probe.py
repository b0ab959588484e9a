"""VPU issue rate vs live working-set size (the register-pressure curve).

The mix-rate probe (utils/roofline.py) takes the BEST rate over a small
chain-count sweep — a register-resident upper bound.  Real kernels hold
tens of live [BH,BW] planes (the bounce chain's state, the adjoint's
residuals), far beyond the ~64-vreg register file, so Mosaic streams
intermediates through VMEM and the achieved issue rate drops.  This probe
measures that curve directly: the same render-ratio mix chain, with the
number of INDEPENDENT chains ``nc`` (2 vregs each at (8,256)) swept far
past register capacity.  Each chain is a dependent op sequence, so ``nc``
is exactly the live-plane count the scheduler must keep.

Writes artifacts/roofline/pressure_curve.json:
  {nc: budget-ops/s} plus the (8,256)-plane vreg cost, so a kernel's
  expected rate can be read off at its own live-plane estimate.

Usage: python scripts/pressure_probe.py [--iters 2048] [--reps 3]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ncs", type=str,
                    default="2,4,6,8,12,16,24,32,48,64,96")
    ap.add_argument("--out", default="artifacts/roofline/pressure_curve.json")
    args = ap.parse_args()

    import functools
    import time

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ray_tracer_fragment_shader_tpu.utils.roofline import (
        _BLOCK_H, _BLOCK_W, _GRID, _MIX_BLOCK_OPS, _mix_kernel,
        _rewrite_schedule, mix_schedule)

    # the render kernels' dominant class blend (cf. tests/test_roofline.py)
    counts = dict(basic=6408.0, select=1232.0, cmp=1060.0, abs=120.0,
                  recip_nr=112.0, sqrt=24.0, rsqrt=16.0, div=4.0)
    sched, leftover = _rewrite_schedule(mix_schedule(counts))
    per_step = _MIX_BLOCK_OPS + 1 + leftover

    rng = np.random.default_rng(0)
    x = jnp.asarray(0.5 + 0.2 * rng.random((_BLOCK_H * _GRID, _BLOCK_W)),
                    jnp.float32)
    tile = pl.BlockSpec((_BLOCK_H, _BLOCK_W), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def make(n_iters, nc):
        kern = functools.partial(_mix_kernel, iters=n_iters, nc=nc,
                                 sched=sched, fast=True)
        return jax.jit(lambda x: jnp.float32(pl.pallas_call(
            kern, grid=(_GRID,), in_specs=[tile], out_specs=tile,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x)[0, 0]))

    curve = {}
    for nc in (int(t) for t in args.ncs.split(",")):
        iters = max(args.iters // max(nc // 8, 1), 64)  # bound runtime
        run1, run2 = make(iters, nc), make(2 * iters, nc)
        float(run1(x)); float(run2(x))
        deltas = []
        for _ in range(args.reps):
            t0 = time.perf_counter(); float(run1(x))
            t1 = time.perf_counter(); float(run2(x))
            t2 = time.perf_counter()
            deltas.append(max((t2 - t1) - (t1 - t0), 1e-12))
        deltas.sort()
        rate = x.size * nc * iters * per_step / deltas[len(deltas) // 2]
        curve[nc] = round(rate, 0)
        print(f"nc={nc:3d} live_planes={nc:3d} "
              f"rate={rate/1e12:6.3f} T budget-ops/s", flush=True)

    out = dict(device=jax.devices()[0].device_kind,
               plane_shape=[_BLOCK_H, _BLOCK_W],
               vregs_per_plane=_BLOCK_H * _BLOCK_W // (8 * 128),
               schedule_ops=per_step, iters=args.iters, reps=args.reps,
               rate_vs_live_planes=curve)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
