"""bf16 vs f32 VPU issue-rate probe (VERDICT r2 item 9 / ROADMAP r2->3 #6).

Decides whether bfloat16 *shading* math (not geometry — SEMANTICS: bf16's ~3
decimal digits destroy ray-geometry precision, ops/intersect.py:67) can beat
f32 in the render kernels.  The kernels are VPU-issue-bound (PERF.md §2), so
bf16 only helps if the VPU issues bf16 elementwise ops faster than f32 —
halved *memory* traffic is worthless here (compute-bound by 3 orders).

Method: the same register-resident dependent-chain kernel as
scripts/vpu_op_probe.py (mul / mix-ratio chains, iteration-count-differenced
timing, chain-count sweep for saturation), run in f32 and bf16 at the same
element count.

Measured on v5e (see PERF.md "bf16 shading experiment" and the committed
artifact): pure-mul chains run ~1.45x faster in bf16, BUT Mosaic rejects
bf16 comparisons outright ("Target does not support this comparison"), so
every cmp — 26% of the render kernels' ops are cmp/select — must upcast
to f32; the mix-ratio chain times that price honestly.  The conclusion
for the render kernels is in the artifact's ``mix`` row.

Writes artifacts/roofline/bf16_probe.json.

Usage: python scripts/bf16_probe.py [--iters 16384] [--reps 3]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

BLOCK_H, BLOCK_W, GRID = 8, 256, 256
NC_SWEEP = (4, 8, 12, 16)


def _step(inject, y, c, d, d32, d01, bfix):
    if inject == "mul":
        return y * c
    # the render kernels' dominant per-iteration ratio (cf. vpu_op_probe):
    # 8 basic + 2 select + 1 cmp + 1 rsqrt.  v5e Mosaic REJECTS bf16
    # comparisons ("Target does not support this comparison"), so the cmp
    # upcasts to f32 — deliberately kept in the timed chain: that convert
    # is the real price any bf16 shading path would pay for its compares.
    bf16 = y.dtype == jnp.bfloat16
    cond = (y.astype(jnp.float32) if bf16 else y) > d32
    y = jnp.where(cond, y * c, y + d)
    y = jnp.where(bfix, y * c + d, y)
    # d01 precomputed in f32 then cast: a bf16 scalar*scalar mulf fails
    # to legalize on the scalar core
    arg = y * c + d01
    # rsqrt is f32-only on v5e Mosaic too: upcast, op, downcast
    y = (jax.lax.rsqrt(arg.astype(jnp.float32)).astype(jnp.bfloat16)
         if bf16 else jax.lax.rsqrt(arg))
    return y * c


def _chain_kernel(x_ref, o_ref, *, iters, inject, nc, dtype):
    xf = x_ref[:]
    # scalars extracted in f32 (Mosaic can only squeeze 32-bit scalars),
    # then cast — the chain ops themselves all run in ``dtype``
    c = (xf[0, 0] * 2.0).astype(dtype)
    d32 = xf[0, 1]
    d = d32.astype(dtype)
    d01 = (d32 * 0.1).astype(dtype)
    x = xf.astype(dtype)
    ys = [x * jnp.asarray(1.0 + 0.001 * i, dtype) for i in range(nc)]
    bfix = xf > d32          # fixed mask from an f32 compare (bf16 cmp
                             # is unsupported); select over bf16 is fine

    def body(_, ys):
        return [_step(inject, y, c, d, d32, d01, bfix) for y in ys]

    ys = jax.lax.fori_loop(0, iters, body, ys)
    out = ys[0]
    for y in ys[1:]:
        out = out + y
    o_ref[:] = out.astype(jnp.float32)


def _time_chain(inject, dtype, iters, reps, nc):
    import numpy as np
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.5 + 0.2 * rng.random((BLOCK_H * GRID, BLOCK_W)),
                    jnp.float32)
    tile = pl.BlockSpec((BLOCK_H, BLOCK_W), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def make(n_iters):
        kern = functools.partial(_chain_kernel, iters=n_iters,
                                 inject=inject, nc=nc, dtype=dtype)
        return jax.jit(lambda x: jnp.float32(pl.pallas_call(
            kern, grid=(GRID,), in_specs=[tile], out_specs=tile,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x)[0, 0]))

    run1, run2 = make(iters), make(2 * iters)
    float(run1(x)); float(run2(x))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run1(x)); t1 = time.perf_counter()
        float(run2(x)); t2 = time.perf_counter()
        deltas.append(max((t2 - t1) - (t1 - t0), 1e-12))
    deltas.sort()
    return deltas[len(deltas) // 2] / (x.size * nc * iters)


def _best(inject, dtype, iters, reps):
    times = {nc: _time_chain(inject, dtype, iters, reps, nc)
             for nc in NC_SWEEP}
    return min(times.values()), {k: round(v * 1e15, 1)
                                 for k, v in times.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="artifacts/roofline/bf16_probe.json")
    args = ap.parse_args()

    out = dict(device=jax.devices()[0].device_kind, rows={})
    for inject in ("mul", "mix"):
        t32, sw32 = _best(inject, jnp.float32, args.iters, args.reps)
        t16, sw16 = _best(inject, jnp.bfloat16, args.iters, args.reps)
        ratio = t32 / t16  # >1: bf16 faster
        out["rows"][inject] = dict(
            f32_fs_per_step=round(t32 * 1e15, 1),
            bf16_fs_per_step=round(t16 * 1e15, 1),
            bf16_speedup=round(ratio, 3),
            f32_sweep=sw32, bf16_sweep=sw16)
        print(f"{inject}: f32 {t32*1e15:.1f} fs/step, "
              f"bf16 {t16*1e15:.1f} fs/step, speedup {ratio:.3f}x")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
