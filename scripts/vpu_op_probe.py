"""Measure per-op-class VPU slot costs on the running TPU — the OP_WEIGHTS
of the speed-of-light roofline (utils/roofline.py), as a committed,
re-runnable probe (VERDICT round 2, item 2: the round-2 weights were
hardcoded constants whose probes were never committed).

Method (saturated pure-class chains): for each op class, a Pallas kernel
runs ``nc`` INDEPENDENT dependent chains whose loop body is exactly ONE
instruction of that class (``y = rsqrt(y)``, ``y = c / y``,
``y = where(bfix, y, c)`` ...), each chain a (8, 256) plane = 2 vector
registers, so all carries stay register-resident (a spilled carry measures
VMEM bandwidth, not issue rate — observed 5x slowdown at 48+ live vregs).
Chain values reach a fixed point after a few iterations; TPU VPU timing is
data-independent, so the instructions still cost their full issue slots.
The chain count ``nc`` is swept and the BEST throughput taken, so the
number is issue throughput at saturation, not dependency latency.  The
per-class slot cost is the ratio to the pure ``mul`` chain:

    w(class) = t_per_op(class) / t_per_op(mul)   [- known support ops]

Support subtraction applies only to ``cmpsel`` (a compare must feed a
select to stay a vector op: w_cmp = w_cmpsel - w_select) and the Newton
reciprocal composite (cross-check only; its weight is priced from parts as
recip + 3 basic).

Built-in validity checks, emitted into the artifact:
  * saturation curve: per-op mul time across the nc sweep — the minimum
    must sit on a plateau (two nc values within a few %), else the probe
    is latency- or spill-bound;
  * additivity: a mix chain with the render kernels' dominant class ratio
    (8 basic + 2 select + 1 cmp + 1 rsqrt per iteration) must match the
    sum of its parts within ~10% — validating the roofline's no-overlap
    assumption (class costs add; nothing hides on a parallel issue port).

Every kernel is timed by the iteration-count difference t(2N) - t(N)
(dispatch latency cancels; cf. utils/timing.py), median of ``--reps``.

Writes artifacts/roofline/op_weights.json, which utils/roofline.py loads
(falling back to the committed defaults = this probe's results on TPU v5e).

Usage:  python scripts/vpu_op_probe.py [--reps 3] [--iters 4096]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

BLOCK_H, BLOCK_W, GRID = 8, 256, 256   # one chain = 2 vregs
NC_SWEEP = (4, 8, 12, 16)             # 8..32 vregs of carries


def _step(inject: str, y, c, d, bfix):
    """One chain step: the measured op plus (where needed) one runtime-
    scalar multiply that defeats compile-time chain collapse — idempotent
    or periodic pure chains (``max(max(y,d),d)``, ``where(b,where(b,y,d),d)``,
    ``floor(floor(y))``, ``c-(c-y)``) simplify to a single op once the
    fori_loop is unrolled, and measure ~0.  ``c``/``d`` are loop-invariant
    scalars loaded from the input (not const-foldable).  Values stay in a
    bounded f32 domain; VPU timing is data-independent."""
    if inject == "mul":
        return y * c                    # c ~ 1.0: y stays put
    if inject == "add":
        return (d - y) + c * 0.25       # add + sub (2 basic, no support)
    if inject == "max":
        return jnp.maximum(y, d) * c    # max + support mul
    if inject == "sel":
        return jnp.where(bfix, y, d) * c        # select + support mul
    if inject == "cmpsel":
        return jnp.where(y > d, y * 0.98, y * 1.01)  # cmp + sel + 2 mul
    if inject == "abs":
        return jnp.abs(y) * (-c)        # abs + support mul
    if inject == "sign":
        return jnp.sign(y) * d          # sign + support mul (y -> ±d)
    if inject == "rsqrt":
        return jax.lax.rsqrt(y)         # pure: composition never simplifies
    if inject == "sqrt":
        return jnp.sqrt(y)              # pure
    if inject == "div":
        return c / y                    # pure
    if inject == "recip":
        return pl.reciprocal(y, approx=True)    # pure
    if inject == "recip_nr":            # composite cross-check: recip+3 basic
        r = pl.reciprocal(y, approx=True)
        return r * (2.0 - y * r)
    if inject == "floor":
        return jnp.floor(y * 1.618) * d         # floor + 2 support mul
    if inject == "mix":
        # the render kernels' dominant ratio per iteration:
        # 8 basic + 2 select + 1 cmp + 1 rsqrt = 12 ops
        y = jnp.where(y > d, y * c, y + d)        # cmp + sel + mul + add
        y = jnp.where(bfix, y * c + d, y)         # sel + mul + add
        y = jax.lax.rsqrt(y * c + d * 0.1)        # rsqrt + mul + mul + add
        return y * c                              # mul
    raise ValueError(inject)


# ops per chain step and how many of them are 'basic' support ops whose
# cost is subtracted (priced at the measured mul slot)
OPS_PER_ITER = dict(mul=1, add=2, max=2, sel=2, cmpsel=4, abs=2, sign=2,
                    rsqrt=1, sqrt=1, div=1, recip=1, recip_nr=4, floor=3,
                    mix=12)
SUPPORT_MULS = dict(mul=0, add=0, max=1, sel=1, cmpsel=2, abs=1, sign=1,
                    rsqrt=0, sqrt=0, div=0, recip=0, recip_nr=3, floor=2,
                    mix=0)


def _chain_kernel(x_ref, o_ref, *, iters: int, inject: str, nc: int):
    ys = [x_ref[:] * (1.0 + 0.001 * i) for i in range(nc)]
    c = x_ref[0, 0] * 2.0          # ~1.0, loop-invariant, not const-foldable
    d = x_ref[0, 1]                # ~0.6
    bfix = x_ref[:] > d

    def body(_, ys):
        return [_step(inject, y, c, d, bfix) for y in ys]

    ys = jax.lax.fori_loop(0, iters, body, ys)
    out = ys[0]
    for y in ys[1:]:
        out = out + y
    o_ref[:] = out


def _time_chain(inject: str, iters: int, reps: int, nc: int) -> float:
    """Seconds per (chain element x iteration) — NOT per op — by the
    iteration-count difference, median of reps."""
    import numpy as np
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.5 + 0.2 * rng.random((BLOCK_H * GRID, BLOCK_W)),
                    jnp.float32)
    tile = pl.BlockSpec((BLOCK_H, BLOCK_W), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def make(n_iters):
        kern = functools.partial(_chain_kernel, iters=n_iters,
                                 inject=inject, nc=nc)
        return jax.jit(lambda x: jnp.float32(pl.pallas_call(
            kern, grid=(GRID,), in_specs=[tile], out_specs=tile,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x)[0, 0]))

    run1, run2 = make(iters), make(2 * iters)
    float(run1(x)); float(run2(x))  # compile
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run1(x)); t1 = time.perf_counter()
        float(run2(x)); t2 = time.perf_counter()
        deltas.append(max((t2 - t1) - (t1 - t0), 1e-12))
    deltas.sort()
    return deltas[len(deltas) // 2] / (x.size * nc * iters)


def _best(inject: str, iters: int, reps: int, ncs=NC_SWEEP):
    """(best per-chain-STEP seconds, {nc: per-step seconds in fs}) over the
    chain-count sweep — the minimum is the saturated issue throughput."""
    times = {nc: _time_chain(inject, iters, reps, nc) for nc in ncs}
    return min(times.values()), {k: round(v * 1e15, 1)
                                 for k, v in times.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="artifacts/roofline/op_weights.json")
    args = ap.parse_args()

    t_mul, mul_sweep = _best("mul", args.iters, args.reps)
    slot_rate = 1.0 / t_mul
    print("mul sweep (fs/step):", json.dumps(mul_sweep),
          " rate=%.3e ops/s" % slot_rate)

    classes = ["add", "max", "sel", "cmpsel", "abs", "sign", "rsqrt",
               "sqrt", "div", "recip", "recip_nr", "floor"]
    # raw = the class op's own slot cost after subtracting support muls
    # (each support mul costs exactly 1.0 by definition of the unit)
    raw, sweeps = {"mul": 1.0}, {"mul": mul_sweep}
    for cls in classes:
        t, sw = _best(cls, args.iters, args.reps)
        raw[cls] = round(t / t_mul - SUPPORT_MULS[cls], 3)
        sweeps[cls] = sw
        print(f"{cls:10s} step={t / t_mul:7.3f} slots  -{SUPPORT_MULS[cls]} "
              f"support -> {raw[cls]:7.3f}   sweep={json.dumps(sw)}")

    basic = max(raw["add"] / 2.0, raw["max"], 1.0)  # add chain = 2 basic ops
    weights = dict(
        basic=round(basic, 3),
        cmp=max(round(raw["cmpsel"] - raw["sel"], 3), 0.25),
        select=max(raw["sel"], 0.25),
        abs=max(raw["abs"], 0.25),
        sign=max(raw["sign"], 0.25),
        rsqrt=max(raw["rsqrt"], 0.25),
        sqrt=max(raw["sqrt"], 0.25),
        div=max(raw["div"], 0.25),
        recip_nr=max(round(raw["recip"] + 3.0 * basic, 3), 0.25),
        floor=max(raw["floor"], 0.25),
    )
    # composite cross-check: the measured NR chain vs the priced sum
    nr_check = dict(measured_slots=round(raw["recip_nr"] + 3.0, 2),
                    priced_slots=weights["recip_nr"],
                    ratio=round((raw["recip_nr"] + 3.0)
                                / max(weights["recip_nr"], 1e-9), 3))

    # --- additivity check: mix chain vs sum of its parts ---
    t_mix, mix_sweep = _best("mix", args.iters, args.reps)
    pred = (8 * weights["basic"] + 2 * weights["select"] + weights["cmp"]
            + weights["rsqrt"])
    meas = t_mix / t_mul
    additivity = dict(predicted_slots_per_step=round(pred, 3),
                      measured_slots_per_step=round(meas, 3),
                      ratio=round(meas / pred, 3), sweep=mix_sweep)
    print("additivity:", json.dumps(additivity))

    out = dict(device=jax.devices()[0].device_kind,
               slot_rate_ops_per_s=round(slot_rate, 0),
               method="saturated pure-class chains, (8,256) planes, nc swept"
                      " %s, iteration-count-differenced, median of %d; see"
                      " scripts/vpu_op_probe.py" % (list(NC_SWEEP),
                                                    args.reps),
               raw_slots=raw, sweeps_fs_per_op=sweeps, weights=weights,
               recip_nr_check=nr_check, additivity_check=additivity)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
