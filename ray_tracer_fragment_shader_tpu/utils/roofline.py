"""Speed-of-light (roofline) model for the fused Pallas kernels.

The render kernels are pure-VPU elementwise programs: no matmuls (nothing
for the MXU) and — once a tile's rays and scene tables are in VMEM/SMEM —
no HBM traffic inside the bounce loop (~24 B/pixel moved vs ~12k ops/pixel:
compute-bound by 3 orders of magnitude).  Speed of light is therefore the
VPU's sustained issue rate *for this program's instruction mix*:

    SOL step time = (flat ops per pixel) * pixels / (measured mix rate)
    sol_fraction  = SOL step time / measured step time

Both factors are derived or measured, nothing is hand-tuned:

  * per-pixel op counts come from the kernels' own jaxprs
    (utils/opcount.py — DCE'd trace of the actual tile bodies, fori_loops
    multiplied by trip count);
  * the denominator is measured by :func:`measure_mix_rate`: a
    register-resident dependent-chain Pallas kernel whose op-class
    schedule is GENERATED from those same jaxpr counts (largest-remainder
    allocation over a 256-op block), timed by iteration-count differencing
    with the chain count swept for issue saturation.

Why a mix-calibrated rate instead of per-op-class slot weights: the v5e
VPU is a VLIW machine — ops co-issue across slots.  The committed probe
``scripts/vpu_op_probe.py`` (artifact
``artifacts/roofline/op_weights.json``) measures marginal per-class costs
of ~0.35 slots for select and ~0.25 for compare next to a 1.0 mul, and its
additivity check FAILS (a render-ratio mix runs 1.49x faster than the sum
of its parts predicts): per-class costs do not add, so any
weighted-slot-sum model is structurally wrong on this hardware — round 2's
``OP_WEIGHTS`` model (select 2.5, sqrt 10, ...) happened to land within a
few % of this model's answer, but could not be defended op-by-op.  A chain
with the real instruction ratio measures the co-issued rate directly; the
only assumption left is that Mosaic's VMEM-operand streaming can keep the
issue ports as busy as register-resident operands do, which is exactly the
gap ``sol_fraction`` reports.

``scripts/roofline_validate.py`` checks the model's *shape* against
measured step times across depth/scene/resolution sweeps (PERF.md "model
vs measured").
"""
from __future__ import annotations

import functools
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .opcount import kernel_op_counts

# classes the mix chain can emit; anything else (tiny "other:*" residue)
# folds into basic
_MIX_CLASSES = ("basic", "select", "cmp", "abs", "sign", "rsqrt", "sqrt",
                "div", "recip_nr", "floor")
_MIX_BLOCK_OPS = 256   # budget ops per chain iteration


def flat_slots(counts: Dict[str, float]) -> float:
    return float(sum(counts.values()))


def mix_schedule(counts: Dict[str, float],
                 block_ops: int = _MIX_BLOCK_OPS) -> Tuple[str, ...]:
    """Largest-remainder integer allocation of ``block_ops`` budget ops over
    the op classes of ``counts``, interleaved proportionally (Bresenham) so
    heavy classes don't run in bursts.  Classes whose share rounds to zero
    are dropped (for the render kernels that is sign/div, <0.5% of cost).

    One budget op = one numerator-count unit: the ``recip_nr`` entry emits
    approx-reciprocal + one Newton step (4 instructions) but consumes ONE
    budget op, exactly as utils/opcount.py counts one ``recip_nr`` per
    reciprocal site — numerator and denominator stay in the same units."""
    tot = sum(counts.values())
    shares = {k: 0.0 for k in _MIX_CLASSES}
    for k, v in counts.items():
        shares[k if k in _MIX_CLASSES else "basic"] += v / tot
    alloc = {k: int(s * block_ops) for k, s in shares.items()}
    rema = sorted(shares, key=lambda k: (shares[k] * block_ops) % 1.0,
                  reverse=True)
    for k in rema:
        if sum(alloc.values()) >= block_ops:
            break
        alloc[k] += 1
    alloc = {k: n for k, n in alloc.items() if n > 0}
    # proportional interleave
    sched, err = [], {k: 0.0 for k in alloc}
    for _ in range(sum(alloc.values())):
        for k in err:
            err[k] += alloc[k]
        k = max(err, key=err.get)
        err[k] -= sum(alloc.values())
        sched.append(k)
    return tuple(sched)


def _emit(cls: str, y, b, c, d, k: int, fast: bool = True):
    """One budget op of class ``cls`` on value ``y`` (``b`` is the bool
    plane produced by the most recent ``cmp``, consumed by ``select`` —
    a BODY-LOCAL value, never a loop carry: Mosaic cannot legalize i1
    vector planes carried through ``scf.for``).  ``k`` is the occurrence
    index within the schedule: 'basic' alternates mul/add so the chain is
    non-foldable even under reassociation and y stays in a bounded,
    positive f32 domain (c ~0.6 contracts, +d restores) instead of the old
    loop-invariant ``y*c`` that overflowed to inf within one block.  VPU
    timing is data-independent so the exact fixed cycle doesn't matter."""
    if cls == "basic":
        return (y * c if k % 2 == 0 else y + d), b
    if cls == "cmp":
        return y, y > d
    if cls == "select":
        return jnp.where(b, y, d), b
    if cls == "abs":
        return jnp.abs(y), b
    if cls == "sign":
        return jnp.sign(y) * d, b          # sign + support mul (_EXTRA_BASIC)
    if cls == "rsqrt":
        return jax.lax.rsqrt(y), b
    if cls == "sqrt":
        return jnp.sqrt(y), b
    if cls == "div":
        return c / y, b
    if cls == "recip_nr":
        # pl.reciprocal is TPU-only; the interpreter uses the exact divide
        r = pl.reciprocal(y, approx=True) if fast else 1.0 / y
        return r * (2.0 - y * r), b
    if cls == "floor":
        return jnp.floor(y * 1.618) * d + c * 0.25, b
    raise ValueError(cls)


# extra instructions _emit issues beyond the budget op itself, charged to
# the basic budget during schedule rewriting (keeps units exact)
_EXTRA_BASIC = dict(sign=1, floor=3)


def _rewrite_schedule(sched):
    """Charge _EXTRA_BASIC support instructions against the basic budget:
    each 'sign' emits sign+mul, so one following 'basic' entry is removed
    per extra instruction (schedule stays the same budget-op total).
    Returns ``(schedule, leftover)`` where ``leftover`` is unpaid debt
    (support instructions with no later 'basic' entry to remove).  Each
    support mul is a basic-class instruction: when its debt is paid the
    removed 'basic' entry keeps the per-pass unit count at the budget,
    but unpaid debt means the chain executes that many EXTRA basic-unit
    instructions beyond the budget — the caller must add ``leftover`` to
    the per-step unit count or the measured rate is misstated."""
    out, owed = [], 0
    for cls in sched:
        if cls == "basic" and owed > 0:
            owed -= 1
            continue
        owed += _EXTRA_BASIC.get(cls, 0)
        out.append(cls)
    return tuple(out), owed


def _mix_kernel(x_ref, o_ref, *, iters: int, nc: int, sched, fast: bool):
    """The mix chain.  The fori_loop carries ONLY f32 planes: the bool
    plane feeding selects starts each body iteration from the closure
    capture ``bfix`` and is updated body-locally by 'cmp' entries; a tail
    select consumes it so no cmp is dead code.  (Carrying i1 vector planes
    through the loop is Mosaic-illegal — "failed to legalize 'scf.for'";
    cf. the same pattern in scripts/vpu_op_probe.py::_chain_kernel.)"""
    ys = [x_ref[:] * (1.0 + 0.001 * i) for i in range(nc)]
    c = x_ref[0, 0]                  # ~0.6, loop-invariant, not foldable
    d = x_ref[0, 1]                  # ~0.6
    bfix = x_ref[:] > d

    def body(_, ys):
        outs = []
        for y in ys:
            b = bfix
            for k, cls in enumerate(sched):
                y, b = _emit(cls, y, b, c, d, k, fast=fast)
            # consume the body-local bool so the last cmp isn't dead code
            outs.append(jnp.where(b, y, d))
        return outs

    ys = jax.lax.fori_loop(0, iters, body, ys)
    acc = ys[0]
    for y in ys[1:]:
        acc = acc + y
    o_ref[:] = acc


_BLOCK_H, _BLOCK_W, _GRID = 8, 256, 256


@functools.lru_cache(maxsize=8)
def _measure_mix_rate_cached(sched: Tuple[str, ...], per_step: int,
                             iters: int, reps: int,
                             interpret: bool) -> float:
    import numpy as np
    rng = np.random.default_rng(0)
    grid = 2 if interpret else _GRID   # interpret mode: smoke, not timing
    x = jnp.asarray(0.5 + 0.2 * rng.random((_BLOCK_H * grid, _BLOCK_W)),
                    jnp.float32)
    tile = pl.BlockSpec((_BLOCK_H, _BLOCK_W), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def make(n_iters, nc):
        kern = functools.partial(_mix_kernel, iters=n_iters, nc=nc,
                                 sched=sched, fast=not interpret)
        return jax.jit(lambda x: jnp.float32(pl.pallas_call(
            kern, grid=(grid,), in_specs=[tile], out_specs=tile,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x)[0, 0]))

    best = None
    # chain counts must reach issue SATURATION: the committed pressure
    # curve (scripts/pressure_probe.py, artifacts/roofline/
    # pressure_curve.json) shows the rate still climbing at nc=6 (4.7T)
    # and plateauing ~5.28T only by nc>=16-32 — an undersized sweep
    # understates the SOL denominator and flatters sol_fraction.
    for nc in ((2,) if interpret else (8, 16, 32)):
        run1, run2 = make(iters, nc), make(2 * iters, nc)
        float(run1(x)); float(run2(x))
        deltas = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(run1(x))
            t1 = time.perf_counter(); float(run2(x))
            t2 = time.perf_counter()
            deltas.append(max((t2 - t1) - (t1 - t0), 1e-12))
        deltas.sort()
        rate = x.size * nc * iters * per_step / deltas[len(deltas) // 2]
        best = rate if best is None else max(best, rate)
    return best


def measure_mix_rate(counts: Dict[str, float], iters: int = 2048,
                     reps: int = 5, interpret: bool = None) -> float:
    """Sustained VPU issue rate (budget ops/s) for a register-resident
    dependent chain with the op-class ratio of ``counts`` — the SOL
    denominator.  Chain count swept (8/16/32 independent chains) and the
    best taken: TRUE issue saturation — the committed pressure curve
    (artifacts/roofline/pressure_curve.json) shows the rate plateaus only
    by ~16-32 chains (~5.3T on v5e) and does NOT degrade out to 96 live
    planes, so this is the hardware's sustained ceiling for the blend,
    not a dependency- or pressure-limited reading.  Iteration-count-
    difference timing (dispatch cancels), median of ``reps``.  Off-TPU the
    kernel runs in the Pallas interpreter (functional smoke only — the
    returned rate is not a hardware number)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sched, leftover = _rewrite_schedule(mix_schedule(counts))
    # the tail select consuming the bool is one extra budget op; unpaid
    # _EXTRA_BASIC debt is extra basic-unit instructions actually executed
    per_step = _MIX_BLOCK_OPS + 1 + leftover
    return _measure_mix_rate_cached(sched, per_step, iters, reps, interpret)


def sol_report(scene, config, pixels: int,
               fwd_s: float = None, fwd_bwd_s: float = None) -> Dict[str, float]:
    """Roofline summary for a measured step time: per-pixel flat op counts
    (jaxpr-derived), the mix-calibrated issue rate for this kernel's op
    blend, the speed-of-light step times and the achieved
    ``sol_fraction``s.  The forward count is the chain forward kernel; the
    backward count is the fused L2-epilogue + hand-written replay adjoint,
    so fwd+bwd models the single-dispatch fused kernel exactly (the
    two-phase path differs only by residual HBM traffic)."""
    fwd_c, bwd_c = kernel_op_counts(scene, config)
    f_f, b_f = flat_slots(fwd_c), flat_slots(bwd_c)
    out = dict(ops_per_pixel_fwd=round(f_f, 1),
               ops_per_pixel_bwd=round(b_f, 1),
               counts_fwd=fwd_c, counts_bwd=bwd_c)
    if fwd_s is not None:
        rate = measure_mix_rate(fwd_c)
        sol = f_f * pixels / rate
        out["mix_rate_fwd_ops_per_s"] = rate
        out["sol_fwd_s"] = sol
        out["sol_fraction_fwd"] = sol / fwd_s
    if fwd_bwd_s is not None:
        tot = dict(fwd_c)
        for k, v in bwd_c.items():
            tot[k] = tot.get(k, 0.0) + v
        rate = measure_mix_rate(tot)
        sol = (f_f + b_f) * pixels / rate
        out["mix_rate_fwd_bwd_ops_per_s"] = rate
        out["sol_fwd_bwd_s"] = sol
        out["sol_fraction_fwd_bwd"] = sol / fwd_bwd_s
    return out
