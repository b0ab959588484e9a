"""Speed-of-light (roofline) model for the fused Pallas kernels.

The render kernels are pure VPU programs: every op is an elementwise f32
mul/add/compare/select over [BH, BW] tile planes, there are no matmuls
(nothing for the MXU) and — once a tile's rays and scene tables are in
VMEM/SMEM — no HBM traffic inside the bounce loop (HBM moves only the ray
planes in and RGB planes out: ~24 B/pixel against >9,000 ops/pixel, so the
kernel is compute-bound by 3 orders of magnitude).  Speed of light is
therefore the VPU issue rate:

    SOL step time = (slots per pixel) * pixels / (measured VPU slots/s)
    sol_fraction  = SOL step time / measured step time

Every number in the model is derived or measured, nothing is estimated:

  * per-pixel op counts come from the kernels' own jaxprs
    (utils/opcount.py — DCE'd trace of the actual tile bodies, fori_loops
    multiplied by trip count; round 2's hand-audited tables and the
    backward's ``VJP_FACTOR=3`` guess are gone, obsoleted by the
    hand-written adjoint which made the backward a plain traceable
    function);
  * per-op-class slot costs are measured on the chip by the committed
    probe ``scripts/vpu_op_probe.py`` (injection differencing) and loaded
    from its artifact ``artifacts/roofline/op_weights.json``; the defaults
    below are that probe's results on TPU v5e;
  * the VPU issue rate is measured by ``measure_vpu_ops_per_s`` (dependent
    register-resident chains, iteration-count-differenced timing).

The flat model (every op = 1 slot) is reported alongside as a lower bound.
``scripts/roofline_validate.py`` checks the model against measured step
times across depth/scene/resolution sweeps (PERF.md "model vs measured").
"""
from __future__ import annotations

import functools
import json
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .opcount import kernel_op_counts

# Defaults = scripts/vpu_op_probe.py results on TPU v5 lite (see
# artifacts/roofline/op_weights.json for the committed raw measurement).
OP_WEIGHTS_DEFAULT = dict(basic=1.0, cmp=1.0, select=2.5, abs=1.5,
                          sign=2.0, recip_nr=5.0, rsqrt=8.0, sqrt=10.0,
                          div=10.0, floor=1.0)

_WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "..", "..",
                             "artifacts", "roofline", "op_weights.json")


@functools.lru_cache(maxsize=1)
def load_op_weights() -> Dict[str, float]:
    """Measured per-class slot costs: the committed probe artifact if
    present, else the defaults (same probe, run on TPU v5e)."""
    try:
        with open(_WEIGHTS_PATH) as fh:
            data = json.load(fh)
        return {**OP_WEIGHTS_DEFAULT, **data["weights"]}
    except (OSError, KeyError, ValueError):
        return dict(OP_WEIGHTS_DEFAULT)


def weighted_slots(counts: Dict[str, float],
                   weights: Dict[str, float] = None) -> float:
    """Sum of per-class counts priced at the measured slot costs.  Unknown
    classes (``other:*`` from the counter) price at 1 slot."""
    if weights is None:
        weights = load_op_weights()
    return float(sum(weights.get(k, 1.0) * v for k, v in counts.items()))


def flat_slots(counts: Dict[str, float]) -> float:
    return float(sum(counts.values()))


# ---------------------------------------------------------------------------
# Empirical VPU issue rate
# ---------------------------------------------------------------------------

_CHAIN_OPS = 3  # ops per element per iteration of the measurement chain


def _peak_kernel(x_ref, o_ref, *, iters: int, n_chains: int):
    # Non-foldable nonlinear recurrences, 3 un-fusable VPU slots per element
    # per iteration (mul, add, max) over ``n_chains`` independent register-
    # resident chains.  The tile must be small enough to live in vector
    # registers for all chains — a big tile spills to VMEM every iteration
    # and measures load/store bandwidth instead (observed 1.2 T "ops"/s for
    # a 256x512 tile vs 5.1 T for 32x256 x 2 chains on v5e).  y stays in
    # (0.5, 0.7): y*y < y, so the max takes the y+eps branch and the value
    # never diverges.
    ys = tuple(x_ref[:] * (1.0 + 0.001 * i) for i in range(n_chains))

    def body(_, ys):
        return tuple(jnp.maximum(y + 1e-8, y * y) for y in ys)

    ys = jax.lax.fori_loop(0, iters, body, ys)
    acc = ys[0]
    for y in ys[1:]:
        acc = acc + y
    o_ref[:] = acc


@functools.lru_cache(maxsize=4)
def measure_vpu_ops_per_s(block_h: int = 32, block_w: int = 256,
                          n_chains: int = 2, grid: int = 512,
                          iters: int = 65536, reps: int = 5) -> float:
    """Measured elementwise-VPU throughput (ops/s) on the default device —
    the SOL denominator for the kernels' op mix (mostly non-fusable
    cmp/select/add/mul slots).  The default shape (8 vregs x 2 chains) was
    the maximum over a register-residency sweep on TPU v5e (~5.1 Tops/s).

    Timing uses the iteration-count-difference method (cf. bench.py): the
    tunneled runtime has tens of ms of dispatch latency and an unreliable
    block_until_ready, so the rate comes from t(2K iters) - t(K iters) with
    the result scalar fetched to force completion — dispatch overhead
    cancels in the subtraction."""
    x = jnp.full((block_h * grid, block_w), 0.6, jnp.float32)
    tile = pl.BlockSpec((block_h, block_w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def make(n_iters):
        kern = functools.partial(_peak_kernel, iters=n_iters,
                                 n_chains=n_chains)
        return jax.jit(lambda x: jnp.float32(pl.pallas_call(
            kern, grid=(grid,), in_specs=[tile], out_specs=tile,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)[0, 0]))

    run1, run2 = make(iters), make(2 * iters)
    float(run1(x)); float(run2(x))  # compile both
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run1(x)); t1 = time.perf_counter()
        float(run2(x)); t2 = time.perf_counter()
        deltas.append(max((t2 - t1) - (t1 - t0), 1e-9))
    deltas.sort()
    med = deltas[len(deltas) // 2]  # median: robust to tunnel RTT jitter
    return x.size * _CHAIN_OPS * n_chains * iters / med


def sol_report(scene, config, pixels: int,
               fwd_s: float = None, fwd_bwd_s: float = None,
               vpu_ops_per_s: float = None) -> Dict[str, float]:
    """Roofline summary for a measured step time.

    Returns per-pixel slot counts (weighted = probe-measured op-class
    costs, flat = 1 slot/op lower bound), the measured VPU rate, the
    speed-of-light step times and the achieved ``sol_fraction``s (the
    primary fractions use the weighted model; ``*_flat`` are the
    conservative lower bounds).  The forward count is the chain forward
    kernel; the backward count is the fused L2-epilogue + hand-written
    replay adjoint, so fwd+bwd models the single-dispatch fused kernel
    exactly (the two-phase path differs only by residual HBM traffic)."""
    fwd_c, bwd_c = kernel_op_counts(scene, config)
    f_w, b_w = weighted_slots(fwd_c), weighted_slots(bwd_c)
    f_f, b_f = flat_slots(fwd_c), flat_slots(bwd_c)
    if vpu_ops_per_s is None:
        vpu_ops_per_s = measure_vpu_ops_per_s()
    out = dict(ops_per_pixel_fwd=round(f_f, 1),
               ops_per_pixel_bwd=round(b_f, 1),
               slots_per_pixel_fwd=round(f_w, 1),
               slots_per_pixel_bwd=round(b_w, 1),
               vpu_ops_per_s=vpu_ops_per_s,
               counts_fwd=fwd_c, counts_bwd=bwd_c)
    if fwd_s is not None:
        sol = f_w * pixels / vpu_ops_per_s
        out["sol_fwd_s"] = sol
        out["sol_fraction_fwd"] = sol / fwd_s
        out["sol_fraction_fwd_flat"] = f_f * pixels / vpu_ops_per_s / fwd_s
    if fwd_bwd_s is not None:
        sol = (f_w + b_w) * pixels / vpu_ops_per_s
        out["sol_fwd_bwd_s"] = sol
        out["sol_fraction_fwd_bwd"] = sol / fwd_bwd_s
        out["sol_fraction_fwd_bwd_flat"] = ((f_f + b_f) * pixels
                                            / vpu_ops_per_s / fwd_bwd_s)
    return out
