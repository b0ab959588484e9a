"""Speed-of-light (roofline) model for the fused Pallas kernels.

The render kernels are pure VPU programs: every op is an elementwise f32
mul/add/compare/select over [BH, BW] tile planes, there are no matmuls
(nothing for the MXU) and — once a tile's rays and scene tables are in
VMEM/SMEM — no HBM traffic inside the bounce loop (HBM moves only the ray
planes in and RGB planes out: ~24 B/pixel against >9,000 ops/pixel, so the
kernel is compute-bound by 3 orders of magnitude).  Speed of light is
therefore the VPU issue rate:

    SOL step time = (ops per pixel) * pixels / (measured VPU ops/s)
    sol_fraction  = SOL step time / measured step time

``count_forward_ops`` is an exact static count of the chain kernel's per-
pixel VPU ops (kernels/render_pallas.py, audited per line); the backward
count is const-prep (exact) plus the replay closure ops times a reverse-mode
factor of 3 (one forward re-trace plus ~2x for the adjoint arithmetic — the
standard estimate; jax.vjp emits the reverse program inside the kernel).
``measure_vpu_ops_per_s`` measures the denominator empirically on the
running chip with a synthetic Pallas kernel (dependent op chains over a full
tile: 64+ vector registers in flight, so the measurement is throughput, not
latency).
"""
from __future__ import annotations

import functools
import time
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Static op counts, split by op class (scalar-only SMEM arithmetic is free).
# Each table row is keyed to the kernel code it counts.  Class costs in VPU
# issue slots were measured on v5e with dependent-chain microbenchmarks
# (scripts/README in PERF.md): cheap arithmetic ~1 slot; select ~2.5; abs
# ~1.5; approx-recip+Newton ~5; rsqrt ~8; sqrt/divide ~10; trunc ~4; mod ~10
# (mod lowers to divide+trunc+mul+sub).  The flat model (every op = 1 slot)
# is reported alongside as a lower bound.
# ---------------------------------------------------------------------------

OP_WEIGHTS = dict(basic=1.0, cmp=1.0, select=2.5, abs=1.5, recip_nr=5.0,
                  rsqrt=8.0, sqrt=10.0, div=10.0, trunc=4.0, mod=10.0)

# op-class vectors: {class: count}
# intersect_all (kernels/render_pallas.py::_make_tile_ops.intersect_all)
SWEEP_PROLOGUE = dict(basic=9, cmp=1, select=1, rsqrt=1)
PER_TRI = dict(basic=42, cmp=9, select=6, abs=1, recip_nr=1)
                          # ndv/ndo/pxyz/wu/wv/sb/tb + hit gates + blends
PER_SPH = dict(basic=26, cmp=5, select=5, sqrt=1)

# hit_attrs: per-primitive mask-blend loops + point/normal/checker epilogue
# (checker parity is mod-free: scalar recip + mul + 3 truncs + cmp)
ATTR_PER_PRIM = dict(cmp=1, select=5)
ATTR_EPILOGUE = dict(basic=27, cmp=4, select=12, rsqrt=1, trunc=3)

PER_MAT = dict(cmp=1, select=15)          # mat_attrs
SECONDARY = dict(basic=29, cmp=1, select=3, sqrt=1)
SECONDARY_NOTRANS = dict(basic=12)        # Snell statically gated off
SHADE_PER_LIGHT = dict(basic=46, cmp=3, select=2, abs=2, rsqrt=1, div=1)
CHILD_SELECT = dict(basic=13, cmp=3, select=8)

# backward (kernels/adjoint_fused.py::_bwd_tile_kernel), flat counts
OPS_BWD_CONST_TRI = 5     # per level per triangle: tri_attr blend
OPS_BWD_CONST_MAT = 6     # per level per material: mat_attr blend
OPS_BWD_CONST_MISC = 30   # thr chain + lit unpack per level
OPS_REPLAY_PER_SPH = 5    # sphere table blend inside the replay closure
OPS_REPLAY_PER_MAT = 10   # 9-field material blend inside the replay closure
OPS_REPLAY_LEVEL = 150    # fixed per-level replay math (dist/point/normal/
                          # secondary) — audited from the replay closure
OPS_REPLAY_PER_LIGHT = 55 # same shading arithmetic as the forward
VJP_FACTOR = 3.0          # fwd re-trace + ~2x reverse arithmetic


def _cost(vec: Dict[str, float], weighted: bool) -> float:
    if not weighted:
        return float(sum(vec.values()))
    return float(sum(OP_WEIGHTS[k] * v for k, v in vec.items()))


def count_forward_ops(ns: int, nt: int, m: int, nl: int, depth: int,
                      weighted: bool = False,
                      want_trans: bool = False) -> float:
    """Per-pixel VPU slot count of the chain forward kernel.

    ``weighted=False``: every op = 1 slot (lower bound).  ``weighted=True``:
    measured per-class slot costs (OP_WEIGHTS) — the honest roofline.
    ``want_trans``: whether the scene has transmitting materials (the
    kernel statically skips Snell otherwise)."""
    c = lambda vec: _cost(vec, weighted)
    sweep = c(SWEEP_PROLOGUE) + nt * c(PER_TRI) + ns * c(PER_SPH)
    secondary = c(SECONDARY if want_trans else SECONDARY_NOTRANS)
    per_level = (sweep                                   # primary closest-hit
                 + (nt + ns) * c(ATTR_PER_PRIM) + c(ATTR_EPILOGUE)
                 + m * c(PER_MAT)
                 + secondary
                 + nl * (sweep + c(SHADE_PER_LIGHT))     # shadow sweeps
                 + c(CHILD_SELECT))
    return (depth + 1) * per_level


def count_backward_ops(ns: int, nt: int, m: int, nl: int, depth: int,
                       weighted: bool = False,
                       want_trans: bool = False) -> float:
    """Estimated per-pixel VPU slot count of the fused backward kernel.
    The weighted variant scales the flat count by the forward model's
    weighted/flat ratio (the two kernels share the same op mix)."""
    levels = depth + 1
    const_prep = levels * (nt * OPS_BWD_CONST_TRI + m * OPS_BWD_CONST_MAT
                           + OPS_BWD_CONST_MISC)
    replay_level = OPS_REPLAY_LEVEL - (0 if want_trans else 19)  # Snell gate
    replay = levels * (ns * OPS_REPLAY_PER_SPH + m * OPS_REPLAY_PER_MAT
                       + replay_level + nl * OPS_REPLAY_PER_LIGHT)
    flat = const_prep + VJP_FACTOR * replay
    if not weighted:
        return flat
    ratio = (count_forward_ops(ns, nt, m, nl, depth, weighted=True,
                               want_trans=want_trans)
             / count_forward_ops(ns, nt, m, nl, depth, weighted=False,
                                 want_trans=want_trans))
    return flat * ratio


def scene_dims(scene) -> Dict[str, int]:
    """(ns, nt, m, nl) as the kernel sees them (padding compacted)."""
    import numpy as np
    return dict(ns=int(np.asarray(scene.sph_valid).sum()),
                nt=int(np.asarray(scene.tri_valid).sum()),
                m=scene.num_materials, nl=scene.num_lights)


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


def sol_report(scene, depth: int, nl: int, pixels: int,
               fwd_s: float = None, fwd_bwd_s: float = None,
               vpu_ops_per_s: float = None) -> Dict[str, float]:
    """Roofline summary for a measured step time.

    Returns per-pixel slot counts (weighted = measured op-class costs,
    flat = 1 slot/op lower bound), the measured VPU rate, the
    speed-of-light step times and the achieved ``sol_fraction``s (the
    primary fractions use the weighted model; ``*_flat`` are the
    conservative lower bounds)."""
    dims = scene_dims(scene)
    dims["nl"] = nl
    dims["want_trans"] = bool(scene.has_transmission)
    f_w = count_forward_ops(depth=depth, weighted=True, **dims)
    b_w = count_backward_ops(depth=depth, weighted=True, **dims)
    f_f = count_forward_ops(depth=depth, weighted=False, **dims)
    b_f = count_backward_ops(depth=depth, weighted=False, **dims)
    if vpu_ops_per_s is None:
        vpu_ops_per_s = measure_vpu_ops_per_s()
    out = dict(ops_per_pixel_fwd=f_f, ops_per_pixel_bwd=b_f,
               slots_per_pixel_fwd=round(f_w, 1),
               slots_per_pixel_bwd=round(b_w, 1),
               vpu_ops_per_s=vpu_ops_per_s, **dims)
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
