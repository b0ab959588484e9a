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
# Static op counts (1 VPU op = one elementwise mul/add/sub/cmp/select/abs/
# sqrt/rsqrt/approx-recip over a tile plane; scalar-only SMEM arithmetic is
# free).  Each constant is keyed to the kernel code it counts.
# ---------------------------------------------------------------------------

# intersect_all (kernels/render_pallas.py::_make_tile_ops.intersect_all)
OPS_SWEEP_PROLOGUE = 12   # vlen2(5) cmp where rsqrt vlen(1) u(3)
OPS_PER_TRI = 62          # ndv(5) plane_ok(2) ndo(5) guard(1) recip(4)
                          # mm(2) pxyz(9) wu(5) wv(5) sb(4) tb(4)
                          # hit(11) dist(2) upd(1) blend(2)
OPS_PER_SPH = 37          # d(3) ud(5) disc(9) ok(1) guard(1) sqrt(1)
                          # gate(1) s(2) hit(9) dist(1) upd(1) blend(3)

# hit_attrs: per-primitive mask-blend loops + point/normal/checker epilogue
OPS_ATTR_PER_PRIM = 6     # 1 cmp + 5 selects
OPS_ATTR_EPILOGUE = 45    # point(7) normal(12+9) checker(14) mid(3)

OPS_PER_MAT = 16          # mat_attrs: 1 cmp + 15 selects
OPS_SECONDARY = 34        # secondary_dirs: cosi(5) refl(10) snell(19)
OPS_SHADE_PER_LIGHT = 55  # sv(3) d2(5) att(2) inv_sl(3) ndots(7) udotr(6)
                          # lit(3) w(2) rgb accumulate(24)
OPS_CHILD_SELECT = 24     # chain child-ray selection + throughput update

# backward (kernels/adjoint_fused.py::_bwd_tile_kernel)
OPS_BWD_CONST_TRI = 5     # per level per triangle: tri_attr blend
OPS_BWD_CONST_MAT = 6     # per level per material: mat_attr blend
OPS_BWD_CONST_MISC = 30   # thr chain + lit unpack per level
OPS_REPLAY_PER_SPH = 5    # sphere table blend inside the replay closure
OPS_REPLAY_PER_MAT = 10   # 9-field material blend inside the replay closure
OPS_REPLAY_LEVEL = 150    # fixed per-level replay math (dist/point/normal/
                          # secondary) — audited from the replay closure
OPS_REPLAY_PER_LIGHT = 55 # same shading arithmetic as the forward
VJP_FACTOR = 3.0          # fwd re-trace + ~2x reverse arithmetic


def count_forward_ops(ns: int, nt: int, m: int, nl: int, depth: int) -> float:
    """Exact per-pixel VPU op count of the chain forward kernel."""
    sweep = OPS_SWEEP_PROLOGUE + nt * OPS_PER_TRI + ns * OPS_PER_SPH
    per_level = (sweep                                   # primary closest-hit
                 + (nt + ns) * OPS_ATTR_PER_PRIM + OPS_ATTR_EPILOGUE
                 + m * OPS_PER_MAT
                 + OPS_SECONDARY
                 + nl * (sweep + OPS_SHADE_PER_LIGHT)    # shadow sweeps
                 + OPS_CHILD_SELECT)
    return (depth + 1) * per_level


def count_backward_ops(ns: int, nt: int, m: int, nl: int, depth: int) -> float:
    """Estimated per-pixel VPU op count of the fused backward kernel."""
    levels = depth + 1
    const_prep = levels * (nt * OPS_BWD_CONST_TRI + m * OPS_BWD_CONST_MAT
                           + OPS_BWD_CONST_MISC)
    replay = levels * (ns * OPS_REPLAY_PER_SPH + m * OPS_REPLAY_PER_MAT
                       + OPS_REPLAY_LEVEL + nl * OPS_REPLAY_PER_LIGHT)
    return const_prep + VJP_FACTOR * replay


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

    Returns the per-pixel op counts, the measured VPU rate, the
    speed-of-light step times and the achieved ``sol_fraction``s."""
    dims = scene_dims(scene)
    dims["nl"] = nl
    f_ops = count_forward_ops(depth=depth, **dims)
    b_ops = count_backward_ops(depth=depth, **dims)
    if vpu_ops_per_s is None:
        vpu_ops_per_s = measure_vpu_ops_per_s()
    out = dict(ops_per_pixel_fwd=f_ops, ops_per_pixel_bwd=b_ops,
               vpu_ops_per_s=vpu_ops_per_s, **dims)
    if fwd_s is not None:
        sol = f_ops * pixels / vpu_ops_per_s
        out["sol_fwd_s"] = sol
        out["sol_fraction_fwd"] = sol / fwd_s
    if fwd_bwd_s is not None:
        sol = (f_ops + b_ops) * pixels / vpu_ops_per_s
        out["sol_fwd_bwd_s"] = sol
        out["sol_fraction_fwd_bwd"] = sol / fwd_bwd_s
    return out
