"""Shared scan-difference timing harness.

The tunneled TPU runtime has tens of milliseconds of per-dispatch latency and
an unreliable ``block_until_ready``, so per-iteration times come from the
difference between a 1-iteration and an N-iteration run of the same jitted
``lax.scan`` program, with the result scalar fetched to force completion —
dispatch overhead cancels in the subtraction.  A single estimate at small N
carries O(dispatch_jitter / (N-1)) noise (observed ±8% at N=8 on the
tunnel), which round 2's headline paid for: three runs of identical code
spanned 0.786–0.909 of speed-of-light.  This helper is the one timing
implementation used by bench.py, the tile/depth sweeps, and the scaling
sweep: N >= 32 by default and the median of ``reps`` independent estimates,
with the spread reported so any number near a bar is auditable.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, List


def scan_diff_median(run_1: Callable[[], None], run_n: Callable[[], None],
                     iters: int, reps: int = 3) -> Dict[str, object]:
    """Median-of-reps scan-difference timing.

    ``run_1`` / ``run_n``: zero-arg callables executing the SAME jitted
    program for 1 and ``iters`` iterations respectively, and blocking on the
    result (e.g. ``lambda: float(run(eps1))``).  Both must already be
    compiled (call each once before, or accept the first rep being warmup —
    this function calls each once up front and reports that as
    ``warmup_s``).

    Returns a dict:
      ``dt``        — median per-iteration seconds,
      ``dts``       — all per-rep estimates, sorted,
      ``spread``    — (max-min)/median of the estimates,
      ``method``    — "scan_diff", or "avg" when the difference was
                      sub-noise (<=100ns/iter) and the dispatch-inclusive
                      average of the N-run was used instead (tiny structural
                      runs on CPU meshes),
      ``warmup_s``  — wall time of the initial warmup pair.
    """
    if iters < 2:
        raise ValueError("iters must be >= 2 (the per-iteration time is the "
                         "difference between a 1-iter and an N-iter run)")
    t0 = time.perf_counter()
    run_1()
    run_n()
    warmup_s = time.perf_counter() - t0

    diffs: List[float] = []
    avgs: List[float] = []
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        run_1()
        t1 = time.perf_counter()
        run_n()
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / (iters - 1))
        avgs.append((t2 - t1) / iters)
    diffs.sort()
    avgs.sort()
    dt = diffs[len(diffs) // 2]
    method = "scan_diff"
    if dt <= 1e-7:
        dt = avgs[len(avgs) // 2]
        method = "avg"
        diffs = avgs
    spread = (diffs[-1] - diffs[0]) / dt if dt > 0 else 0.0
    return dict(dt=dt, dts=diffs, spread=spread, method=method,
                warmup_s=warmup_s)


def scan_runner(one_iter: Callable, iters: int):
    """The common bench shape: jit a ``lax.scan`` of ``one_iter(accum, eps)``
    over an iteration-dependent epsilon array (defeats CSE across
    iterations) and return the pair of zero-arg blocking callables for
    :func:`scan_diff_median`.

    ``one_iter``: ``(f32 accum, f32 eps) -> (f32 accum, None)``.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n_eps):
        total, _ = jax.lax.scan(one_iter, jnp.float32(0.0), n_eps)
        return total

    eps1 = jnp.linspace(0.0, 1e-5, 1).astype(jnp.float32)
    eps_n = jnp.linspace(0.0, 1e-5, iters).astype(jnp.float32)
    return (lambda: float(run(eps1))), (lambda: float(run(eps_n)))
