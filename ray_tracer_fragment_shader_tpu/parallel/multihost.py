"""Multi-host initialization and the scaling-efficiency harness.

The reference has zero networking (SURVEY.md 2.3); the TPU-native scaling
story is: ``jax.distributed.initialize()`` on every host of a pod slice, one
global 1-D mesh over all chips, pixel tiles sharded, scene replicated,
gradient pmean over ICI/DCN.  The same SPMD code runs per-host — there are
no per-rank code paths, so the 8-virtual-device CPU tests exercise exactly
the code that runs on a pod.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up (no-op on a single host).  On TPU pods the
    arguments are auto-detected from the environment."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def scaling_sweep(scene, camera, config, mesh_sizes: Optional[List[int]] = None,
                  iters: int = 4, backend: str = "pallas",
                  block_h: int = 8, block_w: int = 512, reps: int = 3):
    """Strong-scaling sweep of the sharded fwd+bwd step over growing mesh
    sizes.  Returns a list of dicts (n, step_time_s, rays_per_s, efficiency
    vs the smallest mesh).  Efficiency numbers are only meaningful on real
    multi-chip hardware; on a virtual CPU mesh this validates structure, not
    speed (the 'devices' share one host's cores).

    ``backend="pallas"`` (default) sweeps the FAST path — per-band fused
    Pallas forward + in-kernel adjoint with psum'd grads — so the per-chip
    rate the sweep scales is the headline kernel rate, not the XLA
    correctness harness (``backend="core"``)."""
    import jax.numpy as jnp
    import optax

    from ..diff.fit import (FitParams, make_sharded_fit_step,
                            make_sharded_fit_step_pallas)
    from ..parallel.mesh import make_mesh
    from ..parallel.shard import render_image_sharded

    devices = jax.devices()
    iters = max(iters, 2)
    if mesh_sizes is None:
        mesh_sizes = [n for n in (1, 2, 4, 8, 16, 32)
                      if n <= len(devices)]

    rows = []
    base_rate = None
    for n in mesh_sizes:
        mesh = make_mesh(devices[:n])
        target = render_image_sharded(scene, camera, config, mesh,
                                      backend=backend,
                                      block_h=block_h, block_w=block_w)
        opt = optax.adam(0.05)
        params = FitParams.from_scene(scene)
        state = opt.init(params)
        if backend == "pallas":
            step, tgt = make_sharded_fit_step_pallas(
                scene, camera, config, target, opt, mesh,
                block_h=block_h, block_w=block_w)
            args = (tgt,)
        else:
            tgt_flat = jnp.reshape(target, (-1, 3))
            pad = (-tgt_flat.shape[0]) % n
            if pad:
                tgt_flat = jnp.concatenate(
                    [tgt_flat, jnp.tile(tgt_flat[-1:], (pad, 1))], 0)
            step, (ii, jj) = make_sharded_fit_step(scene, camera, config,
                                                   tgt_flat, opt, mesh)
            args = (ii, jj, tgt_flat)
        # Shared scan-difference timing (utils/timing.py, cf. bench.py):
        # all iterations inside one jitted lax.scan so per-dispatch latency
        # (tens of ms through the tunnel) cancels, median over ``reps``.
        from ..utils.timing import scan_diff_median

        def make_runner(k):
            @jax.jit
            def run(params, state, *args):
                def body(carry, _):
                    p, s = carry
                    p, s, loss = step(p, s, *args)
                    return (p, s), loss
                (p, s), losses = jax.lax.scan(body, (params, state), None,
                                              length=k)
                return p, s, losses[-1]
            return run

        run1, run_n = make_runner(1), make_runner(iters)
        loss_box = [None]

        def call(run):
            def go():
                _, _, loss = run(params, state, *args)
                jax.block_until_ready(loss)
                loss_box[0] = loss
            return go

        timing = scan_diff_median(call(run1), call(run_n), iters, reps=reps)
        dt = timing["dt"]
        rate = config.width * config.height / dt
        if base_rate is None:
            base_rate = rate / n  # per-device rate on the smallest mesh
        rows.append(dict(n=n, step_time_s=round(dt, 9),
                         rays_per_s=round(rate, 1),
                         efficiency=round(rate / (base_rate * n), 4),
                         # "avg" = scan-difference was sub-noise and the row
                         # fell back to dispatch-inclusive averaging
                         timing_method=timing["method"],
                         timing_spread=round(timing["spread"], 4),
                         loss=float(loss_box[0])))
    return rows
