"""Multi-host initialization and the scaling-efficiency harness.

The reference has zero networking (SURVEY.md 2.3); the TPU-native scaling
story is: ``jax.distributed.initialize()`` on every host of a pod slice, one
global 1-D mesh over all chips, pixel tiles sharded, scene replicated,
gradient pmean over ICI/DCN.  The same SPMD code runs per-host — there are
no per-rank code paths, so the 8-virtual-device CPU tests exercise exactly
the code that runs on a pod.
"""
from __future__ import annotations

import time
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
                  iters: int = 4):
    """Strong-scaling sweep of the sharded fwd+bwd step over growing mesh
    sizes.  Returns a list of dicts (n, step_time_s, rays_per_s, efficiency
    vs the smallest mesh).  Efficiency numbers are only meaningful on real
    multi-chip hardware; on a virtual CPU mesh this validates structure, not
    speed (the 'devices' share one host's cores)."""
    import jax.numpy as jnp
    import optax

    from ..diff.fit import FitParams, make_sharded_fit_step
    from ..parallel.mesh import make_mesh
    from ..parallel.shard import render_image_sharded

    devices = jax.devices()
    if mesh_sizes is None:
        mesh_sizes = [n for n in (1, 2, 4, 8, 16, 32)
                      if n <= len(devices)]

    rows = []
    base_rate = None
    for n in mesh_sizes:
        mesh = make_mesh(devices[:n])
        target = render_image_sharded(scene, camera, config, mesh)
        tgt_flat = jnp.reshape(target, (-1, 3))
        pad = (-tgt_flat.shape[0]) % n
        if pad:
            tgt_flat = jnp.concatenate(
                [tgt_flat, jnp.tile(tgt_flat[-1:], (pad, 1))], 0)
        opt = optax.adam(0.05)
        step, (ii, jj) = make_sharded_fit_step(scene, camera, config,
                                               tgt_flat, opt, mesh)
        params = FitParams.from_scene(scene)
        state = opt.init(params)
        # warmup/compile
        params, state, loss = step(params, state, ii, jj, tgt_flat)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, state, loss = step(params, state, ii, jj, tgt_flat)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters
        rate = config.width * config.height / dt
        if base_rate is None:
            base_rate = rate / n  # per-device rate on the smallest mesh
        rows.append(dict(n=n, step_time_s=round(dt, 5),
                         rays_per_s=round(rate, 1),
                         efficiency=round(rate / (base_rate * n), 4),
                         loss=float(loss)))
    return rows
