"""Sharded rendering and gradient reduction via shard_map.

Pixel tiles shard across the mesh; the scene/camera pytrees are replicated.
Forward needs no communication at all (tiles are independent); backward
all-reduces the replicated-parameter gradients with ``psum`` over ICI —
the TPU-native equivalent of the reference's (absent) multi-process story
(SURVEY.md section 2.3).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import RenderConfig
from ..core.renderer import render_pixels
from ..ops.rays import Camera
from ..scene.flat import FlatScene
from .mesh import TILE_AXIS, make_mesh


def _pixel_index_arrays(width: int, height: int, n_shards: int):
    """Flat (i, j) pixel index arrays padded to a multiple of n_shards.
    Padding pixels are rendered (cheap, they trace the same scene) and
    dropped on reshape."""
    total = width * height
    pad = (-total) % n_shards
    idx = jnp.arange(total + pad, dtype=jnp.int32)
    idx = jnp.minimum(idx, total - 1)  # clamp padding to the last real pixel
    ii = idx % width
    jj = idx // width
    return ii, jj, total


def render_image_sharded(scene: FlatScene, camera: Camera,
                         config: RenderConfig, mesh: Optional[Mesh] = None,
                         axis: str = TILE_AXIS):
    """Full-frame render with pixel tiles sharded over the mesh -> [H,W,3].

    The result is produced as a sharded global array; callers on a
    multi-host pod keep it device-local (only fetch for preview/IO).
    """
    mesh = make_mesh() if mesh is None else mesh
    n = mesh.devices.size
    ii, jj, total = _pixel_index_arrays(config.width, config.height, n)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    def tile_render(scene, camera, ii, jj):
        return render_pixels(scene, camera, config.width, config.height,
                             config, ij=(ii, jj))

    flat = tile_render(scene, camera, ii, jj)
    return flat[:total].reshape(config.height, config.width, 3)


def sharded_value_and_grad(loss_fn, mesh: Optional[Mesh] = None,
                           axis: str = TILE_AXIS):
    """Wrap a per-shard loss ``loss_fn(params, shard_batch) -> scalar`` into
    a mesh-wide value_and_grad with psum'd loss and gradients.

    ``params`` is replicated; ``shard_batch`` pytree is sharded along its
    leading axis.  The psum of parameter gradients is the single collective
    of the training step (overlapped with backward compute by XLA).
    """
    mesh = make_mesh() if mesh is None else mesh

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(axis)), out_specs=(P(), P()),
                       check_vma=False)
    def vg(params, batch):
        value, grads = jax.value_and_grad(loss_fn)(params, batch)
        value = jax.lax.pmean(value, axis)
        grads = jax.lax.pmean(grads, axis)
        return value, grads

    return vg
