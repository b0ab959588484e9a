"""FlatScene — the structure-of-arrays scene pytree.

This is the TPU-native replacement for the reference's pointer-based composite
of ``RayObject`` subclasses (``Hw4/MySdlApplication.cpp:361-567``).  At build
time every object (tetrahedron/cube/quad/cylinder/cone/checkerboard) compiles
down to a triangle soup plus analytic spheres, exactly how the reference
builds them out of ``Triangle`` children (``:826-1061``); the composite's
bounding-sphere prune hierarchy (``Shape::intersection``, ``:747-758``)
flattens into per-primitive *group* ids indexing a small table of bounding
spheres (group 0 is always the whole-scene sphere, ``g_scene`` at ``:590``).

All coordinates are absolute world coordinates: the reference's accumulated
``positionOffset`` chain (scene position + object position, ``:739``) is baked
in at build time.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import SMALL_NUMBER


@struct.dataclass
class FlatScene:
    # --- spheres (Shape with _amSphere, MySdlApplication.cpp:747-793) ------
    sph_center: Any  # [Ns,3] f32 — world-space centers
    sph_radius: Any  # [Ns]   f32
    sph_mat: Any     # [Ns]   i32 — row into materials table
    sph_group: Any   # [Ns]   i32 — bounding-sphere prune group
    sph_valid: Any   # [Ns]   bool — padding mask

    # --- triangles (Triangle, MySdlApplication.cpp:380-437,611-707) --------
    tri_v0: Any      # [Nt,3] f32 — world-space vertices
    tri_v1: Any      # [Nt,3]
    tri_v2: Any      # [Nt,3]
    tri_mat: Any     # [Nt]   i32
    tri_checker: Any  # [Nt]  bool — procedural checkerboard material override
    tri_group: Any   # [Nt]   i32
    tri_valid: Any   # [Nt]   bool

    # --- bounding-sphere prune groups --------------------------------------
    grp_center: Any  # [G,3] f32 (group 0 = scene sphere)
    grp_radius: Any  # [G]   f32 (radius <= 0 -> group never prunes)

    # --- material table -----------------------------------------------------
    mat_ambient: Any       # [M,3]
    mat_diffuse: Any       # [M,3]
    mat_specular: Any      # [M,3]
    mat_transparency: Any  # [M,3]
    mat_refraction: Any    # [M]

    # --- lights (Light, MySdlApplication.cpp:214-232) ----------------------
    light_pos: Any    # [L,3]
    light_color: Any  # [L,3]

    # --- checkerboard parameters (CheckerBoard, :1064-1113) ----------------
    board_pos: Any     # [3] — world position of the board quad
    board_half: Any    # []  — half edge size (160)
    board_square: Any  # []  — square edge size (40)

    # --- static metadata ----------------------------------------------------
    #: material rows used for even/odd checker squares (white, black).
    checker_mats: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 1))
    #: True when every material's transparency is all-0 or all-1 so the
    #: iterative chain renderer is exact (see RenderConfig.mode).
    chain_exact: bool = struct.field(pytree_node=False, default=True)
    #: True when some material traces transmitted rays at all.
    has_transmission: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------ api
    @property
    def num_spheres(self) -> int:
        return self.sph_radius.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_groups(self) -> int:
        return self.grp_radius.shape[0]

    @property
    def num_materials(self) -> int:
        return self.mat_refraction.shape[0]

    @property
    def num_lights(self) -> int:
        return self.light_pos.shape[0]

    def astype(self, dtype) -> "FlatScene":
        """Cast all float leaves to ``dtype`` (int/bool leaves untouched)."""
        def cast(x):
            x = jnp.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x
        import jax
        return jax.tree_util.tree_map(cast, self)


def tri_derived(v0, v1, v2, small: float = SMALL_NUMBER):
    """Precomputed per-triangle quantities, exactly the ``Triangle``
    constructor (MySdlApplication.cpp:406-433): edge vectors u,v, unit plane
    normal n, the dot products uv/uu/vv, the barycentric denominator
    ``uv^2 - uu*vv`` and the degeneracy flag.

    Computed in-graph (not baked at build time) so vertex gradients flow.
    Returns a dict of arrays batched like the inputs.
    """
    u = v1 - v0
    v = v2 - v0
    n_raw = jnp.cross(u, v)
    n_len = jnp.sqrt(jnp.maximum(jnp.sum(n_raw * n_raw, -1), 1e-30))
    degenerate = n_len < small
    n = n_raw / n_len[..., None]
    uv = jnp.sum(u * v, -1)
    uu = jnp.sum(u * u, -1)
    vv = jnp.sum(v * v, -1)
    denominator = uv * uv - uu * vv
    degenerate = jnp.logical_or(degenerate, jnp.abs(denominator) < small)
    return dict(u=u, v=v, n=n, uv=uv, uu=uu, vv=vv,
                denominator=denominator, degenerate=degenerate)


def concat_scenes(a: FlatScene, b: FlatScene) -> FlatScene:  # pragma: no cover
    raise NotImplementedError("compose scenes at the builder level instead")


def _as_f(x, dtype=np.float32):
    return np.asarray(x, dtype=dtype)
