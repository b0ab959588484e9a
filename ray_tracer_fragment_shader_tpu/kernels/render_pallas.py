"""Fused Pallas forward render kernel — the "fragment shader" the reference
assignment planned but never finished (Hw4/TODO.txt:13-33: fullscreen quad,
scene as uniform arrays of structs, intersection as plain functions), realized
as a TPU kernel.

One kernel invocation renders a (BH, 128*k) pixel tile end-to-end: camera
rays in, RGB out.  The whole bounce chain — closest-hit over all primitives,
transparency-aware shadow rays, Phong shading with distance attenuation,
reflect/transmit child-ray selection — runs in VMEM registers with zero HBM
round-trips between stages.  Scene parameters live in SMEM as scalar tables
(the TODO's "uniform arrays of structs"), looped over with fori_loop.

Scope (matches the chain renderer, core/renderer.py):
  * chain-exact scenes (every material transparency all-0 or all-1 — true of
    all reference materials); scenes needing the full bounce tree fall back
    to the XLA tree renderer;
  * bounding-sphere pruning is skipped: for well-formed scenes (geometry
    inside its bounding spheres) it is a pure optimization with no image
    effect (tested in test_oracle_parity.py); closest-hit over <=100
    primitives is cheaper than the prune arithmetic at tile granularity;
  * the origin-primitive exclusion (SEMANTICS.md D1) is preserved exactly.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..ops.rays import Camera, primary_rays, sample_jitter, screen_points
from ..scene.flat import FlatScene, tri_derived
from ..utils import fastmath

BIG = 3.0e38

# Mosaic scoped-VMEM ceiling for every render/adjoint kernel.  The default
# 16 MiB scoped limit exists to leave double-buffering headroom for
# HBM-streaming kernels; these kernels move ~24 B/pixel against ~11k VPU
# slots/pixel (compute-bound by 3 orders), so trading pipelining headroom
# for larger tiles is free.  (Per-fori-iteration scalar bookkeeping is no
# longer the block-size driver — the sweeps unroll, see _sweep_loop; the
# round-4 tile sweep picked 8x512 for both fwd and fwd+bwd.)  v5e has
# 128 MiB of VMEM.
VMEM_LIMIT_BYTES = int(os.environ.get("RTFS_VMEM_LIMIT_MB", "100")) * 2**20


def kernel_compiler_params() -> "pltpu.CompilerParams":
    """CompilerParams shared by all render/adjoint pallas_calls (ignored in
    interpret mode)."""
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)

# SMEM table layouts (one row per primitive/material/light)
SPH_COLS = 8    # cx cy cz r mat valid transp_any -
TRI_COLS = 24   # v0(3) n(3) u(3) v(3) uv uu vv denom ndotv0 mat checker degenerate+valid(=ok) transp_any - -
MAT_COLS = 20   # amb(3) dif(3) spe(3) trn(3) rho take_trans refl_ok transp_any - - -
LIGHT_COLS = 8  # pos(3) color(3) - -
MISC_COLS = 16  # eye(3) board_pos(3) board_half board_square - -


def compact_scene(scene: FlatScene) -> FlatScene:
    """Drop padding primitives when the *valid masks* are concrete (the
    float arrays may still be traced — the static-index gather keeps
    gradients flowing to the original padded arrays).  Deterministic: the
    forward kernel's primitive ids and the replay adjoint's tables stay
    consistent because both call this."""
    try:
        tv = np.asarray(scene.tri_valid)
        sv = np.asarray(scene.sph_valid)
    except Exception:
        return scene  # traced masks: keep padding, valid flags mask it
    if tv.all() and sv.all():
        return scene
    take_t = np.nonzero(tv)[0]
    take_s = np.nonzero(sv)[0]
    return scene.replace(
        tri_v0=scene.tri_v0[take_t], tri_v1=scene.tri_v1[take_t],
        tri_v2=scene.tri_v2[take_t], tri_mat=scene.tri_mat[take_t],
        tri_checker=scene.tri_checker[take_t],
        tri_group=scene.tri_group[take_t],
        tri_valid=scene.tri_valid[take_t],
        sph_center=scene.sph_center[take_s],
        sph_radius=scene.sph_radius[take_s],
        sph_mat=scene.sph_mat[take_s],
        sph_group=scene.sph_group[take_s],
        sph_valid=scene.sph_valid[take_s])


def pack_scene(scene: FlatScene) -> Dict[str, Any]:
    """FlatScene -> SMEM scalar tables (the kernel's 'uniforms').
    Padding primitives are compacted away when the masks are concrete."""
    scene = compact_scene(scene)
    f32 = jnp.float32
    ns, nt, m, l = (scene.num_spheres, scene.num_triangles,
                    scene.num_materials, scene.num_lights)

    # per-material "any transparency" flag, denormalized onto each primitive
    # so the shadow sweep can carry the occluder's transparency directly
    # (shadow test semantics: MySdlApplication.cpp:1221)
    t_any_mat = jnp.any(scene.mat_transparency.astype(f32) != 0.0, -1
                        ).astype(f32)

    sph = jnp.zeros((max(ns, 1), SPH_COLS), f32)
    sph = sph.at[:ns, 0:3].set(scene.sph_center.astype(f32))
    sph = sph.at[:ns, 3].set(scene.sph_radius.astype(f32))
    sph = sph.at[:ns, 4].set(scene.sph_mat.astype(f32))
    sph = sph.at[:ns, 5].set(scene.sph_valid.astype(f32))
    sph = sph.at[:ns, 6].set(t_any_mat[scene.sph_mat])

    der = tri_derived(scene.tri_v0.astype(f32), scene.tri_v1.astype(f32),
                      scene.tri_v2.astype(f32))
    tri = jnp.zeros((max(nt, 1), TRI_COLS), f32)
    tri = tri.at[:nt, 0:3].set(scene.tri_v0.astype(f32))
    tri = tri.at[:nt, 3:6].set(der["n"])
    tri = tri.at[:nt, 6:9].set(der["u"])
    tri = tri.at[:nt, 9:12].set(der["v"])
    tri = tri.at[:nt, 12].set(der["uv"])
    tri = tri.at[:nt, 13].set(der["uu"])
    tri = tri.at[:nt, 14].set(der["vv"])
    tri = tri.at[:nt, 15].set(der["denominator"])
    tri = tri.at[:nt, 16].set(jnp.sum(der["n"] * scene.tri_v0.astype(f32), -1))
    tri = tri.at[:nt, 17].set(scene.tri_mat.astype(f32))
    tri = tri.at[:nt, 18].set(scene.tri_checker.astype(f32))
    ok = jnp.logical_and(scene.tri_valid, ~der["degenerate"]).astype(f32)
    tri = tri.at[:nt, 19].set(ok)
    # checker squares are both opaque, so the material row's flag is correct
    # for checker-overridden triangles too
    tri = tri.at[:nt, 20].set(t_any_mat[scene.tri_mat])

    small = 1e-4  # |T| > SMALL check of the transmit gate (:1238)
    T = scene.mat_transparency.astype(f32)
    t_any = jnp.any(T != 0.0, -1)
    t_len = jnp.sqrt(jnp.sum(T * T, -1))
    take_trans = jnp.logical_and(t_any, t_len > small)
    refl_ok = jnp.any((1.0 - T) != 0.0, -1)
    mat = jnp.zeros((max(m, 1), MAT_COLS), f32)
    mat = mat.at[:m, 0:3].set(scene.mat_ambient.astype(f32))
    mat = mat.at[:m, 3:6].set(scene.mat_diffuse.astype(f32))
    mat = mat.at[:m, 6:9].set(scene.mat_specular.astype(f32))
    mat = mat.at[:m, 9:12].set(T)
    mat = mat.at[:m, 12].set(scene.mat_refraction.astype(f32))
    mat = mat.at[:m, 13].set(take_trans.astype(f32))
    mat = mat.at[:m, 14].set(refl_ok.astype(f32))
    mat = mat.at[:m, 15].set(t_any.astype(f32))

    light = jnp.zeros((max(l, 1), LIGHT_COLS), f32)
    light = light.at[:l, 0:3].set(scene.light_pos.astype(f32))
    light = light.at[:l, 3:6].set(scene.light_color.astype(f32))

    misc = jnp.zeros((MISC_COLS,), f32)
    misc = misc.at[3:6].set(scene.board_pos.astype(f32))
    misc = misc.at[6].set(scene.board_half.astype(f32))
    misc = misc.at[7].set(scene.board_square.astype(f32))
    return dict(sph=sph, tri=tri, mat=mat, light=light, misc=misc)


# full-unroll threshold and partial-unroll factor for _sweep_loop's "auto"
_SWEEP_FULL_MAX = 32
_SWEEP_CHUNK = 8


def _sweep_loop(n, body, init):
    """The primitive/material sweep loop of the tile kernels.

    Per-iteration fori_loop bookkeeping (loop branch + dynamic SMEM
    addressing on the scalar core) measured 27% of the FORWARD step at
    32x256 (scripts/unroll_probe.py: 3.08 -> 2.23 ms at 1024^2 depth 3),
    so the default policy "auto" unrolls: fully for small trip counts
    (constant SMEM addresses, straight-line code), and in chunks of
    ``_SWEEP_CHUNK`` for large ones (64-sphere scenes) so the Mosaic
    program stays bounded while bookkeeping amortizes 8x.  Values are
    bit-identical in every mode (same op order).  Trace-time knob
    ``RTFS_SWEEP_UNROLL``: "auto" (default), "1" = always full,
    "0" = plain fori_loop (the A/B baseline).

    CAVEAT (applies to every RTFS_* env knob in this package:
    RTFS_SWEEP_UNROLL, RTFS_LEVEL_UNROLL, RTFS_FWD_OV, RTFS_BWD_RECOMPUTE,
    RTFS_FIT_MODE): the env var is read at TRACE time and is not part of
    the jit cache key — flipping it in-process after a jitted caller has
    traced has no effect until that caller retraces (new closure, changed
    static args, or ``jax.clear_caches()``).  The A/B scripts rebuild their
    closures per setting for exactly this reason; set the knobs before the
    first call in normal use."""
    mode = os.environ.get("RTFS_SWEEP_UNROLL", "auto")
    if mode == "0":
        return jax.lax.fori_loop(0, n, body, init)
    if mode == "1" or n <= _SWEEP_FULL_MAX:
        c = init
        for i in range(n):
            c = body(jnp.int32(i), c)
        return c
    k = _SWEEP_CHUNK
    main = n - n % k

    def block(b, c):
        i0 = b * k
        for d in range(k):
            c = body(i0 + d, c)
        return c

    c = jax.lax.fori_loop(0, main // k, block, init)
    for i in range(main, n):
        c = body(jnp.int32(i), c)
    return c


def _make_tile_ops(sph_ref, tri_ref, mat_ref, light_ref, misc_ref, shape,
                   *, ns: int, nt: int, m: int, nl: int,
                   small: float, atten: float,
                   white_id: int, black_id: int, fast_recip: bool,
                   all_opaque: bool = False, bf16_shading: bool = False):
    """Shared per-tile primitives for the chain and tree kernels: closest-hit
    sweep, winning-primitive/material gathers, secondary directions, and the
    shadow+Phong shading loop.  All functions operate on [BH,BW] f32 planes
    held in vector registers/VMEM.

    ``all_opaque`` (static): no scene material is transparent, so shadow
    sweeps run in any-hit mode (no nearest-occluder ordering — see
    ``intersect_all``).  Callers pass ``not scene.has_transmission``.

    ``bf16_shading`` (static, opt-in — RenderConfig.bf16_shading): the
    any-hit shadow sweeps and the Phong blend run their mul/fma arithmetic
    in bfloat16 (2-per-lane on the v5e VPU), with f32 upcasts at every
    compare and reciprocal (Mosaic rejects bf16 cmp/rsqrt outright —
    PERF.md §7).  Primary intersection, normals, secondary directions and
    all epsilon tests stay f32.  Nearest-occluder shadow sweeps of
    transparent scenes stay f32 too (ordering is distance-precision
    sensitive)."""
    f32 = jnp.float32
    bf = jnp.bfloat16

    def full(x):
        return jnp.full(shape, x, f32)

    board_x, board_z = misc_ref[3], misc_ref[5]
    board_half, board_sq = misc_ref[6], misc_ref[7]

    def _recip(den):
        """den is pre-guarded nonzero.  Mosaic's f32 divide is multi-slot;
        the HW reciprocal + one Newton step is ~1-ulp and much cheaper."""
        return fastmath.recip(den, fast_recip)

    def intersect_all(ox, oy, oz, vx, vy, vz, excl, ray_ok,
                      carry_transp=False, any_hit=False):
        """Closest hit over all primitives (triangles first: insertion-order
        tie-breaking like Shape::intersection's strict <).

        ``carry_transp``: carry the winner's material transparency-nonzero
        flag instead of its primitive id (shadow queries need only that,
        MySdlApplication.cpp:1221 — saves the post-sweep attribute loops).
        ``any_hit``: return only an occluded mask (f32 0/1 plane) — no
        distance ordering, no winner tracking.  Valid ONLY for all-opaque
        scenes, where "lit = nearest occluder missing or transparent"
        (MySdlApplication.cpp:1221) degenerates to "lit = no occluder":
        with no transparent material the nearest-occluder identity cannot
        change the answer.  Saves the per-primitive dist/argmin selects of
        the shadow sweeps.  (The accumulator is an f32 plane, not bool —
        i1 vector fori_loop carries are Mosaic-illegal.)"""
        vlen2 = vx * vx + vy * vy + vz * vz
        ok = jnp.logical_and(ray_ok, vlen2 > 0.0)
        inv_vlen = jax.lax.rsqrt(jnp.where(ok, vlen2, 1.0))
        vlen = vlen2 * inv_vlen  # sqrt(x) = x * rsqrt(x)
        ux, uy, uz = vx * inv_vlen, vy * inv_vlen, vz * inv_vlen

        def tri_hit(i):
            """(hit, mm): the hit predicate and parametric distance of
            triangle ``i`` — shared by the closest-hit and any-hit modes."""
            nx, ny, nz = tri_ref[i, 3], tri_ref[i, 4], tri_ref[i, 5]
            ndv = nx * vx + ny * vy + nz * vz
            plane_ok = jnp.abs(ndv) >= small
            ndo = nx * ox + ny * oy + nz * oz
            mm = (tri_ref[i, 16] - ndo) * _recip(jnp.where(plane_ok, ndv, 1.0))
            # barycentric via precomputed edge dots
            px = ox + mm * vx - tri_ref[i, 0]
            py = oy + mm * vy - tri_ref[i, 1]
            pz = oz + mm * vz - tri_ref[i, 2]
            wu = px * tri_ref[i, 6] + py * tri_ref[i, 7] + pz * tri_ref[i, 8]
            wv = px * tri_ref[i, 9] + py * tri_ref[i, 10] + pz * tri_ref[i, 11]
            uv, uu, vv_ = tri_ref[i, 12], tri_ref[i, 13], tri_ref[i, 14]
            inv_den = 1.0 / tri_ref[i, 15]
            sb = (uv * wv - vv_ * wu) * inv_den
            tb = (uv * wu - uu * wv) * inv_den
            hit = (plane_ok & (mm >= small) & (sb >= 0.0) & (tb >= 0.0)
                   & (sb + tb <= 1.0) & ok & (excl != i.astype(f32))
                   & (tri_ref[i, 19] > 0.5))
            return hit, mm

        def sph_hit(i):
            """(hit, s): hit predicate and Euclidean distance of sphere
            ``i`` (near root only, like Shape::intersection :752)."""
            dx = sph_ref[i, 0] - ox
            dy = sph_ref[i, 1] - oy
            dz = sph_ref[i, 2] - oz
            ud = ux * dx + uy * dy + uz * dz
            rad = sph_ref[i, 3]
            disc = ud * ud - (dx * dx + dy * dy + dz * dz) + rad * rad
            disc_ok = disc > 0.0
            s = ud - jnp.sqrt(jnp.where(disc_ok, disc, 1.0)) * jnp.where(disc_ok, 1.0, 0.0)
            hit = ((disc >= 0.0) & (s >= small) & ok
                   & (excl != (i + nt).astype(f32))
                   & (sph_ref[i, 5] > 0.5))
            return hit, s

        if any_hit:
            if bf16_shading:
                # bf16 sweep arithmetic (f32 upcasts at compares/recip/sqrt
                # — Mosaic has no bf16 cmp/rsqrt, and no SCALAR-core bf16
                # arithmetic at all: SMEM scalars stay f32 and are
                # splat-cast to bf16 planes only where they meet vector
                # operands).  Shadow occlusion is a BOOLEAN outcome, so
                # bf16 only moves decision boundaries (documented looser
                # parity, RenderConfig.bf16_shading).
                def cb(x):
                    return jnp.asarray(x).astype(bf)

                def cbs(x):  # f32 SMEM scalar -> splatted bf16 plane
                    return jnp.broadcast_to(x, shape).astype(bf)

                def cf(x):
                    return x.astype(f32)

                oxb, oyb, ozb = cb(ox), cb(oy), cb(oz)
                vxb, vyb, vzb = cb(vx), cb(vy), cb(vz)
                uxb, uyb, uzb = cb(ux), cb(uy), cb(uz)

                def tri_body_any(i, acc):
                    nxs, nys, nzs = (cbs(tri_ref[i, 3]), cbs(tri_ref[i, 4]),
                                     cbs(tri_ref[i, 5]))
                    ndv = cf(nxs * vxb + nys * vyb + nzs * vzb)
                    plane_ok = jnp.abs(ndv) >= small
                    ndo = cf(nxs * oxb + nys * oyb + nzs * ozb)
                    mm = ((tri_ref[i, 16] - ndo)
                          * _recip(jnp.where(plane_ok, ndv, 1.0)))
                    mmb = cb(mm)
                    px = oxb + mmb * vxb - cbs(tri_ref[i, 0])
                    py = oyb + mmb * vyb - cbs(tri_ref[i, 1])
                    pz = ozb + mmb * vzb - cbs(tri_ref[i, 2])
                    wu = px * cbs(tri_ref[i, 6]) + py * cbs(tri_ref[i, 7]) \
                        + pz * cbs(tri_ref[i, 8])
                    wv = px * cbs(tri_ref[i, 9]) + py * cbs(tri_ref[i, 10]) \
                        + pz * cbs(tri_ref[i, 11])
                    uv, uu, vv_ = (cbs(tri_ref[i, 12]), cbs(tri_ref[i, 13]),
                                   cbs(tri_ref[i, 14]))
                    inv_den = cbs(1.0 / tri_ref[i, 15])
                    sb = cf((uv * wv - vv_ * wu) * inv_den)
                    tb = cf((uv * wu - uu * wv) * inv_den)
                    hit = (plane_ok & (mm >= small) & (sb >= 0.0)
                           & (tb >= 0.0) & (sb + tb <= 1.0) & ok
                           & (excl != i.astype(f32))
                           & (tri_ref[i, 19] > 0.5))
                    return jnp.where(hit, 1.0, acc)

                def sph_body_any(i, acc):
                    dx = cbs(sph_ref[i, 0]) - oxb
                    dy = cbs(sph_ref[i, 1]) - oyb
                    dz = cbs(sph_ref[i, 2]) - ozb
                    ud = cf(uxb * dx + uyb * dy + uzb * dz)
                    rr = sph_ref[i, 3] * sph_ref[i, 3]   # f32 scalar core
                    disc = ud * ud - cf(dx * dx + dy * dy + dz * dz) + rr
                    disc_ok = disc > 0.0
                    s = ud - jnp.sqrt(jnp.where(disc_ok, disc, 1.0)) \
                        * jnp.where(disc_ok, 1.0, 0.0)
                    hit = ((disc >= 0.0) & (s >= small) & ok
                           & (excl != (i + nt).astype(f32))
                           & (sph_ref[i, 5] > 0.5))
                    return jnp.where(hit, 1.0, acc)
            else:
                def tri_body_any(i, acc):
                    hit, _ = tri_hit(i)
                    return jnp.where(hit, 1.0, acc)

                def sph_body_any(i, acc):
                    hit, _ = sph_hit(i)
                    return jnp.where(hit, 1.0, acc)

            occ = _sweep_loop(nt, tri_body_any, full(0.0))
            occ = _sweep_loop(ns, sph_body_any, occ)
            return occ

        def tri_body(i, carry):
            bd, bi = carry
            hit, mm = tri_hit(i)
            dist = jnp.where(hit, mm * vlen, BIG)
            upd = dist < bd
            win = tri_ref[i, 20] if carry_transp else i.astype(f32)
            return jnp.where(upd, dist, bd), jnp.where(upd, win, bi)

        def sph_body(i, carry):
            bd, bi = carry
            hit, s = sph_hit(i)
            dist = jnp.where(hit, s, BIG)
            upd = dist < bd
            win = sph_ref[i, 6] if carry_transp else (i + nt).astype(f32)
            return jnp.where(upd, dist, bd), jnp.where(upd, win, bi)

        bd, bi = _sweep_loop(nt, tri_body, (full(BIG), full(-1.0)))
        bd, bi = _sweep_loop(ns, sph_body, (bd, bi))
        return bd, bi, ux, uy, uz, vlen

    def hit_attrs(bd, bi, hitm, ox, oy, oz, ux, uy, uz):
        """Winning-primitive attributes (mask-blend over primitives):
        hit point, shading normal, material id with checker override."""
        def tri_attr(i, c):
            nx, ny, nz, mid, chk = c
            sel = bi == i.astype(f32)
            return (jnp.where(sel, tri_ref[i, 3], nx),
                    jnp.where(sel, tri_ref[i, 4], ny),
                    jnp.where(sel, tri_ref[i, 5], nz),
                    jnp.where(sel, tri_ref[i, 17], mid),
                    jnp.where(sel, tri_ref[i, 18], chk))

        def sph_attr(i, c):
            cx, cy, cz, rad, mid = c
            sel = bi == (i + nt).astype(f32)
            return (jnp.where(sel, sph_ref[i, 0], cx),
                    jnp.where(sel, sph_ref[i, 1], cy),
                    jnp.where(sel, sph_ref[i, 2], cz),
                    jnp.where(sel, sph_ref[i, 3], rad),
                    jnp.where(sel, sph_ref[i, 4], mid))

        tnx, tny, tnz, tmid, tchk = _sweep_loop(nt, tri_attr,
                                                (full(0.0),) * 5)
        scx, scy, scz, srad, smid = _sweep_loop(ns, sph_attr,
                                                (full(0.0),) * 5)

        is_tri = bi < nt
        # hit point (bd holds the Euclidean distance for both primitive
        # kinds, so point = o + bd * u)
        bd_safe = jnp.where(hitm, bd, 0.0)
        px = ox + bd_safe * ux
        py = oy + bd_safe * uy
        pz = oz + bd_safe * uz

        d0x, d0y, d0z = px - scx, py - scy, pz - scz
        d0sq = d0x * d0x + d0y * d0y + d0z * d0z
        inv_d0 = jax.lax.rsqrt(jnp.where(d0sq > 0.0, d0sq, 1.0))
        nx = jnp.where(is_tri, tnx, d0x * inv_d0)
        ny = jnp.where(is_tri, tny, d0y * inv_d0)
        nz = jnp.where(is_tri, tnz, d0z * inv_d0)
        nx = jnp.where(hitm, nx, 0.0); ny = jnp.where(hitm, ny, 0.0)
        nz = jnp.where(hitm, nz, 0.0)

        mid = jnp.where(is_tri, tmid, smid)
        # checkerboard override: square parity with C truncation (:1101-1111).
        # The square-size divide becomes one exact scalar reciprocal (scalar
        # core, free) + a vector mul instead of two vector divides, and the
        # parity test is trunc(s/2)*2 == s (s is an exact small integer in
        # f32) instead of mod — mod lowers to divide+trunc+mul+sub (~10 VPU
        # slots measured) where this is mul+trunc+mul+cmp; same boolean for
        # every integral s, including C's negative-remainder cases
        # (-3 % 2 == -1 and trunc(-1.5)*2 == -3 are both "odd").
        inv_sq = 1.0 / board_sq
        fx = jnp.trunc((px - board_x + board_half) * inv_sq)
        fz = jnp.trunc((pz - board_z + board_half) * inv_sq)
        s_par = fx + fz
        parity_even = jnp.trunc(s_par * 0.5) * 2.0 == s_par
        is_chk = jnp.logical_and(is_tri, tchk > 0.5)
        mid = jnp.where(is_chk,
                        jnp.where(parity_even, float(white_id), float(black_id)),
                        mid)
        return px, py, pz, nx, ny, nz, mid

    def mat_attrs(mid):
        """Material fields (mask-blend over the material table) -> 15-tuple
        (amb3, dif3, spe3, trn3, rho, take_trans, refl_ok)."""
        def mat_attr(j, c):
            sel = mid == j.astype(f32)
            out = []
            for k in range(13):  # amb3 dif3 spe3 trn3 rho
                out.append(jnp.where(sel, mat_ref[j, k], c[k]))
            out.append(jnp.where(sel, mat_ref[j, 13], c[13]))  # take_trans
            out.append(jnp.where(sel, mat_ref[j, 14], c[14]))  # refl_ok
            return tuple(out)

        return _sweep_loop(m, mat_attr, (full(0.0),) * 15)

    def secondary_dirs(ux, uy, uz, nx, ny, nz, rho, want_trans=True):
        """Reflected + transmitted (Snell, TIR-guarded) unit-scale dirs.

        ``want_trans=False`` (static): the scene has no transmitting
        material, so the Snell branch (sqrt + ~15 VPU ops) is skipped and
        zero transmitted dirs are returned — bit-identical output, since
        the chain's child select never takes them."""
        cosi = ux * nx + uy * ny + uz * nz
        rx = ux - 2.0 * cosi * nx
        ry = uy - 2.0 * cosi * ny
        rz = uz - 2.0 * cosi * nz
        if not want_trans:
            zero = jnp.zeros_like(rx)
            return rx, ry, rz, zero, zero, zero
        modulus = 1.0 - rho * rho * (1.0 - cosi * cosi)
        mod_ok = modulus > 0.0
        mod_f = jnp.where(mod_ok, 1.0, 0.0)
        cosr = jnp.sqrt(jnp.where(mod_ok, modulus, 1.0)) * mod_f
        coef = cosr + rho * cosi
        tx = (rho * ux - coef * nx) * mod_f
        ty = (rho * uy - coef * ny) * mod_f
        tz = (rho * uz - coef * nz) * mod_f
        return rx, ry, rz, tx, ty, tz

    def shade(px, py, pz, nx, ny, nz, ux, uy, uz, rx, ry, rz, mats,
              bi, hitm, thr_r, thr_g, thr_b, col_r, col_g, col_b,
              lit_hook=None):
        """Per-light shadow sweep + Phong accumulation (MySdlApplication.cpp
        :1213-1228).  ``lit_hook(li, lit)`` captures shadow residuals."""
        (amb_r, amb_g, amb_b, dif_r, dif_g, dif_b, spe_r, spe_g, spe_b,
         _trn_r, _trn_g, _trn_b, _rho, _take, _refl) = mats
        for li in range(nl):
            lx, ly, lz = light_ref[li, 0], light_ref[li, 1], light_ref[li, 2]
            lr, lg, lb = light_ref[li, 3], light_ref[li, 4], light_ref[li, 5]
            svx, svy, svz = lx - px, ly - py, lz - pz
            if all_opaque:
                # no transparent material exists: "nearest occluder
                # transparent" can never fire, so lit = no occluder —
                # the cheap any-hit sweep suffices
                occ = intersect_all(px, py, pz, svx, svy, svz, bi, hitm,
                                    any_hit=True)
                lit = occ < 0.5
            else:
                # the sweep carries the nearest occluder's transparency flag
                # directly (checker squares are opaque; the override never
                # changes the transparency-nonzero flag)
                sd, occ_transp, _sux, _suy, _suz, _svlen = intersect_all(
                    px, py, pz, svx, svy, svz, bi, hitm, carry_transp=True)
                lit = jnp.logical_or(sd >= BIG, occ_transp > 0.5)
            if lit_hook is not None:
                lit_hook(li, lit)

            d2 = svx * svx + svy * svy + svz * svz
            att = atten / (atten + d2)
            inv_sl = jax.lax.rsqrt(jnp.where(d2 > 0.0, d2, 1.0))
            ndots = jnp.abs(nx * svx + ny * svy + nz * svz) * inv_sl
            udotr = jnp.abs(ux * rx + uy * ry + uz * rz)
            w = jnp.where(jnp.logical_and(lit, hitm), att, 0.0)
            if bf16_shading:
                # Phong blend in bf16 (geometry dots above stay f32); the
                # accumulators stay f32 so S-sample sums don't drift.
                # Light-color SMEM scalars fold into w on the f32 vector
                # path first (no scalar-core bf16 arithmetic exists).
                def cb(x):
                    return jnp.asarray(x).astype(bf)

                nb, ub = cb(ndots), cb(udotr)
                wr, wg, wb_ = cb(w * lr), cb(w * lg), cb(w * lb)
                col_r += (cb(thr_r) * wr * (cb(amb_r) + nb * cb(dif_r)
                          + ub * cb(spe_r))).astype(f32)
                col_g += (cb(thr_g) * wg * (cb(amb_g) + nb * cb(dif_g)
                          + ub * cb(spe_g))).astype(f32)
                col_b += (cb(thr_b) * wb_ * (cb(amb_b) + nb * cb(dif_b)
                          + ub * cb(spe_b))).astype(f32)
            else:
                col_r += (thr_r * w * (amb_r + ndots * dif_r
                                       + udotr * spe_r) * lr)
                col_g += (thr_g * w * (amb_g + ndots * dif_g
                                       + udotr * spe_g) * lg)
                col_b += (thr_b * w * (amb_b + ndots * dif_b
                                       + udotr * spe_b) * lb)
        return col_r, col_g, col_b

    import types
    return types.SimpleNamespace(
        full=full, intersect_all=intersect_all, hit_attrs=hit_attrs,
        mat_attrs=mat_attrs, secondary_dirs=secondary_dirs, shade=shade)


def pack_widths(nt: int, ns: int, m: int, nl: int):
    """Field widths of the single-plane packed residual: one f32 holds
    ``(bi+1) + mid*BW_BI + lit_bits*BW_BI*BW_MID`` exactly (all fields are
    small integers; widths are powers of two so the unpack divides are exact
    multiplies).  Raises if the scene exceeds the 2^24 f32-exact-integer
    budget (would need >2 packed planes per level — no reference scene
    comes close)."""
    bw_bi = 1
    while bw_bi < nt + ns + 2:
        bw_bi *= 2
    bw_mid = 1
    while bw_mid < m + 1:
        bw_mid *= 2
    if bw_bi * bw_mid * (2 ** nl) > 2 ** 24:
        raise ValueError(
            f"packed residual overflows f32 exact integers: "
            f"{nt + ns} primitives x {m} materials x {nl} lights")
    return float(bw_bi), float(bw_mid)


def default_blocks(scene: FlatScene, phase: str = "fwd",
                   depth: int = None):
    """Measured per-workload tile-shape defaults (scripts/tile_sweep.py and
    the round-5 config-5 block×mode sweeps, PERF.md §6/§8).  The FORWARD
    kernels win at 8×512 everywhere (with the sweeps unrolled, small rows
    maximize Mosaic scheduling freedom).  The two-phase BACKWARD is
    entity-count sensitive: 16×256 for small scenes (≤32 primitives — all
    the reference's own scenes), 64×256 for large sweep counts (BASELINE
    config 5's 64 spheres: the adjoint's per-entity gather transpose and
    8-chunk sweep bookkeeping amortize over bigger tiles — 95 → 59 ms at
    2048² d3 at 64×512; 128×512 and up fail to compile, VMEM).  Deeper
    chains multiply the adjoint's live planes, so the large-scene backward
    steps down to 64×256 past depth 3 (compile-safety margin).  The
    single-dispatch FUSED fwd+bwd kernel shares one block and follows its
    dominant phase: 8×512 small, 64×256 large (70.7 vs 95.4 ms at
    config 5).  ``phase``: "fwd" (forward-only kernels), "bwd" (phase 2
    of the packed two-phase path), "fused" (single-dispatch fwd+bwd).
    ``depth``: the bounce depth (None = assume shallow)."""
    n = scene.num_spheres + scene.num_triangles
    if phase == "bwd":
        if n > _SWEEP_FULL_MAX:
            return (64, 512) if (depth is None or depth <= 3) else (64, 256)
        return (16, 256)
    if phase == "fused" and n > _SWEEP_FULL_MAX:
        return (64, 256)
    return (8, 512)


def _resolve_blocks(scene, block_h, block_w, phase="fwd", depth=None):
    """None → the scene's measured default; ints pass through."""
    if block_h is None or block_w is None:
        dh, dw = default_blocks(scene, phase, depth)
        return (dh if block_h is None else block_h,
                dw if block_w is None else block_w)
    return block_h, block_w


def _chain_forward(ops, eye, vx0, vy0, vz0, *, nl: int, depth: int,
                   want_trans: bool, res_refs=(), pack=None):
    """The chain forward as a fori_loop over bounce levels, returning the
    accumulated (col_r, col_g, col_b) planes.  When ``res_refs`` is given
    (bi, mid, lit_0..lit_{nl-1} refs of shape [depth+1, BH, BW] — output refs
    of the residual forward or VMEM scratch of the fused fwd+bwd kernel) the
    fixed-topology residuals are written per level.  Six MORE refs
    (ox oy oz vx vy vz) may follow the lit refs: each level's INPUT ray is
    then also recorded, letting the fused adjoint skip its own primal
    ray-chain phase entirely (kernels/adjoint_fused.py, ``ov_at``).

    ``pack=(bw_bi, bw_mid)``: res_refs is instead ONE ref [depth+1, BH, BW]
    and each level's (bi, mid, lit_0..lit_{nl-1}) residuals are packed into
    a single integer-exact f32 plane — one in-loop store per level instead
    of 2+nl.  The in-loop residual stores, not their layout or HBM traffic,
    are the residual forward's measured overhead (~0.15 ms/level at 1024²,
    PERF.md §2), so packing cuts it ~(2+nl)x."""
    full = ops.full
    with_residuals = bool(res_refs)
    ov_refs = (res_refs[2 + nl:]
               if (with_residuals and pack is None) else ())

    # ---- per-ray state (the chain carry); the bounce-level loop is a
    # fori_loop so the Mosaic program stays small regardless of depth ----
    def level_body(_level, carry):
        (ox, oy, oz, vx, vy, vz, thr_r, thr_g, thr_b,
         col_r, col_g, col_b, excl, alive_f) = carry
        if ov_refs:
            for ref, plane in zip(ov_refs, (ox, oy, oz, vx, vy, vz)):
                ref[_level] = plane
        alive = alive_f > 0.5
        bd, bi, ux, uy, uz, _vlen = ops.intersect_all(ox, oy, oz, vx, vy, vz,
                                                      excl, alive)
        hitm = jnp.logical_and(bd < BIG, alive)

        px, py, pz, nx, ny, nz, mid = ops.hit_attrs(bd, bi, hitm,
                                                    ox, oy, oz, ux, uy, uz)
        if with_residuals and pack is None:
            res_refs[0][_level] = jnp.where(hitm, bi, -1.0)
            res_refs[1][_level] = mid

        mats = ops.mat_attrs(mid)
        (_, _, _, _, _, _, _, _, _,
         trn_r, trn_g, trn_b, rho, take_trans_f, refl_ok_f) = mats

        rx, ry, rz, tx, ty, tz = ops.secondary_dirs(ux, uy, uz, nx, ny, nz,
                                                    rho,
                                                    want_trans=want_trans)

        lit_planes = []

        def lit_hook(li, lit):
            if pack is not None:
                lit_planes.append(jnp.where(lit, 1.0, 0.0))
            elif with_residuals:
                res_refs[2 + li][_level] = jnp.where(lit, 1.0, 0.0)

        col_r, col_g, col_b = ops.shade(
            px, py, pz, nx, ny, nz, ux, uy, uz, rx, ry, rz, mats,
            bi, hitm, thr_r, thr_g, thr_b, col_r, col_g, col_b,
            lit_hook=lit_hook)

        if pack is not None:
            bw_bi, bw_mid = pack
            pk = (jnp.where(hitm, bi, -1.0) + 1.0) + mid * bw_bi
            for li, lf in enumerate(lit_planes):
                pk += lf * (bw_bi * bw_mid * float(1 << li))
            res_refs[0][_level] = pk

        # ---- child ray selection (chain-exact) ----
        take_t = take_trans_f > 0.5
        nvx = jnp.where(take_t, tx, rx)
        nvy = jnp.where(take_t, ty, ry)
        nvz = jnp.where(take_t, tz, rz)
        thr_r *= jnp.where(take_t, trn_r, 1.0 - trn_r)
        thr_g *= jnp.where(take_t, trn_g, 1.0 - trn_g)
        thr_b *= jnp.where(take_t, trn_b, 1.0 - trn_b)
        branch_f = jnp.where(take_t,
                             jnp.where(nvx * nvx + nvy * nvy + nvz * nvz > 0.0,
                                       1.0, 0.0),
                             jnp.where(refl_ok_f > 0.5, 1.0, 0.0))
        alive_f = jnp.where(jnp.logical_and(hitm, branch_f > 0.5), 1.0, 0.0)
        return (px, py, pz, nvx, nvy, nvz, thr_r, thr_g, thr_b,
                col_r, col_g, col_b, bi, alive_f)

    init = (full(eye[0]), full(eye[1]), full(eye[2]),
            vx0, vy0, vz0,
            full(1.0), full(1.0), full(1.0),
            full(0.0), full(0.0), full(0.0),
            full(-1.0), full(1.0))
    if os.environ.get("RTFS_LEVEL_UNROLL", "1") == "1":
        # DEFAULT since round 5: unrolled bounce levels (constant
        # residual-store indices, straight-line level code).  Measured
        # wins on v5e: plain forward 1.98 -> 1.86 ms, packed two-phase
        # fwd+bwd 2.65 -> 2.58 ms at 1024^2 d3.  One program shape for
        # every chain forward (plain/packed/residual/fused) keeps the
        # kernels bit-identical to each other; vs the old fori_loop
        # default the fma reassociation flips ~0.5% of decision-boundary
        # pixels (goldens regenerated with the flip —
        # tests/goldens, scripts/make_goldens.py).  RTFS_LEVEL_UNROLL=0
        # restores the loop (smaller Mosaic program at high depth).
        out = init
        for lv in range(depth + 1):
            out = level_body(lv, out)   # Python int: static store indices
    else:
        out = jax.lax.fori_loop(0, depth + 1, level_body, init)
    return out[9], out[10], out[11]


def _render_tile_kernel(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                        vx_ref, vy_ref, vz_ref, r_ref, g_ref, b_ref,
                        *res_refs,
                        ns: int, nt: int, m: int, nl: int, depth: int,
                        small: float, atten: float,
                        white_id: int, black_id: int,
                        with_residuals: bool = False,
                        want_trans: bool = True,
                        fast_recip: bool = True,
                        bf16_shading: bool = False):
    # res_refs (when with_residuals): bi_ref, mid_ref [depth+1, BH, BW] and
    # one lit_ref [depth+1, BH, BW] per light — the fixed-topology residuals
    # consumed by the replay adjoint (kernels/adjoint.py).
    shape = vx_ref.shape
    ops = _make_tile_ops(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                         shape, ns=ns, nt=nt, m=m, nl=nl, small=small,
                         atten=atten, white_id=white_id, black_id=black_id,
                         fast_recip=fast_recip, all_opaque=not want_trans,
                         bf16_shading=bf16_shading)
    eye = (misc_ref[0], misc_ref[1], misc_ref[2])
    col_r, col_g, col_b = _chain_forward(
        ops, eye, vx_ref[:], vy_ref[:], vz_ref[:], nl=nl, depth=depth,
        want_trans=want_trans, res_refs=res_refs if with_residuals else ())
    r_ref[:] = col_r
    g_ref[:] = col_g
    b_ref[:] = col_b


def _render_tile_packed_kernel(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                               vx_ref, vy_ref, vz_ref,
                               r_ref, g_ref, b_ref, pk_ref,
                               *, ns: int, nt: int, m: int, nl: int,
                               depth: int, small: float, atten: float,
                               white_id: int, black_id: int,
                               want_trans: bool = True,
                               fast_recip: bool = True,
                               bf16_shading: bool = False,
                               pack=(512.0, 128.0)):
    """Chain forward emitting the image AND the single-plane packed
    residuals (``pack_widths``) — phase 1 of the packed two-phase
    fwd+bwd (kernels/adjoint_fused.py::twophase_loss_grads_pallas)."""
    shape = vx_ref.shape
    ops = _make_tile_ops(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                         shape, ns=ns, nt=nt, m=m, nl=nl, small=small,
                         atten=atten, white_id=white_id, black_id=black_id,
                         fast_recip=fast_recip, all_opaque=not want_trans,
                         bf16_shading=bf16_shading)
    eye = (misc_ref[0], misc_ref[1], misc_ref[2])
    col_r, col_g, col_b = _chain_forward(
        ops, eye, vx_ref[:], vy_ref[:], vz_ref[:], nl=nl, depth=depth,
        want_trans=want_trans, res_refs=(pk_ref,), pack=pack)
    r_ref[:] = col_r
    g_ref[:] = col_g
    b_ref[:] = col_b


def render_forward_packed(packed, scene, config: RenderConfig,
                          vx, vy, vz, block_h: int, block_w: int,
                          interpret: bool, pack):
    """Phase-1 pallas_call of the packed two-phase path: padded ray planes
    in, padded (r, g, b, pk) planes out (no unpadding — the planes feed the
    phase-2 backward kernel directly)."""
    depth = config.max_depth
    nl = scene.num_lights
    ph, pw = vx.shape
    kernel = functools.partial(
        _render_tile_packed_kernel,
        ns=packed["sph"].shape[0], nt=packed["tri"].shape[0],
        m=scene.num_materials, nl=nl, depth=depth,
        small=config.small_number, atten=config.attenuation_factor,
        white_id=scene.checker_mats[0], black_id=scene.checker_mats[1],
        want_trans=bool(scene.has_transmission),
        fast_recip=not interpret,
        bf16_shading=config.bf16_shading, pack=pack)
    grid = (ph // block_h, pw // block_w)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    res_tile = pl.BlockSpec((depth + 1, block_h, block_w),
                            lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 5 + [tile] * 3,
        out_specs=[tile] * 3 + [res_tile],
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32)] * 3
                  + [jax.ShapeDtypeStruct((depth + 1, ph, pw), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else kernel_compiler_params(),
    )(packed["sph"], packed["tri"], packed["mat"], packed["light"],
      packed["misc"], vx, vy, vz)


def _tree_forward(ops, eye, vx0, vy0, vz0, *, nl: int, depth: int,
                  want_trans: bool, res_refs=()):
    """Full binary bounce *tree* — the literal ``rayTraceRay`` recursion
    (MySdlApplication.cpp:1230-1248): at every hit a transmitted child
    weighted by the material transparency T AND a reflected child weighted
    by the opacity 1-T, unrolled statically in preorder (2^(depth+1)-1 node
    visits).  Returns the accumulated (col_r, col_g, col_b).  When
    ``res_refs`` is given (bi, mid, lit_0.. refs of shape [K, BH, BW] with
    K preorder nodes — output refs of the residual forward or VMEM scratch
    of the fused tree fwd+bwd kernel) the fixed-topology residuals are
    written per preorder node, the indexing the tree replay adjoint
    consumes (kernels/adjoint.py::replay_render_tree and the in-kernel
    adjoint_fused tree body)."""
    full = ops.full
    with_residuals = bool(res_refs)
    eye_x, eye_y, eye_z = eye
    preorder = [0]  # next preorder node index (static during the unroll)

    def node(ox, oy, oz, vx, vy, vz, thr_r, thr_g, thr_b, excl, alive_f,
             level, col):
        idx = preorder[0]
        preorder[0] += 1
        col_r, col_g, col_b = col
        alive = alive_f > 0.5
        bd, bi, ux, uy, uz, _vlen = ops.intersect_all(ox, oy, oz, vx, vy, vz,
                                                      excl, alive)
        hitm = jnp.logical_and(bd < BIG, alive)
        px, py, pz, nx, ny, nz, mid = ops.hit_attrs(bd, bi, hitm,
                                                    ox, oy, oz, ux, uy, uz)
        if with_residuals:
            res_refs[0][idx] = jnp.where(hitm, bi, -1.0)
            res_refs[1][idx] = mid
        mats = ops.mat_attrs(mid)
        (_, _, _, _, _, _, _, _, _,
         trn_r, trn_g, trn_b, rho, take_trans_f, refl_ok_f) = mats
        rx, ry, rz, tx, ty, tz = ops.secondary_dirs(ux, uy, uz, nx, ny, nz,
                                                    rho,
                                                    want_trans=want_trans)

        def lit_hook(li, lit):
            if with_residuals:
                res_refs[2 + li][idx] = jnp.where(lit, 1.0, 0.0)

        col = ops.shade(px, py, pz, nx, ny, nz, ux, uy, uz, rx, ry, rz, mats,
                        bi, hitm, thr_r, thr_g, thr_b, col_r, col_g, col_b,
                        lit_hook=lit_hook)
        if level == depth:
            return col
        hit_f = jnp.where(hitm, 1.0, 0.0)
        # transmitted child: traced when T != 0 and |T| > SMALL (:1238),
        # contribution weighted by T (take_trans folds both conditions)
        take_f = take_trans_f * hit_f
        col = node(px, py, pz, tx * take_f, ty * take_f, tz * take_f,
                   thr_r * trn_r * take_f, thr_g * trn_g * take_f,
                   thr_b * trn_b * take_f, bi, hit_f, level + 1, col)
        # reflected child: traced when opacity != 0 (:1243), weight 1-T
        refl_f = refl_ok_f * hit_f
        col = node(px, py, pz, rx * refl_f, ry * refl_f, rz * refl_f,
                   thr_r * (1.0 - trn_r) * refl_f,
                   thr_g * (1.0 - trn_g) * refl_f,
                   thr_b * (1.0 - trn_b) * refl_f, bi, hit_f, level + 1, col)
        return col

    return node(full(eye_x), full(eye_y), full(eye_z),
                vx0, vy0, vz0,
                full(1.0), full(1.0), full(1.0),
                full(-1.0), full(1.0), 0,
                (full(0.0), full(0.0), full(0.0)))


def _render_tile_tree_kernel(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                             vx_ref, vy_ref, vz_ref, r_ref, g_ref, b_ref,
                             *res_refs,
                             ns: int, nt: int, m: int, nl: int, depth: int,
                             small: float, atten: float,
                             white_id: int, black_id: int,
                             with_residuals: bool = False,
                             want_trans: bool = True,
                             fast_recip: bool = True,
                             bf16_shading: bool = False):
    """Tree-forward tile kernel (fractional-transparency scenes; chain-exact
    scenes take _render_tile_kernel).  Matches core/renderer.py's
    ``render_rays_tree`` semantics exactly."""
    shape = vx_ref.shape
    ops = _make_tile_ops(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                         shape, ns=ns, nt=nt, m=m, nl=nl, small=small,
                         atten=atten, white_id=white_id, black_id=black_id,
                         fast_recip=fast_recip, all_opaque=not want_trans,
                         bf16_shading=bf16_shading)
    col = _tree_forward(ops, (misc_ref[0], misc_ref[1], misc_ref[2]),
                        vx_ref[:], vy_ref[:], vz_ref[:], nl=nl, depth=depth,
                        want_trans=want_trans,
                        res_refs=res_refs if with_residuals else ())
    r_ref[:] = col[0]
    g_ref[:] = col[1]
    b_ref[:] = col[2]


def _pad_to(x, mult, axis):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def render_image_pallas(scene: FlatScene, camera, config: RenderConfig,
                        key=None, block_h: int = None, block_w: int = None,
                        interpret: bool = None, pts=None):
    """Full-frame Pallas render -> [H,W,3] (j=0 bottom, like the core).

    ``interpret``: run the kernel in the Pallas interpreter (for CPU tests);
    default auto-detects a non-TPU backend.

    ``pts``: optional pre-computed screen points [H*W, 3].  Sharded callers
    (parallel/shard.py) pass the points of their row band together with a
    config whose ``height`` is the band height.

    Scenes with fractional transparency (not chain-exact) route to the
    bounce-tree kernel automatically; cost grows as 2^depth."""
    tree = not scene.chain_exact
    from ..config import CameraConfig
    if isinstance(camera, CameraConfig):
        camera = Camera.from_config(camera, config.width, config.height)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # the "fwd" policy is scene-independent (8x512 everywhere) — no need
    # to compact just to resolve
    block_h, block_w = _resolve_blocks(scene, block_h, block_w)

    packed = dict(pack_scene(scene))
    packed["misc"] = packed["misc"].at[0:3].set(
        camera.eye.astype(jnp.float32))
    w, h = config.width, config.height
    if pts is None:
        pts = screen_points(camera, w, h)

    def one_sample(pts_s):
        img, _ = _call_kernel(packed, scene, camera, config, pts_s,
                              block_h, block_w, interpret,
                              with_residuals=False, tree=tree)
        return img

    use_jitter = config.samples > 1 or config.force_jitter
    if not use_jitter:
        return one_sample(pts)
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    keys = jax.random.split(key, config.samples)

    if not config.adaptive:
        def body(carry, k):
            jit = sample_jitter(k, pts.shape[0], config.jitter_scale,
                                dtype=pts.dtype)
            return carry + one_sample(pts + jit), None

        total, _ = jax.lax.scan(body, jnp.zeros((h, w, 3), jnp.float32), keys)
        return total / config.samples

    # Adaptive supersampler emulation, identical to the core renderer's
    # (core/renderer.py; MySdlApplication.cpp:1294-1311): all samples are
    # rendered SPMD, convergence only masks accumulation, and the divisor is
    # the loop variable at early exit.
    small = config.small_number

    def adaptive_body(carry, inp):
        accum, divisor, done = carry
        k, key_k = inp
        jit = sample_jitter(key_k, pts.shape[0], config.jitter_scale,
                            dtype=pts.dtype)
        c = one_sample(pts + jit)
        accum_after = jnp.where(done[..., None], accum, accum + c)
        d = k * accum_after - (k + 1.0) * accum
        diff = jnp.sqrt(jnp.sum(d * d, -1))
        newly_done = jnp.logical_and(~done, diff < small * k * (k + 1.0))
        divisor = jnp.where(newly_done, k, divisor)
        done = jnp.logical_or(done, newly_done)
        return (accum_after, divisor, done), None

    ks = jnp.arange(config.samples, dtype=jnp.float32)
    init = (jnp.zeros((h, w, 3), jnp.float32),
            jnp.full((h, w), float(config.samples), jnp.float32),
            jnp.zeros((h, w), bool))
    (accum, divisor, _), _ = jax.lax.scan(adaptive_body, init, (ks, keys))
    return accum / divisor[..., None]


def _pad_img(flat, h, w, block_h, block_w):
    img = flat.reshape(h, w)
    img = _pad_to(img, block_h, 0)
    img = _pad_to(img, block_w, 1)
    return img


def n_tree_nodes(depth: int) -> int:
    """Preorder node count of the full binary bounce tree."""
    return 2 ** (depth + 1) - 1


def _call_kernel(packed, scene, camera, config, pts, block_h, block_w,
                 interpret, with_residuals, tree=False):
    """Invoke the tile kernel over the padded frame.  Returns (img,
    residuals-or-None); residuals = dict(bi, mid [K,H,W], lit [L,K,H,W])
    where K = depth+1 for the chain kernel and 2^(depth+1)-1 preorder nodes
    for the tree kernel."""
    w, h = config.width, config.height
    depth = config.max_depth
    nl = scene.num_lights
    o, v = primary_rays(camera, pts)
    vx = _pad_img(v[:, 0], h, w, block_h, block_w)
    vy = _pad_img(v[:, 1], h, w, block_h, block_w)
    vz = _pad_img(v[:, 2], h, w, block_h, block_w)
    ph, pw = vx.shape
    common = dict(
        ns=packed["sph"].shape[0], nt=packed["tri"].shape[0],
        m=scene.num_materials, nl=nl,
        depth=depth, small=config.small_number,
        atten=config.attenuation_factor,
        white_id=scene.checker_mats[0], black_id=scene.checker_mats[1],
        # no transmitting material -> the Snell branch is statically skipped
        # (bit-identical: the child select never takes transmitted dirs)
        want_trans=bool(scene.has_transmission),
        # pl.reciprocal is TPU-only; interpret mode uses the exact divide
        fast_recip=not interpret,
        bf16_shading=config.bf16_shading)
    if tree:
        kernel = functools.partial(_render_tile_tree_kernel,
                                   with_residuals=with_residuals, **common)
        levels = n_tree_nodes(depth)
    else:
        kernel = functools.partial(_render_tile_kernel,
                                   with_residuals=with_residuals, **common)
        levels = depth + 1
    grid = (ph // block_h, pw // block_w)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    n_res = (2 + nl) if with_residuals else 0
    res_tile = pl.BlockSpec((levels, block_h, block_w),
                            lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 5 + [tile] * 3,
        out_specs=[tile] * 3 + [res_tile] * n_res,
        out_shape=([jax.ShapeDtypeStruct((ph, pw), jnp.float32)] * 3
                   + [jax.ShapeDtypeStruct((levels, ph, pw), jnp.float32)]
                   * n_res),
        interpret=interpret,
        compiler_params=None if interpret else kernel_compiler_params(),
    )(packed["sph"], packed["tri"], packed["mat"], packed["light"],
      packed["misc"], vx, vy, vz)
    img = jnp.stack([out[0][:h, :w], out[1][:h, :w], out[2][:h, :w]], -1)
    if not with_residuals:
        return img, None
    bi = out[3][:, :h, :w]
    mid = out[4][:, :h, :w]
    if nl:
        lit = jnp.stack([out[5 + li][:, :h, :w] for li in range(nl)], 0)
    else:
        lit = jnp.zeros((0, levels, h, w), jnp.float32)
    return img, dict(bi=bi, mid=mid, lit=lit)


def render_forward_with_residuals(scene: FlatScene, camera, config: RenderConfig,
                                  block_h: int = None, block_w: int = None,
                                  interpret: bool = None, pts=None):
    """Single-sample forward returning (img, fixed-topology residuals) for
    the replay adjoint (kernels/adjoint.py).

    ``pts``: optional pre-computed screen points [H*W, 3] (sharded row-band
    callers pass their band's points with ``config.height`` = band height).

    Chain-exact scenes use the chain kernel (residual planes indexed by
    bounce level); fractional-transparency scenes use the bounce-tree kernel
    (residual planes indexed by preorder tree node)."""
    if config.samples != 1 or config.force_jitter:
        raise ValueError("residual forward supports exactly one sample")
    from ..config import CameraConfig
    if isinstance(camera, CameraConfig):
        camera = Camera.from_config(camera, config.width, config.height)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_h, block_w = _resolve_blocks(scene, block_h, block_w)
    packed = dict(pack_scene(scene))
    packed["misc"] = packed["misc"].at[0:3].set(camera.eye.astype(jnp.float32))
    if pts is None:
        pts = screen_points(camera, config.width, config.height)
    return _call_kernel(packed, scene, camera, config, pts, block_h, block_w,
                        interpret, with_residuals=True,
                        tree=not scene.chain_exact)
