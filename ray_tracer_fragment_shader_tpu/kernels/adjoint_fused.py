"""Fully in-kernel backward pass: the replay adjoint as a fused Pallas kernel.

``kernels/adjoint.py`` pins the discrete hit topology with per-level residuals
and re-derives the radiance as a small differentiable function — but it runs
that replay (and its VJP) as an XLA program over the whole image, which
materializes [P, N] one-hot selection masks in HBM and roughly matches the
forward kernel's cost.  This module moves the entire backward into one Pallas
kernel: each grid step replays the bounce chain for a (BH, BW) pixel tile in
VMEM, differentiates it on the spot with a HAND-WRITTEN adjoint (a lean
primal sweep plus an explicit reverse sweep — no ``jax.vjp``; every
sqrt/divide adjoint reuses a primal reciprocal and the color accumulation is
skipped), and accumulates the per-tile parameter gradients into small VMEM
tables across the sequential TPU grid.  No [P, N] buffer ever exists; HBM
traffic is just the residuals + cotangent.

Scope: gradients w.r.t. the differentiable-fit parameter set (``FitParams``:
sphere centers/radii, light positions, material ambient/diffuse/specular) —
the BASELINE config-4 workload.  For gradients w.r.t. other leaves (camera,
triangle vertices) use the XLA replay (``kernels/adjoint.py``), which remains
the general path.

Like the replay, gradients are defined through fixed hit topology
(SURVEY.md §7 "Hard parts": hit/miss, checker parity and shadow edges carry
no gradient) — the convention the reference's semantics imply for its
branch-heavy shading (Hw4/MySdlApplication.cpp:1184-1249).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..diff.fit import FitParams
from ..ops.rays import Camera, primary_rays, screen_points
from ..scene.flat import FlatScene
from ..utils import fastmath
from .render_pallas import (_pad_img, _sweep_loop, compact_scene,
                            kernel_compiler_params, pack_scene,
                            render_forward_with_residuals)

# Diff-table layouts (rows = entity, cols = packed fields)
SPHD_COLS = 8    # cx cy cz r - - - -
MATD_COLS = 16   # amb(3) dif(3) spe(3) - - - - - - -
LIGHTD_COLS = 8  # pos(3) - - - - -


def _pack_diff_tables(scene: FlatScene):
    """The differentiable parameter tables (VMEM inputs of the backward
    kernel).  Scene must already be compacted."""
    f32 = jnp.float32
    ns, m, nl = scene.num_spheres, scene.num_materials, scene.num_lights
    sphd = jnp.zeros((max(ns, 1), SPHD_COLS), f32)
    sphd = sphd.at[:ns, 0:3].set(scene.sph_center.astype(f32))
    sphd = sphd.at[:ns, 3].set(scene.sph_radius.astype(f32))
    matd = jnp.zeros((max(m, 1), MATD_COLS), f32)
    matd = matd.at[:m, 0:3].set(scene.mat_ambient.astype(f32))
    matd = matd.at[:m, 3:6].set(scene.mat_diffuse.astype(f32))
    matd = matd.at[:m, 6:9].set(scene.mat_specular.astype(f32))
    lightd = jnp.zeros((max(nl, 1), LIGHTD_COLS), f32)
    lightd = lightd.at[:nl, 0:3].set(scene.light_pos.astype(f32))
    return sphd, matd, lightd


def _node_reverse(c, rec, gath_n, d_gath_n, d_lp, lcol, G3, atten, nl,
                  inflow):
    """Reverse sweep of ONE bounce node — the shared adjoint core of the
    chain and tree tile bodies.  ``c``/``rec``: the node's constants and
    primal record; ``gath_n``/``d_gath_n``: its 13 pre-gathered parameter
    planes and their cotangent accumulators (mutated in place, like
    ``d_lp``); ``G3``: the per-channel cotangent scale of this node's local
    shading (chain: throughput x image cotangent; tree: path weight x image
    cotangent); ``inflow``: dict of cotangents arriving from the node's
    children — p (3), r (3), u (3), n (3), cosi — zeros where absent.
    Returns (o_b 3-tuple, v_b 3-tuple), the cotangents of the node's input
    ray.  Every masked select transposes to a masked cotangent; each
    guarded sqrt/div adjoint reuses the primal's reciprocal (self-masking:
    the stored inverses are already zero on dead lanes)."""
    hitm, is_tri = c["hitm"], c["is_tri"]
    ux, uy, uz = rec["ux"], rec["uy"], rec["uz"]
    nx, ny, nz = rec["nx"], rec["ny"], rec["nz"]
    rx, ry, rz = rec["rx"], rec["ry"], rec["rz"]
    cosi = rec["cosi"]

    p_bx, p_by, p_bz = inflow["p"]
    u_bx, u_by, u_bz = inflow["u"]
    n_bx, n_by, n_bz = inflow["n"]
    r_bx, r_by, r_bz = inflow["r"]
    cosi_b = inflow["cosi"]

    # shading: col_ch += G3_ch * wgt * (amb + ndots*dif + udotr*spe)
    #          * lcol_ch, per light
    gr_, gg_, gb_ = G3
    amb = gath_n[4:7]
    dif = gath_n[7:10]
    spe = gath_n[10:13]
    for li in range(nl):
        svx, svy, svz, att, inv_sl, dot_ns, dot_ur = rec["lights"][li]
        lr, lg, lb = lcol[li]
        mask_w = jnp.logical_and(c["lits"][li], hitm)
        wgt = jnp.where(mask_w, att, 0.0)
        abs_ns = jnp.abs(dot_ns)
        ndots = abs_ns * inv_sl
        udotr = jnp.abs(dot_ur)
        kr = wgt * (lr * gr_)
        kg = wgt * (lg * gg_)
        kb = wgt * (lb * gb_)
        d_gath_n[4] += kr
        d_gath_n[5] += kg
        d_gath_n[6] += kb
        d_gath_n[7] += kr * ndots
        d_gath_n[8] += kg * ndots
        d_gath_n[9] += kb * ndots
        d_gath_n[10] += kr * udotr
        d_gath_n[11] += kg * udotr
        d_gath_n[12] += kb * udotr
        ndots_b = kr * dif[0] + kg * dif[1] + kb * dif[2]
        udotr_b = kr * spe[0] + kg * spe[1] + kb * spe[2]
        s_r = amb[0] + ndots * dif[0] + udotr * spe[0]
        s_g = amb[1] + ndots * dif[1] + udotr * spe[1]
        s_b = amb[2] + ndots * dif[2] + udotr * spe[2]
        wgt_b = (gr_ * lr * s_r + gg_ * lg * s_g + gb_ * lb * s_b)
        att_b = jnp.where(mask_w, wgt_b, 0.0)
        # att = A/(A+d2): d att/d d2 = -att^2/A
        d2_b = att_b * att * att * (-1.0 / atten)
        # udotr = |u.r|
        dur_b = udotr_b * jnp.sign(dot_ur)
        u_bx += dur_b * rx
        u_by += dur_b * ry
        u_bz += dur_b * rz
        r_bx += dur_b * ux
        r_by += dur_b * uy
        r_bz += dur_b * uz
        # ndots = |n.sv| * inv_sl; inv_sl = where(ok, d2^-1/2, 0)
        dns_b = ndots_b * inv_sl * jnp.sign(dot_ns)
        d2_b += ndots_b * abs_ns * (-0.5) * inv_sl * inv_sl * inv_sl
        n_bx += dns_b * svx
        n_by += dns_b * svy
        n_bz += dns_b * svz
        sv_bx = dns_b * nx + 2.0 * d2_b * svx
        sv_by = dns_b * ny + 2.0 * d2_b * svy
        sv_bz = dns_b * nz + 2.0 * d2_b * svz
        # sv = lp - p
        d_lp[li][0] += sv_bx
        d_lp[li][1] += sv_by
        d_lp[li][2] += sv_bz
        p_bx -= sv_bx
        p_by -= sv_by
        p_bz -= sv_bz

    # r = u - 2 cosi n
    u_bx += r_bx
    u_by += r_by
    u_bz += r_bz
    cosi_b -= 2.0 * (r_bx * nx + r_by * ny + r_bz * nz)
    two_cosi = 2.0 * cosi
    n_bx -= two_cosi * r_bx
    n_by -= two_cosi * r_by
    n_bz -= two_cosi * r_bz
    # cosi = u.n
    u_bx += cosi_b * nx
    u_by += cosi_b * ny
    u_bz += cosi_b * nz
    n_bx += cosi_b * ux
    n_by += cosi_b * uy
    n_bz += cosi_b * uz

    # n = where(hitm, where(is_tri, tn, d0 * inv_d0), 0)
    m_sphn = jnp.logical_and(hitm, jnp.logical_not(is_tri))
    ns_bx = jnp.where(m_sphn, n_bx, 0.0)
    ns_by = jnp.where(m_sphn, n_by, 0.0)
    ns_bz = jnp.where(m_sphn, n_bz, 0.0)
    inv_d0 = rec["inv_d0"]
    d0x, d0y, d0z = rec["d0x"], rec["d0y"], rec["d0z"]
    invd0_b = ns_bx * d0x + ns_by * d0y + ns_bz * d0z
    # inv_d0 = where(ok, d0sq^-1/2, 0): d/d d0sq = -inv_d0^3/2 (self-masked)
    d0sq_b = (-0.5) * inv_d0 * inv_d0 * inv_d0 * invd0_b
    two_d0sq_b = 2.0 * d0sq_b
    d0_bx = inv_d0 * ns_bx + two_d0sq_b * d0x
    d0_by = inv_d0 * ns_by + two_d0sq_b * d0y
    d0_bz = inv_d0 * ns_bz + two_d0sq_b * d0z
    # d0 = p - c
    p_bx += d0_bx
    p_by += d0_by
    p_bz += d0_bz
    c_bx = -d0_bx
    c_by = -d0_by
    c_bz = -d0_bz

    # p = o + bd * u
    o_bx, o_by, o_bz = p_bx, p_by, p_bz
    bd_b = p_bx * ux + p_by * uy + p_bz * uz
    bd = rec["bd"]
    u_bx += bd * p_bx
    u_by += bd * p_by
    u_bz += bd * p_bz

    # bd = where(hitm, where(is_tri, dist_tri, dist_sph), 0)
    dt_b = jnp.where(jnp.logical_and(hitm, is_tri), bd_b, 0.0)
    ds_b = jnp.where(m_sphn, bd_b, 0.0)

    # dist_sph = ud - safe_sqrt(disc); disc = ud^2 - d.d + rr^2; ud = u.d
    disc_b = jnp.where(rec["disc_ok"],
                       (-0.5) * rec["inv_sq"] * ds_b, 0.0)
    ud_b = ds_b + 2.0 * rec["ud"] * disc_b
    dx, dy, dz = rec["dx"], rec["dy"], rec["dz"]
    rr = gath_n[3]
    d_gath_n[3] += 2.0 * rr * disc_b
    neg2disc_b = -2.0 * disc_b
    d_bx = neg2disc_b * dx + ud_b * ux
    d_by = neg2disc_b * dy + ud_b * uy
    d_bz = neg2disc_b * dz + ud_b * uz
    u_bx += ud_b * dx
    u_by += ud_b * dy
    u_bz += ud_b * dz
    # d = c - o
    c_bx += d_bx
    c_by += d_by
    c_bz += d_bz
    o_bx -= d_bx
    o_by -= d_by
    o_bz -= d_bz
    d_gath_n[0] += c_bx
    d_gath_n[1] += c_by
    d_gath_n[2] += c_bz

    # dist_tri = m_par * vlen; m_par = safe_div(tnv0 - tn.o, ndv);
    # ndv = tn.v; ndo = tn.o
    tnx, tny, tnz = c["tn"]
    m_b = dt_b * rec["vlen"]
    vlen_b = dt_b * rec["m_par"]
    inv_ndv = rec["inv_ndv"]
    ndo_b = jnp.where(rec["ndv_ok"], -m_b * inv_ndv, 0.0)
    ndv_b = -rec["m_par"] * inv_ndv * m_b   # m_par self-masks dead lanes
    o_bx += ndo_b * tnx
    o_by += ndo_b * tny
    o_bz += ndo_b * tnz
    v_bx = ndv_b * tnx
    v_by = ndv_b * tny
    v_bz = ndv_b * tnz

    # u = v * ivl; ivl = where(ok, vlen2^-1/2, 0); vlen = vlen2 * ivl
    ivl = rec["ivl"]
    vx_, vy_, vz_ = rec["vx"], rec["vy"], rec["vz"]
    v_bx += u_bx * ivl
    v_by += u_by * ivl
    v_bz += u_bz * ivl
    ivl_b = u_bx * vx_ + u_by * vy_ + u_bz * vz_
    vlen_b -= ivl * ivl * ivl_b             # d(1/vlen)/dvlen, self-masked
    vlen2_b = 0.5 * vlen_b * ivl            # d sqrt/d vlen2, self-masked
    two_vlen2_b = 2.0 * vlen2_b
    v_bx += two_vlen2_b * vx_
    v_by += two_vlen2_b * vy_
    v_bz += two_vlen2_b * vz_

    return (o_bx, o_by, o_bz), (v_bx, v_by, v_bz)


def _masked_rsqrt(x, ok):
    """(where(ok, 1/sqrt(x), 0), where(ok, sqrt(x), 0)) from ONE rsqrt:
    sqrt(x) = x * rsqrt(x).  Matches safe_sqrt / safe_div(1, ., ok)
    values exactly (1-ulp)."""
    x_safe = jnp.where(ok, x, 1.0)
    inv = jnp.where(ok, jax.lax.rsqrt(x_safe), 0.0)
    return inv, x * inv


def _node_primal(c, gath_n, lp, o, v, *, nl: int, atten: float,
                 want_snell: bool, fast_recip: bool):
    """Hand-written primal sweep of ONE bounce node — the shared forward
    half of the chain and tree replay adjoints.  Mirrors
    kernels/adjoint.py::_node_math value-for-value (same guards, 1-ulp
    rsqrt-vs-sqrt/div differences) but skips the color accumulation and
    keeps every intermediate the reverse sweep (``_node_reverse``)
    consumes.  ``want_snell``: also compute the transmitted direction and
    its Snell record (non-leaf nodes of transmitting scenes).

    Returns (rec, (px, py, pz), (rx, ry, rz), (tx, ty, tz) or None)."""
    ox, oy, oz = o
    vx, vy, vz = v

    def _recip(x):
        return fastmath.recip(x, fast_recip)

    hitm, is_tri = c["hitm"], c["is_tri"]
    cx, cy, cz, rr = gath_n[0:4]
    vlen2 = vx * vx + vy * vy + vz * vz
    ray_ok = vlen2 > 0.0
    ivl, vlen = _masked_rsqrt(vlen2, ray_ok)
    ux, uy, uz = vx * ivl, vy * ivl, vz * ivl

    tnx, tny, tnz = c["tn"]
    ndv = tnx * vx + tny * vy + tnz * vz
    ndv_ok = jnp.abs(ndv) > 0.0
    inv_ndv = _recip(jnp.where(ndv_ok, ndv, 1.0))
    ndo = tnx * ox + tny * oy + tnz * oz
    m_par = jnp.where(ndv_ok, (c["tnv0"] - ndo) * inv_ndv, 0.0)
    dist_tri = m_par * vlen

    dx, dy, dz = cx - ox, cy - oy, cz - oz
    ud = ux * dx + uy * dy + uz * dz
    disc = ud * ud - (dx * dx + dy * dy + dz * dz) + rr * rr
    disc_ok = disc > 0.0
    inv_sq, sq = _masked_rsqrt(disc, disc_ok)
    dist_sph = ud - sq

    bd = jnp.where(hitm, jnp.where(is_tri, dist_tri, dist_sph), 0.0)
    px, py, pz = ox + bd * ux, oy + bd * uy, oz + bd * uz

    d0x, d0y, d0z = px - cx, py - cy, pz - cz
    d0sq = d0x * d0x + d0y * d0y + d0z * d0z
    inv_d0, _ = _masked_rsqrt(d0sq, d0sq > 0.0)
    nx = jnp.where(hitm, jnp.where(is_tri, tnx, d0x * inv_d0), 0.0)
    ny = jnp.where(hitm, jnp.where(is_tri, tny, d0y * inv_d0), 0.0)
    nz = jnp.where(hitm, jnp.where(is_tri, tnz, d0z * inv_d0), 0.0)

    cosi = ux * nx + uy * ny + uz * nz
    rx = ux - 2.0 * cosi * nx
    ry = uy - 2.0 * cosi * ny
    rz = uz - 2.0 * cosi * nz

    lrec = []
    for li in range(nl):
        svx = lp[li][0] - px
        svy = lp[li][1] - py
        svz = lp[li][2] - pz
        d2 = svx * svx + svy * svy + svz * svz
        att = atten * _recip(atten + d2)      # atten + d2 >= atten > 0
        inv_sl, _ = _masked_rsqrt(d2, d2 > 0.0)
        dot_ns = nx * svx + ny * svy + nz * svz
        dot_ur = ux * rx + uy * ry + uz * rz
        lrec.append((svx, svy, svz, att, inv_sl, dot_ns, dot_ur))

    rec = dict(vx=vx, vy=vy, vz=vz, ivl=ivl, vlen=vlen,
               ux=ux, uy=uy, uz=uz,
               ndv_ok=ndv_ok, inv_ndv=inv_ndv, m_par=m_par,
               dx=dx, dy=dy, dz=dz, ud=ud, disc_ok=disc_ok,
               inv_sq=inv_sq, bd=bd, px=px, py=py, pz=pz,
               d0x=d0x, d0y=d0y, d0z=d0z, inv_d0=inv_d0,
               nx=nx, ny=ny, nz=nz, cosi=cosi, rx=rx, ry=ry, rz=rz,
               lights=lrec)

    t_dir = None
    if want_snell:
        rho = c["rho"]
        modulus = 1.0 - rho * rho * (1.0 - cosi * cosi)
        mod_ok = modulus > 0.0
        inv_cosr, cosr = _masked_rsqrt(modulus, mod_ok)
        mod_f = jnp.where(mod_ok, 1.0, 0.0)
        coef = cosr + rho * cosi
        tx = (rho * ux - coef * nx) * mod_f
        ty = (rho * uy - coef * ny) * mod_f
        tz = (rho * uz - coef * nz) * mod_f
        rec.update(mod_ok=mod_ok, mod_f=mod_f, inv_cosr=inv_cosr, coef=coef)
        t_dir = (tx, ty, tz)
    return rec, (px, py, pz), (rx, ry, rz), t_dir


def _snell_reverse(c, rec, t_b):
    """Adjoint of the transmitted direction t = (rho*u - coef*n) * mod_f
    given its cotangent 3-tuple ``t_b``.  Returns (u_b, n_b, cosi_b)
    contributions.  Shared by the chain (select transpose) and tree (both
    children) reverse sweeps."""
    t_bx, t_by, t_bz = t_b
    rho = c["rho"]
    nx, ny, nz = rec["nx"], rec["ny"], rec["nz"]
    mod_f, coef = rec["mod_f"], rec["coef"]
    rho_mf = rho * mod_f
    u_b = (rho_mf * t_bx, rho_mf * t_by, rho_mf * t_bz)
    cmf = coef * mod_f
    n_b = (-cmf * t_bx, -cmf * t_by, -cmf * t_bz)
    coef_b = -mod_f * (t_bx * nx + t_by * ny + t_bz * nz)
    # coef = cosr + rho*cosi; cosr = safe_sqrt(modulus, mod_ok);
    # modulus = 1 - rho^2 (1 - cosi^2)
    cosi_b = rho * coef_b
    mod_b = 0.5 * rec["inv_cosr"] * coef_b      # inv_cosr self-masks
    cosi_b += mod_b * (2.0 * rho * rho) * rec["cosi"]
    return u_b, n_b, cosi_b


def _adjoint_tile_body(tri_ref, mat_ref, light_ref,
                       sphd_ref, matd_ref, lightd_ref,
                       eye, vx0, vy0, vz0, bi_at, mid_at, lit_at,
                       gr, gg, gb,
                       *, ns: int, nt: int, m: int, nl: int, depth: int,
                       atten: float, want_trans: bool, shape,
                       fast_recip: bool = False, ov_at=None):
    """The replay adjoint for one tile: given per-level residual accessors
    (``bi_at(lv)``, ``mid_at(lv)``, ``lit_at(li, lv)`` -> [BH,BW] planes —
    HBM-loaded refs in the two-phase backward kernel, VMEM scratch in the
    fused fwd+bwd kernel) and the L2 cotangent planes, returns the per-tile
    gradient tables (dsph, dmat, dlight).

    ``ov_at(lv) -> 6 planes (ox oy oz vx vy vz)``: each level's input ray,
    recorded by the forward into VMEM scratch (render_pallas::
    _chain_forward's ov refs).  When given, the adjoint's own primal
    ray-chain phase is skipped entirely — per-level records are re-derived
    lazily inside the reverse loop from the recorded rays, which both
    removes the duplicated chain arithmetic and shrinks the reverse
    sweep's live set (the ~25-plane records exist one level at a time).

    The adjoint is HAND-WRITTEN (no ``jax.vjp``): a lean primal sweep keeps
    exactly the intermediates the reverse needs, every
    sqrt/divide/reciprocal adjoint reuses an already-computed reciprocal
    (one ``rsqrt`` yields both sqrt(x) = x*rsqrt(x) and the 0.5*inv^3
    adjoint factor), and the color accumulation — whose value the kernel
    never needs — is skipped entirely.  Versus the traced ``jax.vjp`` of
    the replay closure this cuts the backward per-level slot count ~2x
    (exact counts derived from this function's own jaxpr:
    utils/opcount.py::kernel_op_counts).  Gradients are defined through fixed hit
    topology, identical to kernels/adjoint.py::replay_render's autodiff
    (parity asserted in tests/test_adjoint_fused.py)."""
    f32 = jnp.float32

    def full(x):
        return jnp.full(shape, x, f32)

    # ---- per-level constants (fixed topology; no gradients flow here) ----
    # Selected via SMEM fori_loop mask-blends exactly like the forward kernel,
    # *outside* the differentiated closure so the VJP graph stays lean.
    consts = []
    for lv in range(depth + 1):
        bik = bi_at(lv)
        midl = mid_at(lv)
        hitm = bik >= 0.0
        is_tri = bik < float(nt)

        def tri_attr(i, c):
            sel = bik == i.astype(f32)
            return (jnp.where(sel, tri_ref[i, 3], c[0]),
                    jnp.where(sel, tri_ref[i, 4], c[1]),
                    jnp.where(sel, tri_ref[i, 5], c[2]),
                    jnp.where(sel, tri_ref[i, 16], c[3]))

        tnx, tny, tnz, tnv0 = _sweep_loop(nt, tri_attr, (full(0.0),) * 4)

        def mat_attr(j, c):
            sel = midl == j.astype(f32)
            return (jnp.where(sel, mat_ref[j, 9], c[0]),
                    jnp.where(sel, mat_ref[j, 10], c[1]),
                    jnp.where(sel, mat_ref[j, 11], c[2]),
                    jnp.where(sel, mat_ref[j, 12], c[3]),
                    jnp.where(sel, mat_ref[j, 15], c[4]))

        trn_r, trn_g, trn_b, rho, t_any = _sweep_loop(
            m, mat_attr, (full(0.0),) * 5)
        take_t = t_any > 0.5
        lits = [lit_at(li, lv) > 0.5 for li in range(nl)]
        consts.append(dict(bik=bik, midl=midl, hitm=hitm, is_tri=is_tri,
                           tn=(tnx, tny, tnz), tnv0=tnv0,
                           trn=(trn_r, trn_g, trn_b), rho=rho,
                           take_t=take_t, lits=lits))

    # Throughput chain: depends only on transparency (not a fit param), so it
    # is a per-level constant (MySdlApplication.cpp:1238-1246 weights).
    thr = [(full(1.0), full(1.0), full(1.0))]
    for lv in range(depth):
        c = consts[lv]
        tr, tg, tb = thr[-1]
        wr = jnp.where(c["take_t"], c["trn"][0], 1.0 - c["trn"][0])
        wg = jnp.where(c["take_t"], c["trn"][1], 1.0 - c["trn"][1])
        wb = jnp.where(c["take_t"], c["trn"][2], 1.0 - c["trn"][2])
        one = full(1.0)
        thr.append((tr * jnp.where(c["hitm"], wr, one),
                    tg * jnp.where(c["hitm"], wg, one),
                    tb * jnp.where(c["hitm"], wb, one)))

    # Light colors (constant scalars from SMEM).
    lcol = [(light_ref[li, 3], light_ref[li, 4], light_ref[li, 5])
            for li in range(nl)]

    # Per-level sphere/material selection masks (constants).
    sph_sel = [[consts[lv]["bik"] == float(nt + i) for i in range(ns)]
               for lv in range(depth + 1)]
    mat_sel = [[consts[lv]["midl"] == float(j) for j in range(m)]
               for lv in range(depth + 1)]

    # ---- pre-gathered differentiable planes (the vjp's primal inputs) ----
    # The table->plane gather is linear; doing it OUTSIDE the differentiated
    # closure keeps the vjp graph purely elementwise (no per-level parameter
    # reductions interleaved with the adjoint arithmetic) and lets the
    # gather transpose run as one batched block of masked reductions at the
    # end — measured ~2x cheaper than vjp'ing through the gathers.
    gath = []
    for lv in range(depth + 1):
        cx, cy, cz, rr = full(0.0), full(0.0), full(0.0), full(0.0)
        for i in range(ns):
            sel = sph_sel[lv][i]
            cx = jnp.where(sel, sphd_ref[i, 0], cx)
            cy = jnp.where(sel, sphd_ref[i, 1], cy)
            cz = jnp.where(sel, sphd_ref[i, 2], cz)
            rr = jnp.where(sel, sphd_ref[i, 3], rr)
        fields = [full(0.0) for _ in range(9)]
        for j in range(m):
            sel = mat_sel[lv][j]
            for k in range(9):
                fields[k] = jnp.where(sel, matd_ref[j, k], fields[k])
        gath.append([cx, cy, cz, rr] + fields)
    lp = [[full(lightd_ref[li, 0]), full(lightd_ref[li, 1]),
           full(lightd_ref[li, 2])] for li in range(nl)]

    # ---- hand-written primal sweep ----------------------------------------
    # Mirrors kernels/adjoint.py::replay_render value-for-value (the shared
    # per-node helper _node_primal) but skips the color accumulation (never
    # needed — the forward kernel produced the image) and keeps every
    # intermediate the reverse sweep consumes.
    #
    # RTFS_BWD_RECOMPUTE=1 (trace-time knob): keep only each level's
    # (o, v) ray — 6 planes/level instead of the ~25-plane primal record —
    # and re-derive the record inside the reverse loop with one extra
    # _node_primal per level.  Trades ~15% more backward arithmetic for a
    # ~4x smaller live set across the reverse sweep (the fused kernel's
    # register-pressure experiment; values are bit-identical — same
    # inputs, same math).
    recompute = os.environ.get("RTFS_BWD_RECOMPUTE", "0") == "1"
    P = []
    OV = []
    if ov_at is None:
        o = (full(eye[0]), full(eye[1]), full(eye[2]))
        v = (vx0, vy0, vz0)
        for lv in range(depth + 1):
            c = consts[lv]
            hitm = c["hitm"]
            want_snell = lv < depth and want_trans
            OV.append((o, v))
            rec, p, r_dir, t_dir = _node_primal(
                c, gath[lv], lp, o, v, nl=nl, atten=atten,
                want_snell=want_snell, fast_recip=fast_recip)
            if lv < depth:
                if want_trans:
                    take_t = c["take_t"]
                    nv = tuple(jnp.where(take_t, t, r)
                               for t, r in zip(t_dir, r_dir))
                else:
                    # no transmitting material (static): the chain always
                    # reflects — bit-identical to the gated selects above
                    nv = r_dir
                v = tuple(jnp.where(hitm, nvi, 0.0) for nvi in nv)
                o = p
            P.append(None if recompute else rec)

    # ---- hand-written reverse sweep ---------------------------------------
    # Cotangents flow level depth -> 0; the per-node math lives in
    # _node_reverse (shared with the tree adjoint).  Parameter cotangents
    # land in d_gath[lv] (13 planes, same layout as gath) and d_lp; the
    # gather transpose below is unchanged.
    d_gath = [[full(0.0) for _ in range(13)] for _ in range(depth + 1)]
    d_lp = [[full(0.0) for _ in range(3)] for _ in range(nl)]
    pbx = pby = pbz = full(0.0)   # cotangent of p (= next level's o)
    vbx = vby = vbz = full(0.0)   # cotangent of next level's v input
    for lv in range(depth, -1, -1):
        c = consts[lv]
        if ov_at is not None:
            planes = ov_at(lv)
            rec, _, _, _ = _node_primal(
                c, gath[lv], lp, planes[0:3], planes[3:6], nl=nl,
                atten=atten, want_snell=(lv < depth and want_trans),
                fast_recip=fast_recip)
        elif recompute:
            o_lv, v_lv = OV[lv]
            rec, _, _, _ = _node_primal(
                c, gath[lv], lp, o_lv, v_lv, nl=nl, atten=atten,
                want_snell=(lv < depth and want_trans),
                fast_recip=fast_recip)
        else:
            rec = P[lv]
        hitm = c["hitm"]
        nx, ny, nz = rec["nx"], rec["ny"], rec["nz"]

        zero3 = (full(0.0), full(0.0), full(0.0))
        inflow = dict(p=(pbx, pby, pbz), u=zero3, n=zero3,
                      r=zero3, cosi=full(0.0))

        # child-ray select (v_{lv+1} = where(hitm, nv, 0); nv = t or r)
        if lv < depth:
            vmx = jnp.where(hitm, vbx, 0.0)
            vmy = jnp.where(hitm, vby, 0.0)
            vmz = jnp.where(hitm, vbz, 0.0)
            if want_trans:
                take_t = c["take_t"]
                t_b = (jnp.where(take_t, vmx, 0.0),
                       jnp.where(take_t, vmy, 0.0),
                       jnp.where(take_t, vmz, 0.0))
                r_b = (jnp.where(take_t, 0.0, vmx),
                       jnp.where(take_t, 0.0, vmy),
                       jnp.where(take_t, 0.0, vmz))
                u_b, n_b, cosi_b = _snell_reverse(c, rec, t_b)
                inflow.update(u=u_b, n=n_b, r=r_b, cosi=cosi_b)
            else:
                inflow.update(r=(vmx, vmy, vmz))

        tr_, tg_, tb_ = thr[lv]
        (pbx, pby, pbz), (vbx, vby, vbz) = _node_reverse(
            c, rec, gath[lv], d_gath[lv], d_lp, lcol,
            (tr_ * gr, tg_ * gg, tb_ * gb), atten, nl, inflow)

    # ---- gather transpose, hand-batched ----
    # Level-summed masked cotangent planes (elementwise), then ONE reduction
    # per (entity, field) extracted through the vjp of a linear projection —
    # 51 contiguous tile reductions instead of ~200 interleaved ones.
    def lvsum(idx, masks_per_lv):
        acc = full(0.0)
        for lv in range(depth + 1):
            acc = acc + masks_per_lv[lv] * d_gath[lv][idx]
        return acc

    sph_m = [[jnp.where(sph_sel[lv][i], 1.0, 0.0) for lv in range(depth + 1)]
             for i in range(ns)]
    mat_m = [[jnp.where(mat_sel[lv][j], 1.0, 0.0) for lv in range(depth + 1)]
             for j in range(m)]
    P_sph = [[lvsum(k, sph_m[i]) for k in range(4)] for i in range(ns)]
    P_mat = [[lvsum(4 + k, mat_m[j]) for k in range(9)] for j in range(m)]

    def project(sphd, matd, lightd):
        q = full(0.0)
        for i in range(ns):
            for k in range(4):
                q = q + sphd[i, k] * P_sph[i][k]
        for j in range(m):
            for k in range(9):
                q = q + matd[j, k] * P_mat[j][k]
        for li in range(nl):
            for k in range(3):
                q = q + lightd[li, k] * d_lp[li][k]
        return jnp.sum(q)

    _, vjp_proj = jax.vjp(project, sphd_ref[...], matd_ref[...],
                          lightd_ref[...])
    return vjp_proj(jnp.float32(1.0))


def _adjoint_tree_tile_body(tri_ref, mat_ref, light_ref,
                            sphd_ref, matd_ref, lightd_ref,
                            eye, vx0, vy0, vz0, bi_at, mid_at, lit_at,
                            gr, gg, gb,
                            *, ns: int, nt: int, m: int, nl: int, depth: int,
                            atten: float, shape, fast_recip: bool = False):
    """The replay adjoint of the full bounce *tree* for one tile
    (fractional-transparency scenes — the literal ``rayTraceRay`` recursion,
    MySdlApplication.cpp:1230-1248): given per-preorder-node residual
    accessors (``bi_at(idx)``, ``mid_at(idx)``, ``lit_at(li, idx)`` with
    idx over the 2^(depth+1)-1 preorder nodes, matching the tree forward's
    static unroll order) and the L2 cotangent planes, returns the per-tile
    gradient tables (dsph, dmat, dlight) for the FitParams leaves.

    Structure: an interleaved primal/reverse recursion — each node runs its
    primal sweep (shared ``_node_primal``), recurses into the transmitted
    then reflected subtree, assembles the children's ray cotangents, and
    reverses itself (shared ``_node_reverse``), so the live VMEM set is one
    path of recs (depth+1), not all 2^(depth+1)-1.  Per-entity parameter
    cotangents accumulate into ns*4 + m*9 + nl*3 running planes, folded per
    node, and the final gather transpose is the same linear-projection vjp
    as the chain body.

    Node weighting (all constants under fixed topology — transparency is
    not a fit parameter): node k's local shading reaches the image with
    weight W_k = prod over ancestor edges of (branch mask x branch weight),
    where the transmitted edge carries take_t*hitm x trn and the reflected
    edge carries refl_ok*hitm x (1-trn) — exactly
    kernels/adjoint.py::replay_render_tree's masks, whose autodiff this
    body matches (parity asserted in tests/test_adjoint_tree.py)."""
    f32 = jnp.float32

    def full(x):
        return jnp.full(shape, x, f32)

    lcol = [(light_ref[li, 3], light_ref[li, 4], light_ref[li, 5])
            for li in range(nl)]
    lp = [[full(lightd_ref[li, 0]), full(lightd_ref[li, 1]),
           full(lightd_ref[li, 2])] for li in range(nl)]

    # global per-entity cotangent planes (folded per node — memory is
    # independent of the node count)
    P_sph = [[full(0.0) for _ in range(4)] for _ in range(ns)]
    P_mat = [[full(0.0) for _ in range(9)] for _ in range(m)]
    d_lp = [[full(0.0) for _ in range(3)] for _ in range(nl)]

    counter = [0]  # next preorder node index (static during the unroll)

    def node(o, v, W3, level):
        idx = counter[0]
        counter[0] += 1
        bik = bi_at(idx)
        midl = mid_at(idx)
        hitm = bik >= 0.0
        is_tri = bik < float(nt)

        def tri_attr(i, c):
            sel = bik == i.astype(f32)
            return (jnp.where(sel, tri_ref[i, 3], c[0]),
                    jnp.where(sel, tri_ref[i, 4], c[1]),
                    jnp.where(sel, tri_ref[i, 5], c[2]),
                    jnp.where(sel, tri_ref[i, 16], c[3]))

        tnx, tny, tnz, tnv0 = _sweep_loop(nt, tri_attr, (full(0.0),) * 4)

        def mat_attr(j, c):
            sel = midl == j.astype(f32)
            # trn rgb, rho, take_trans (t_any & |T|>SMALL), refl_ok —
            # the tree replay's branch gates (adjoint.py::_node_math)
            return tuple(jnp.where(sel, mat_ref[j, k], c[q])
                         for q, k in enumerate((9, 10, 11, 12, 13, 14)))

        trn_r, trn_g, trn_b, rho, take_f_m, refl_f_m = _sweep_loop(
            m, mat_attr, (full(0.0),) * 6)
        lits = [lit_at(li, idx) > 0.5 for li in range(nl)]
        c = dict(bik=bik, midl=midl, hitm=hitm, is_tri=is_tri,
                 tn=(tnx, tny, tnz), tnv0=tnv0,
                 trn=(trn_r, trn_g, trn_b), rho=rho, lits=lits)

        sph_sel = [bik == float(nt + i) for i in range(ns)]
        mat_sel = [midl == float(j) for j in range(m)]
        cx, cy, cz, rr = full(0.0), full(0.0), full(0.0), full(0.0)
        for i in range(ns):
            s = sph_sel[i]
            cx = jnp.where(s, sphd_ref[i, 0], cx)
            cy = jnp.where(s, sphd_ref[i, 1], cy)
            cz = jnp.where(s, sphd_ref[i, 2], cz)
            rr = jnp.where(s, sphd_ref[i, 3], rr)
        fields = [full(0.0) for _ in range(9)]
        for j in range(m):
            s = mat_sel[j]
            for k in range(9):
                fields[k] = jnp.where(s, matd_ref[j, k], fields[k])
        gath_n = [cx, cy, cz, rr] + fields

        want_snell = level < depth
        rec, p, r_dir, t_dir = _node_primal(
            c, gath_n, lp, o, v, nl=nl, atten=atten,
            want_snell=want_snell, fast_recip=fast_recip)

        zero3 = (full(0.0), full(0.0), full(0.0))
        inflow = dict(p=zero3, u=zero3, n=zero3, r=zero3, cosi=full(0.0))
        if level < depth:
            take_mask = jnp.logical_and(take_f_m > 0.5, hitm)
            refl_mask = jnp.logical_and(refl_f_m > 0.5, hitm)
            tm_f = jnp.where(take_mask, 1.0, 0.0)
            rm_f = jnp.where(refl_mask, 1.0, 0.0)
            Wt = (W3[0] * trn_r * tm_f, W3[1] * trn_g * tm_f,
                  W3[2] * trn_b * tm_f)
            Wr = (W3[0] * (1.0 - trn_r) * rm_f, W3[1] * (1.0 - trn_g) * rm_f,
                  W3[2] * (1.0 - trn_b) * rm_f)
            vt = tuple(t * tm_f for t in t_dir)
            vr = tuple(r * rm_f for r in r_dir)
            ob_t, vb_t = node(p, vt, Wt, level + 1)   # transmitted subtree
            ob_r, vb_r = node(p, vr, Wr, level + 1)   # reflected subtree
            # child v = dir * mask -> dir_b = mask * child_v_b
            t_b = tuple(tm_f * x for x in vb_t)
            r_b = tuple(rm_f * x for x in vb_r)
            u_b, n_b, cosi_b = _snell_reverse(c, rec, t_b)
            p_in = tuple(a + b for a, b in zip(ob_t, ob_r))
            inflow = dict(p=p_in, u=u_b, n=n_b, r=r_b, cosi=cosi_b)

        d_gath_n = [full(0.0) for _ in range(13)]
        G3 = (W3[0] * gr, W3[1] * gg, W3[2] * gb)
        o_b, v_b = _node_reverse(c, rec, gath_n, d_gath_n, d_lp, lcol,
                                 G3, atten, nl, inflow)

        for i in range(ns):
            mask = jnp.where(sph_sel[i], 1.0, 0.0)
            for k in range(4):
                P_sph[i][k] += mask * d_gath_n[k]
        for j in range(m):
            mask = jnp.where(mat_sel[j], 1.0, 0.0)
            for k in range(9):
                P_mat[j][k] += mask * d_gath_n[4 + k]
        return o_b, v_b

    node((full(eye[0]), full(eye[1]), full(eye[2])), (vx0, vy0, vz0),
         (full(1.0), full(1.0), full(1.0)), 0)

    def project(sphd, matd, lightd):
        q = full(0.0)
        for i in range(ns):
            for k in range(4):
                q = q + sphd[i, k] * P_sph[i][k]
        for j in range(m):
            for k in range(9):
                q = q + matd[j, k] * P_mat[j][k]
        for li in range(nl):
            for k in range(3):
                q = q + lightd[li, k] * d_lp[li][k]
        return jnp.sum(q)

    _, vjp_proj = jax.vjp(project, sphd_ref[...], matd_ref[...],
                          lightd_ref[...])
    return vjp_proj(jnp.float32(1.0))


def _accumulate_grid(dsph, dmat, dlight, dsph_ref, dmat_ref, dlight_ref):
    """First grid step initializes the gradient-table outputs; later steps
    accumulate (the TPU grid is sequential)."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dsph_ref[...] = dsph
        dmat_ref[...] = dmat
        dlight_ref[...] = dlight

    @pl.when(jnp.logical_not(first))
    def _():
        dsph_ref[...] += dsph
        dmat_ref[...] += dmat
        dlight_ref[...] += dlight


def _bwd_tile_kernel(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                     sphd_ref, matd_ref, lightd_ref,
                     vx_ref, vy_ref, vz_ref, bi_ref, mid_ref, lit_ref,
                     gr_ref, gg_ref, gb_ref,
                     dsph_ref, dmat_ref, dlight_ref,
                     *, ns: int, nt: int, m: int, nl: int, depth: int,
                     atten: float, want_trans: bool = True,
                     fast_recip: bool = False):
    eye = (misc_ref[0], misc_ref[1], misc_ref[2])
    dsph, dmat, dlight = _adjoint_tile_body(
        tri_ref, mat_ref, light_ref, sphd_ref, matd_ref, lightd_ref,
        eye, vx_ref[:], vy_ref[:], vz_ref[:],
        bi_at=lambda lv: bi_ref[lv],
        mid_at=lambda lv: mid_ref[lv],
        lit_at=lambda li, lv: lit_ref[li * (depth + 1) + lv],
        gr=gr_ref[:], gg=gg_ref[:], gb=gb_ref[:],
        ns=ns, nt=nt, m=m, nl=nl, depth=depth, atten=atten,
        want_trans=want_trans, shape=vx_ref.shape, fast_recip=fast_recip)
    _accumulate_grid(dsph, dmat, dlight, dsph_ref, dmat_ref, dlight_ref)


def _unpack_residuals(pk_ref, nl: int, pack):
    """Lazy per-level unpack of the single-plane packed residuals
    (render_pallas.py::pack_widths layout).  All fields are small integers
    exact in f32; the field widths are powers of two, so the divides are
    exact multiplies.  Returns (bi_at, mid_at, lit_at) accessors with a
    per-level cache (each level is unpacked once)."""
    bw_bi, bw_mid = pack
    inv_lit = 1.0 / (bw_bi * bw_mid)
    inv_bi = 1.0 / bw_bi
    cache = {}

    def unpack(lv):
        if lv not in cache:
            pk = pk_ref[lv]
            hi = jnp.trunc(pk * inv_lit)          # lit bit field
            rem = pk - hi * (bw_bi * bw_mid)
            mid = jnp.trunc(rem * inv_bi)
            biq = rem - mid * bw_bi
            lits = []
            for _ in range(nl):
                nxt = jnp.trunc(hi * 0.5)
                lits.append(hi - nxt * 2.0)
                hi = nxt
            cache[lv] = (biq - 1.0, mid, lits)
        return cache[lv]

    return (lambda lv: unpack(lv)[0],
            lambda lv: unpack(lv)[1],
            lambda li, lv: unpack(lv)[2][li])


def _bwd_packed_kernel(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                       sphd_ref, matd_ref, lightd_ref,
                       vx_ref, vy_ref, vz_ref,
                       cr_ref, cg_ref, cb_ref,
                       tr_ref, tg_ref, tb_ref, mask_ref, pk_ref,
                       loss_ref, dsph_ref, dmat_ref, dlight_ref,
                       *, ns: int, nt: int, m: int, nl: int, depth: int,
                       atten: float, want_trans: bool, fast_recip: bool,
                       g_scale: float, pack):
    """Phase 2 of the packed two-phase fwd+bwd: the L2 cotangent
    ``g = g_scale * mask * (img - target)`` and the masked squared-error sum
    are formed IN the backward kernel's prologue (no XLA glue between the
    phases — the measured ~0.2 ms of cotangent/loss glue in the round-4
    ``fused2`` path, PERF.md §2), the packed residual plane is unpacked per
    level, and the hand-written replay adjoint runs as usual."""
    eye = (misc_ref[0], misc_ref[1], misc_ref[2])
    mask = mask_ref[:]
    dr_raw = cr_ref[:] - tr_ref[:]
    dg_raw = cg_ref[:] - tg_ref[:]
    db_raw = cb_ref[:] - tb_ref[:]
    dr, dg, db = dr_raw * mask, dg_raw * mask, db_raw * mask
    tile_loss = jnp.sum(dr * dr_raw + dg * dg_raw + db * db_raw)

    bi_at, mid_at, lit_at = _unpack_residuals(pk_ref, nl, pack)
    dsph, dmat, dlight = _adjoint_tile_body(
        tri_ref, mat_ref, light_ref, sphd_ref, matd_ref, lightd_ref,
        eye, vx_ref[:], vy_ref[:], vz_ref[:],
        bi_at=bi_at, mid_at=mid_at, lit_at=lit_at,
        gr=g_scale * dr, gg=g_scale * dg, gb=g_scale * db,
        ns=ns, nt=nt, m=m, nl=nl, depth=depth, atten=atten,
        want_trans=want_trans, shape=vx_ref.shape, fast_recip=fast_recip)

    tile_loss = tile_loss[None, None]
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        loss_ref[...] = tile_loss

    @pl.when(jnp.logical_not(first))
    def _():
        loss_ref[...] += tile_loss

    _accumulate_grid(dsph, dmat, dlight, dsph_ref, dmat_ref, dlight_ref)


def twophase_loss_grads_pallas(scene: FlatScene, camera: Camera,
                               config: RenderConfig, target,
                               mask: Optional[Any] = None,
                               denom: Optional[float] = None,
                               block_h: int = None, block_w: int = None,
                               interpret: Optional[bool] = None,
                               pts: Optional[Any] = None,
                               prep: Optional[Dict[str, Any]] = None,
                               bwd_block: Optional[tuple] = None):
    """TRUE two-phase fwd+bwd for chain-exact scenes: phase 1 renders the
    image AND the single-plane packed residuals (one in-loop store per
    bounce level — render_pallas.py::pack_widths), phase 2 forms the L2
    cotangent + loss in-kernel and runs the hand adjoint.  Same signature
    and return value as ``fused_loss_grads_pallas``: ``(sq_err_sum,
    grads_c)``.

    ``bwd_block``: optional (bh, bw) tile for phase 2 — splitting the
    phases lets each pick its own block shape (the adjoint's scheduling
    optimum differs from the forward's).  Default: the scene's measured
    backward block (``render_pallas.py::default_blocks(phase="bwd")`` —
    16×256 small scenes, 64×512 large, 64×256 deep-large); silently falls
    back to the forward block when it does not tile the phase-1-padded
    planes exactly.

    Why a second shape exists at all: the single-dispatch fused kernel's
    adjoint runs at ~0.45 of the saturated VPU rate INSIDE the giant fused
    program but 0.79 standalone — a compiled-program-size Mosaic scheduling
    artifact (PERF.md §2, round-4 phase-isolation probes).  Splitting the
    phases recovers the standalone rates, and the two round-4 blockers are
    both fixed here: the residual-store overhead is cut ~4x by packing
    (2+nl stores/level -> 1) and the ~0.2 ms of XLA cotangent/loss glue is
    folded into phase 2's prologue."""
    if not scene.chain_exact:
        raise ValueError("packed two-phase backward replays the bounce "
                         "chain; fractional-transparency scenes take the "
                         "fused tree path (fused_loss_grads_pallas)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from .render_pallas import (_resolve_blocks, default_blocks,
                                pack_widths, render_forward_packed)
    scene = compact_scene(scene)
    if prep is not None and block_h is None and block_w is None:
        block_h, block_w = prep["block"]
    block_h, block_w = _resolve_blocks(scene, block_h, block_w)
    ns, nt = scene.num_spheres, scene.num_triangles
    m, nl = scene.num_materials, scene.num_lights
    w, h = config.width, config.height
    depth = config.max_depth
    if denom is None:
        denom = float(h * w * 3)

    packed = pack_scene(scene)
    packed["misc"] = packed["misc"].at[0:3].set(
        camera.eye.astype(jnp.float32))
    sphd, matd, lightd = _pack_diff_tables(scene)

    if prep is None:
        prep = prepare_fit_inputs(camera, config, target, mask=mask,
                                  block_h=block_h, block_w=block_w, pts=pts)
    else:
        _check_prep(prep, target, mask, pts, block_h, block_w)
    vx, vy, vz = prep["vx"], prep["vy"], prep["vz"]
    tr, tg, tb, mask = prep["tr"], prep["tg"], prep["tb"], prep["mask"]
    ph, pw = vx.shape

    pack = pack_widths(packed["tri"].shape[0], ns, m, nl)

    # ---- phase 1: forward + packed residuals (padded planes throughout) --
    cr, cg, cb, pk = render_forward_packed(
        packed, scene, config, vx, vy, vz, block_h, block_w, interpret, pack)

    # ---- phase 2: cotangent prologue + replay adjoint ----
    if bwd_block is None:
        bwd_block = default_blocks(scene, phase="bwd", depth=depth)
    if ph % bwd_block[0] == 0 and pw % bwd_block[1] == 0:
        block_h, block_w = bwd_block
    kernel = functools.partial(
        _bwd_packed_kernel, ns=ns, nt=packed["tri"].shape[0], m=m, nl=nl,
        depth=depth, atten=config.attenuation_factor,
        want_trans=bool(scene.has_transmission), fast_recip=not interpret,
        g_scale=2.0 / denom, pack=pack)
    grid = (ph // block_h, pw // block_w)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    res_tile = pl.BlockSpec((depth + 1, block_h, block_w),
                            lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    acc1 = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((max(ns, 1), SPHD_COLS), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    acc_m = pl.BlockSpec((max(m, 1), MATD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    acc_l = pl.BlockSpec((max(nl, 1), LIGHTD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)

    loss_sum, dsph, dmat, dlight = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 5 + [vfull] * 3 + [tile] * 10 + [res_tile],
        out_specs=[acc1, acc, acc_m, acc_l],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((max(ns, 1), SPHD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(m, 1), MATD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(nl, 1), LIGHTD_COLS),
                                        jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else kernel_compiler_params(),
    )(packed["sph"], packed["tri"], packed["mat"], packed["light"],
      packed["misc"], sphd, matd, lightd, vx, vy, vz,
      cr, cg, cb, tr, tg, tb, mask, pk)

    grads_c = dict(sph_center=dsph[:ns, 0:3], sph_radius=dsph[:ns, 3],
                   mat_ambient=dmat[:m, 0:3], mat_diffuse=dmat[:m, 3:6],
                   mat_specular=dmat[:m, 6:9], light_pos=dlight[:nl, 0:3])
    return loss_sum[0, 0], grads_c


def _fused_fwd_bwd_kernel(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                          sphd_ref, matd_ref, lightd_ref,
                          vx_ref, vy_ref, vz_ref,
                          tr_ref, tg_ref, tb_ref, mask_ref,
                          loss_ref, dsph_ref, dmat_ref, dlight_ref,
                          bi_scr, mid_scr, *lit_scrs,
                          ns: int, nt: int, m: int, nl: int, depth: int,
                          small: float, atten: float,
                          white_id: int, black_id: int,
                          want_trans: bool, fast_recip: bool,
                          g_scale: float, tree: bool = False,
                          share_ov: bool = False,
                          bf16_shading: bool = False):
    """Single-kernel forward + L2 loss + replay adjoint (ROADMAP r2->3 #1):
    the tile is rendered with the chain forward (or, for fractional-
    transparency scenes, the full bounce-tree forward, ``tree=True``), the
    fixed-topology residual planes stay in VMEM scratch (per bounce level
    for the chain, per preorder tree node for the tree), the per-pixel L2
    cotangent ``g = g_scale * mask * (img - target)`` is formed in place,
    and the matching replay adjoint runs immediately — no residual HBM
    round-trip and one dispatch instead of two.  ``mask`` zeroes padding
    pixels (image->block padding and sharded row-band mesh padding alike),
    so ``loss_ref`` accumulates the raw masked squared-error sum (divide by
    the pixel count outside).  Semantics identical to
    render_forward_with_residuals + fit_grads_pallas."""
    from .render_pallas import (_chain_forward, _make_tile_ops,
                                _tree_forward)
    shape = vx_ref.shape
    ops = _make_tile_ops(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                         shape, ns=ns, nt=nt, m=m, nl=nl, small=small,
                         atten=atten, white_id=white_id, black_id=black_id,
                         fast_recip=fast_recip, all_opaque=not want_trans,
                         bf16_shading=bf16_shading)
    eye = (misc_ref[0], misc_ref[1], misc_ref[2])
    vx0, vy0, vz0 = vx_ref[:], vy_ref[:], vz_ref[:]
    fwd = _tree_forward if tree else _chain_forward
    # share_ov: the last 6 scratch refs record each level's input ray so
    # the adjoint below skips its own primal ray-chain phase (ov_at)
    lits, ovs = lit_scrs[:nl], lit_scrs[nl:]
    col_r, col_g, col_b = fwd(
        ops, eye, vx0, vy0, vz0, nl=nl, depth=depth, want_trans=want_trans,
        res_refs=(bi_scr, mid_scr) + lits + ovs)

    # Mask applied ONCE: the tile loss is sum(mask * diff^2) and the
    # cotangent is g_scale * mask * diff, so the returned gradient is exactly
    # the gradient of the returned loss for ANY mask (binary validity planes
    # and fractional weight maps alike).
    mask = mask_ref[:]
    dr_raw = col_r - tr_ref[:]
    dg_raw = col_g - tg_ref[:]
    db_raw = col_b - tb_ref[:]
    dr, dg, db = dr_raw * mask, dg_raw * mask, db_raw * mask
    tile_loss = jnp.sum(dr * dr_raw + dg * dg_raw + db * db_raw)

    if tree:
        dsph, dmat, dlight = _adjoint_tree_tile_body(
            tri_ref, mat_ref, light_ref, sphd_ref, matd_ref, lightd_ref,
            eye, vx0, vy0, vz0,
            bi_at=lambda k: bi_scr[k],
            mid_at=lambda k: mid_scr[k],
            lit_at=lambda li, k: lit_scrs[li][k],
            gr=g_scale * dr, gg=g_scale * dg, gb=g_scale * db,
            ns=ns, nt=nt, m=m, nl=nl, depth=depth, atten=atten,
            shape=shape, fast_recip=fast_recip)
    else:
        dsph, dmat, dlight = _adjoint_tile_body(
            tri_ref, mat_ref, light_ref, sphd_ref, matd_ref, lightd_ref,
            eye, vx0, vy0, vz0,
            bi_at=lambda lv: bi_scr[lv],
            mid_at=lambda lv: mid_scr[lv],
            lit_at=lambda li, lv: lits[li][lv],
            gr=g_scale * dr, gg=g_scale * dg, gb=g_scale * db,
            ns=ns, nt=nt, m=m, nl=nl, depth=depth, atten=atten,
            want_trans=want_trans, shape=shape, fast_recip=fast_recip,
            ov_at=(lambda lv: tuple(ovs[k][lv] for k in range(6)))
            if share_ov else None)

    # (1,1)-shaped stores: Mosaic VMEM cannot store bare scalars
    tile_loss = tile_loss[None, None]
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        loss_ref[...] = tile_loss

    @pl.when(jnp.logical_not(first))
    def _():
        loss_ref[...] += tile_loss

    _accumulate_grid(dsph, dmat, dlight, dsph_ref, dmat_ref, dlight_ref)


def _recompute_bwd_kernel(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                          sphd_ref, matd_ref, lightd_ref,
                          vx_ref, vy_ref, vz_ref,
                          gr_ref, gg_ref, gb_ref,
                          dsph_ref, dmat_ref, dlight_ref,
                          bi_scr, mid_scr, *lit_scrs,
                          ns: int, nt: int, m: int, nl: int, depth: int,
                          small: float, atten: float,
                          white_id: int, black_id: int,
                          want_trans: bool, fast_recip: bool,
                          tree: bool = False, share_ov: bool = False,
                          bf16_shading: bool = False):
    """Recompute-forward + replay-adjoint in one dispatch, with the
    cotangent supplied externally (``gr/gg/gb`` planes) instead of derived
    from a target in-kernel.  This is the per-sample backward of the
    supersampled fit: the forward chain (or bounce tree, ``tree=True``)
    re-traces the tile into VMEM scratch residuals (never HBM) and the
    hand adjoint consumes them immediately.  The image the loss needs was
    already produced by the plain forward kernel; re-tracing here costs one
    forward but saves S x (2+nl) x levels full-image residual planes of HBM
    traffic — the round-2 cliff (VERDICT r2 item 7)."""
    from .render_pallas import (_chain_forward, _make_tile_ops,
                                _tree_forward)
    shape = vx_ref.shape
    ops = _make_tile_ops(sph_ref, tri_ref, mat_ref, light_ref, misc_ref,
                         shape, ns=ns, nt=nt, m=m, nl=nl, small=small,
                         atten=atten, white_id=white_id, black_id=black_id,
                         fast_recip=fast_recip, all_opaque=not want_trans,
                         bf16_shading=bf16_shading)
    eye = (misc_ref[0], misc_ref[1], misc_ref[2])
    vx0, vy0, vz0 = vx_ref[:], vy_ref[:], vz_ref[:]
    # forward re-trace (colors discarded; only the residual scratch matters).
    # share_ov: 6 extra scratch refs record each level's input ray so the
    # chain adjoint skips its primal phase (ov_at).
    lits, ovs = lit_scrs[:nl], lit_scrs[nl:]
    fwd = _tree_forward if tree else _chain_forward
    fwd(ops, eye, vx0, vy0, vz0, nl=nl, depth=depth, want_trans=want_trans,
        res_refs=(bi_scr, mid_scr) + lits + ovs)
    if tree:
        dsph, dmat, dlight = _adjoint_tree_tile_body(
            tri_ref, mat_ref, light_ref, sphd_ref, matd_ref, lightd_ref,
            eye, vx0, vy0, vz0,
            bi_at=lambda k: bi_scr[k],
            mid_at=lambda k: mid_scr[k],
            lit_at=lambda li, k: lit_scrs[li][k],
            gr=gr_ref[:], gg=gg_ref[:], gb=gb_ref[:],
            ns=ns, nt=nt, m=m, nl=nl, depth=depth, atten=atten,
            shape=shape, fast_recip=fast_recip)
    else:
        dsph, dmat, dlight = _adjoint_tile_body(
            tri_ref, mat_ref, light_ref, sphd_ref, matd_ref, lightd_ref,
            eye, vx0, vy0, vz0,
            bi_at=lambda lv: bi_scr[lv],
            mid_at=lambda lv: mid_scr[lv],
            lit_at=lambda li, lv: lits[li][lv],
            gr=gr_ref[:], gg=gg_ref[:], gb=gb_ref[:],
            ns=ns, nt=nt, m=m, nl=nl, depth=depth, atten=atten,
            want_trans=want_trans, shape=shape, fast_recip=fast_recip,
            ov_at=(lambda lv: tuple(ovs[k][lv] for k in range(6)))
            if share_ov else None)
    _accumulate_grid(dsph, dmat, dlight, dsph_ref, dmat_ref, dlight_ref)


def recompute_grads_pallas(scene: FlatScene, camera: Camera,
                           config: RenderConfig, g,
                           block_h: int = None, block_w: int = None,
                           interpret: Optional[bool] = None,
                           pts: Optional[Any] = None) -> Dict[str, Any]:
    """Single-dispatch backward with an external cotangent ``g`` [H,W,3]:
    re-traces the forward into VMEM scratch and runs the hand adjoint.
    Returns compacted-scene gradient tables (layout = fit_grads_pallas).
    Used by the supersampled fit path (one dispatch per sample, zero
    residual HBM traffic).  Fractional-transparency scenes route to the
    bounce-tree re-trace + in-kernel tree adjoint automatically."""
    from .render_pallas import n_tree_nodes
    tree = not scene.chain_exact
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scene = compact_scene(scene)
    from .render_pallas import _resolve_blocks
    block_h, block_w = _resolve_blocks(scene, block_h, block_w,
                                       phase="fused")
    ns, m, nl = scene.num_spheres, scene.num_materials, scene.num_lights
    w, h = config.width, config.height
    depth = config.max_depth
    levels = n_tree_nodes(depth) if tree else depth + 1

    packed = pack_scene(scene)
    packed["misc"] = packed["misc"].at[0:3].set(
        camera.eye.astype(jnp.float32))
    sphd, matd, lightd = _pack_diff_tables(scene)

    if pts is None:
        pts = screen_points(camera, w, h)
    _, v = primary_rays(camera, pts)
    vx = _pad_img(v[:, 0], h, w, block_h, block_w)
    vy = _pad_img(v[:, 1], h, w, block_h, block_w)
    vz = _pad_img(v[:, 2], h, w, block_h, block_w)
    ph, pw = vx.shape

    g = jnp.asarray(g, jnp.float32)
    gr = _pad_img(g[..., 0].reshape(-1), h, w, block_h, block_w)
    gg = _pad_img(g[..., 1].reshape(-1), h, w, block_h, block_w)
    gb = _pad_img(g[..., 2].reshape(-1), h, w, block_h, block_w)

    share_ov = (not tree
                and os.environ.get("RTFS_FWD_OV", "0") == "1")
    kernel = functools.partial(
        _recompute_bwd_kernel, ns=ns, nt=packed["tri"].shape[0], m=m, nl=nl,
        depth=depth, small=config.small_number,
        atten=config.attenuation_factor,
        white_id=scene.checker_mats[0], black_id=scene.checker_mats[1],
        want_trans=bool(scene.has_transmission), fast_recip=not interpret,
        tree=tree, share_ov=share_ov, bf16_shading=config.bf16_shading)
    grid = (ph // block_h, pw // block_w)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((max(ns, 1), SPHD_COLS), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    acc_m = pl.BlockSpec((max(m, 1), MATD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    acc_l = pl.BlockSpec((max(nl, 1), LIGHTD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    res_scr = pltpu.VMEM((levels, block_h, block_w), jnp.float32)

    dsph, dmat, dlight = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 5 + [vfull] * 3 + [tile] * 6,
        out_specs=[acc, acc_m, acc_l],
        out_shape=[jax.ShapeDtypeStruct((max(ns, 1), SPHD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(m, 1), MATD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(nl, 1), LIGHTD_COLS),
                                        jnp.float32)],
        scratch_shapes=[res_scr] * (2 + nl + (6 if share_ov else 0)),
        interpret=interpret,
        compiler_params=None if interpret else kernel_compiler_params(),
    )(packed["sph"], packed["tri"], packed["mat"], packed["light"],
      packed["misc"], sphd, matd, lightd, vx, vy, vz, gr, gg, gb)

    return dict(sph_center=dsph[:ns, 0:3], sph_radius=dsph[:ns, 3],
                mat_ambient=dmat[:m, 0:3], mat_diffuse=dmat[:m, 3:6],
                mat_specular=dmat[:m, 6:9], light_pos=dlight[:nl, 0:3])


def _pad_tile3(x, h, w, block_h, block_w, fill):
    """[K,H,W] -> [K, padded H, padded W] with a chosen fill value."""
    ph = (-h) % block_h
    pw = (-w) % block_w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)), constant_values=fill)
    return x


def fit_grads_pallas(scene: FlatScene, camera: Camera, config: RenderConfig,
                     residuals: Dict[str, Any], g,
                     block_h: int = None, block_w: int = None,
                     interpret: Optional[bool] = None,
                     pts: Optional[Any] = None) -> Dict[str, Any]:
    """Run the backward kernel; returns gradient tables for the *compacted*
    scene: dict(sph_center [ns,3], sph_radius [ns], light_pos [nl,3],
    mat_ambient/diffuse/specular [m,3]).

    ``pts``: optional pre-computed screen points [H*W, 3] — must match the
    points the residual forward used (sharded row-band callers)."""
    if not scene.chain_exact:
        raise ValueError(
            "the fused in-kernel adjoint replays the bounce *chain*; "
            "fractional-transparency scenes take the XLA tree replay "
            "(kernels/adjoint.py::l2_loss_pallas)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scene = compact_scene(scene)
    from .render_pallas import _resolve_blocks
    block_h, block_w = _resolve_blocks(scene, block_h, block_w)
    ns, nt = scene.num_spheres, scene.num_triangles
    m, nl = scene.num_materials, scene.num_lights
    w, h = config.width, config.height
    depth = config.max_depth

    packed = pack_scene(scene)
    packed["misc"] = packed["misc"].at[0:3].set(
        camera.eye.astype(jnp.float32))
    sphd, matd, lightd = _pack_diff_tables(scene)

    if pts is None:
        pts = screen_points(camera, w, h)
    _, v = primary_rays(camera, pts)
    vx = _pad_img(v[:, 0], h, w, block_h, block_w)
    vy = _pad_img(v[:, 1], h, w, block_h, block_w)
    vz = _pad_img(v[:, 2], h, w, block_h, block_w)
    ph, pw = vx.shape

    bi = _pad_tile3(residuals["bi"], h, w, block_h, block_w, -1.0)
    mid = _pad_tile3(residuals["mid"], h, w, block_h, block_w, 0.0)
    lit = residuals["lit"].reshape(nl * (depth + 1), h, w)
    lit = _pad_tile3(lit, h, w, block_h, block_w, 0.0)

    g = jnp.asarray(g, jnp.float32)
    gr = _pad_img(g[..., 0].reshape(-1), h, w, block_h, block_w)
    gg = _pad_img(g[..., 1].reshape(-1), h, w, block_h, block_w)
    gb = _pad_img(g[..., 2].reshape(-1), h, w, block_h, block_w)

    # nt must be the *packed* triangle row count — the forward kernel offsets
    # sphere ids by it when emitting the bi residual.
    kernel = functools.partial(_bwd_tile_kernel, ns=ns,
                               nt=packed["tri"].shape[0], m=m, nl=nl,
                               depth=depth,
                               atten=config.attenuation_factor,
                               want_trans=bool(scene.has_transmission),
                               fast_recip=not interpret)
    grid = (ph // block_h, pw // block_w)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    res_tile = pl.BlockSpec((depth + 1, block_h, block_w),
                            lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    lit_tile = pl.BlockSpec((max(nl, 1) * (depth + 1), block_h, block_w),
                            lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((max(ns, 1), SPHD_COLS), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    acc_m = pl.BlockSpec((max(m, 1), MATD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    acc_l = pl.BlockSpec((max(nl, 1), LIGHTD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    if nl == 0:
        lit = jnp.zeros((depth + 1, ph, pw), jnp.float32)

    dsph, dmat, dlight = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 5 + [vfull] * 3 + [tile] * 3
                 + [res_tile] * 2 + [lit_tile] + [tile] * 3,
        out_specs=[acc, acc_m, acc_l],
        out_shape=[jax.ShapeDtypeStruct((max(ns, 1), SPHD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(m, 1), MATD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(nl, 1), LIGHTD_COLS),
                                        jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else kernel_compiler_params(),
    )(packed["sph"], packed["tri"], packed["mat"], packed["light"],
      packed["misc"], sphd, matd, lightd, vx, vy, vz, bi, mid, lit,
      gr, gg, gb)

    return dict(sph_center=dsph[:ns, 0:3], sph_radius=dsph[:ns, 3],
                mat_ambient=dmat[:m, 0:3], mat_diffuse=dmat[:m, 3:6],
                mat_specular=dmat[:m, 6:9], light_pos=dlight[:nl, 0:3])


def prepare_fit_inputs(camera: Camera, config: RenderConfig, target,
                       mask: Optional[Any] = None,
                       block_h: int = 8, block_w: int = 512,
                       pts: Optional[Any] = None) -> Dict[str, Any]:
    """Precompute the padded per-pixel input planes of the fused fwd+bwd
    kernel: primary-ray directions, target RGB and the pixel mask —
    everything that depends only on (camera, config, target), NOT on the
    fit parameters.

    ``block_h``/``block_w`` must equal the block the kernel call will
    resolve (for large scenes the fused kernel's default is NOT 8×512 —
    resolve via ``render_pallas.py::default_blocks`` first, or use
    ``diff/fit.py::make_fit_step_pallas``, which does).

    In a fit loop these are step-invariant, but XLA does not hoist them out
    of a ``lax.scan``/training-loop body: recomputing them per step costs
    ~10 full-image elementwise ops plus 7 pad copies of HBM traffic
    (~0.1 ms at 1024², ~3% of the fused step).  Call this once and pass the
    result as ``prep=`` to ``fused_loss_grads_pallas`` /
    ``fit_value_and_grad`` — the per-step work is then only the tiny
    parameter-table packing plus the kernel itself."""
    w, h = config.width, config.height
    target0, mask0, pts0 = target, mask, pts   # as-passed, for provenance
    if pts is None:
        pts = screen_points(camera, w, h)
    _, v = primary_rays(camera, pts)
    vx = _pad_img(v[:, 0], h, w, block_h, block_w)
    vy = _pad_img(v[:, 1], h, w, block_h, block_w)
    vz = _pad_img(v[:, 2], h, w, block_h, block_w)
    target = jnp.asarray(target, jnp.float32)
    tr = _pad_img(target[..., 0].reshape(-1), h, w, block_h, block_w)
    tg = _pad_img(target[..., 1].reshape(-1), h, w, block_h, block_w)
    tb = _pad_img(target[..., 2].reshape(-1), h, w, block_h, block_w)
    if mask is None:
        mask = jnp.ones((h, w), jnp.float32)
    mask = _pad_img(jnp.asarray(mask, jnp.float32).reshape(-1),
                    h, w, block_h, block_w)
    # provenance: the exact objects this prep was built from, so a caller
    # passing a DIFFERENT target/mask alongside a stale prep gets an error
    # instead of silently computing loss/grads against the old target
    # (the strong refs also pin the ids against reuse).  Caveat: traced
    # values can't be identity-checked and skip the check — see
    # _check_prep's LIMITATION note
    return dict(vx=vx, vy=vy, vz=vz, tr=tr, tg=tg, tb=tb, mask=mask,
                block=(block_h, block_w),
                src=dict(target=target0, mask=mask0, pts=pts0))


def _check_prep(prep, target, mask, pts, block_h, block_w):
    """Raise if ``prep`` disagrees with the call it's used in: block shape,
    or a target/mask/pts object DIFFERENT from the one the prep was built
    from (identity check — rebuild the prep, or pass None, when the target
    changes; values can't be compared under tracing).

    LIMITATION: a TRACED target/mask/pts cannot be identity-checked, so it
    is skipped (not errored — jitting a step with the target as a jit
    argument alongside a matching prep is legitimate, ADVICE r4).  The
    flip side: if such a caller then feeds a DIFFERENT target array at
    call time, the kernel still uses the prep's baked planes with no
    error.  When the target varies across calls, don't bake it: build the
    prep without it, or rebuild the prep per target."""
    if prep["block"] != (block_h, block_w):
        raise ValueError(f"prep was built for block {prep['block']}, "
                         f"called with ({block_h}, {block_w})")
    src = prep.get("src")
    if src is None:   # prep built by an older caller: only block checked
        return
    for name, got in (("target", target), ("mask", mask), ("pts", pts)):
        # a traced value can't be identity-compared to the concrete object
        # the prep was built from — a caller jitting its own step with
        # target as an argument is fine (the prep's planes are used, the
        # tracer ignored), so skip rather than error at trace time
        if isinstance(got, jax.core.Tracer):
            continue
        if got is not None and src[name] is not got:
            raise ValueError(
                f"prep= was built from a different `{name}` object than "
                f"this call passes; prepare_fit_inputs() again for the new "
                f"{name} (or pass {name}=None to use the prep's planes)")


def fused_loss_grads_pallas(scene: FlatScene, camera: Camera,
                            config: RenderConfig, target,
                            mask: Optional[Any] = None,
                            denom: Optional[float] = None,
                            block_h: int = None, block_w: int = None,
                            interpret: Optional[bool] = None,
                            pts: Optional[Any] = None,
                            prep: Optional[Dict[str, Any]] = None):
    """Single-kernel fwd+bwd (one dispatch, residuals never touch HBM):
    returns ``(sq_err_sum, grads_c)`` where ``sq_err_sum`` is the
    mask-weighted squared-error sum ``sum(mask * (img - target)^2)``
    (callers divide by the pixel count / psum it) and ``grads_c`` the
    compacted-scene gradient tables, identical in layout to
    ``fit_grads_pallas``'s result.

    ``mask``: optional [H, W] weight plane (1 = real pixel); sharded
    row-band callers pass ``jj < H_image`` to zero mesh-padding rows.
    Fractional weights are supported (mask is applied once, to both the
    loss and the cotangent).
    ``denom``: the loss normalizer (default ``H*W*3``) — the cotangent is
    ``(2/denom) * mask * (img - target)``.

    Fractional-transparency scenes (not chain-exact) route automatically to
    the bounce-tree variant: tree forward + in-kernel tree adjoint, with
    2^(depth+1)-1 preorder-node residual planes in VMEM scratch (cost grows
    as 2^depth, like the tree forward itself).

    Numerical note: the scalar loss accumulates tile-by-tile into one f32
    VMEM cell across the sequential grid; at very large grids (4096^2 ->
    thousands of tiles) this sequential f32 sum can drift a few ulps from
    the XLA tree reduction of the two-phase path.  Gradients are unaffected
    (per-entity table sums), and Adam only consumes the gradients."""
    from .render_pallas import n_tree_nodes
    tree = not scene.chain_exact
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scene = compact_scene(scene)
    from .render_pallas import _resolve_blocks
    if prep is not None and block_h is None and block_w is None:
        block_h, block_w = prep["block"]
    block_h, block_w = _resolve_blocks(scene, block_h, block_w,
                                       phase="fused")
    ns, m, nl = scene.num_spheres, scene.num_materials, scene.num_lights
    w, h = config.width, config.height
    depth = config.max_depth
    levels = n_tree_nodes(depth) if tree else depth + 1
    if denom is None:
        denom = float(h * w * 3)

    packed = pack_scene(scene)
    packed["misc"] = packed["misc"].at[0:3].set(
        camera.eye.astype(jnp.float32))
    sphd, matd, lightd = _pack_diff_tables(scene)

    if prep is None:
        prep = prepare_fit_inputs(camera, config, target, mask=mask,
                                  block_h=block_h, block_w=block_w, pts=pts)
    else:
        _check_prep(prep, target, mask, pts, block_h, block_w)
    vx, vy, vz = prep["vx"], prep["vy"], prep["vz"]
    tr, tg, tb, mask = prep["tr"], prep["tg"], prep["tb"], prep["mask"]
    ph, pw = vx.shape

    # chain scenes: the forward CAN record each level's input ray into 6
    # extra scratch planes so the adjoint skips its primal phase
    # (RTFS_FWD_OV=1).  Measured SLOWER on v5e (the scratch write+read
    # round-trip costs more than the recomputed primal: 3.20 -> 3.45 ms at
    # 1024^2 d3, scripts notes in PERF.md), so default OFF; kept as the
    # A/B knob documenting the negative result.
    share_ov = (not tree
                and os.environ.get("RTFS_FWD_OV", "0") == "1")
    kernel = functools.partial(
        _fused_fwd_bwd_kernel, ns=ns, nt=packed["tri"].shape[0], m=m, nl=nl,
        depth=depth, small=config.small_number,
        atten=config.attenuation_factor,
        white_id=scene.checker_mats[0], black_id=scene.checker_mats[1],
        want_trans=bool(scene.has_transmission), fast_recip=not interpret,
        g_scale=2.0 / denom, tree=tree, share_ov=share_ov,
        bf16_shading=config.bf16_shading)
    grid = (ph // block_h, pw // block_w)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    acc1 = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((max(ns, 1), SPHD_COLS), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    acc_m = pl.BlockSpec((max(m, 1), MATD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    acc_l = pl.BlockSpec((max(nl, 1), LIGHTD_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    res_scr = pltpu.VMEM((levels, block_h, block_w), jnp.float32)

    loss_sum, dsph, dmat, dlight = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 5 + [vfull] * 3 + [tile] * 7,
        out_specs=[acc1, acc, acc_m, acc_l],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((max(ns, 1), SPHD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(m, 1), MATD_COLS), jnp.float32),
                   jax.ShapeDtypeStruct((max(nl, 1), LIGHTD_COLS),
                                        jnp.float32)],
        scratch_shapes=[res_scr] * (2 + nl + (6 if share_ov else 0)),
        interpret=interpret,
        compiler_params=None if interpret else kernel_compiler_params(),
    )(packed["sph"], packed["tri"], packed["mat"], packed["light"],
      packed["misc"], sphd, matd, lightd, vx, vy, vz, tr, tg, tb, mask)

    grads_c = dict(sph_center=dsph[:ns, 0:3], sph_radius=dsph[:ns, 3],
                   mat_ambient=dmat[:m, 0:3], mat_diffuse=dmat[:m, 3:6],
                   mat_specular=dmat[:m, 6:9], light_pos=dlight[:nl, 0:3])
    return loss_sum[0, 0], grads_c


def _sphere_take(scene: FlatScene):
    """Indices of compacted sphere rows in the original arrays (None when the
    masks are traced and no compaction happened)."""
    try:
        sv = np.asarray(scene.sph_valid)
        tv = np.asarray(scene.tri_valid)
    except Exception:
        return None
    if sv.all() and tv.all():
        return None
    return np.nonzero(sv)[0]


def grads_to_fitparams(params: FitParams, scene_full: FlatScene,
                       grads_c: Dict[str, Any]) -> FitParams:
    """Scatter compacted-scene gradient tables back onto the (possibly
    padded) ``FitParams`` leaves."""
    take = _sphere_take(scene_full)
    if take is None:
        d_center = grads_c["sph_center"]
        d_radius = grads_c["sph_radius"]
    else:
        d_center = jnp.zeros_like(params.sph_center).at[take].set(
            grads_c["sph_center"])
        d_radius = jnp.zeros_like(params.sph_radius).at[take].set(
            grads_c["sph_radius"])
    return FitParams(sph_center=d_center, sph_radius=d_radius,
                     light_pos=grads_c["light_pos"],
                     mat_diffuse=grads_c["mat_diffuse"],
                     mat_specular=grads_c["mat_specular"],
                     mat_ambient=grads_c["mat_ambient"])


def fit_value_and_grad(params: FitParams, scene: FlatScene, camera: Camera,
                       config: RenderConfig, target,
                       block_h: int = None, block_w: int = None,
                       interpret: Optional[bool] = None, key=None,
                       single_kernel: bool = True,
                       prep: Optional[Dict[str, Any]] = None,
                       mode: Optional[str] = None):
    """(loss, d loss/d params) of the L2 photometric loss with the Pallas
    forward and the fused in-kernel backward — the fast path for the
    BASELINE config-4 fit and the fwd+bwd benchmark.

    ``mode`` selects the kernel shape for chain-exact single-sample scenes:
      * ``"twophase"`` (default) — packed-residual forward kernel + backward
        kernel with in-kernel cotangent/loss prologue
        (``twophase_loss_grads_pallas``).  Fastest measured: the adjoint
        escapes the fused program's Mosaic scheduling penalty (PERF.md §2).
      * ``"fused"`` — single-dispatch fwd+loss+adjoint, residuals in VMEM
        scratch (``fused_loss_grads_pallas``).
      * ``"split"`` — residual forward + XLA cotangent + backward kernel
        (the round-3 shape; equals ``single_kernel=False``).
    ``None`` reads env ``RTFS_FIT_MODE`` (default "twophase"); the legacy
    ``single_kernel=False`` maps to "split".  All three are semantically
    identical (same topology convention, f32-reassociation-level parity).
    Fractional-transparency (tree) scenes always use the fused tree kernel.

    Supersampled targets (``config.samples > 1`` / ``force_jitter``) are
    supported: the rendered image is the mean of S jittered single-sample
    kernel renders (same PRNG stream as the core renderer, so targets
    rendered by either forward match); the backward then runs one
    recompute-adjoint dispatch per sample (``recompute_grads_pallas``:
    the forward chain is re-traced into VMEM scratch inside the backward
    kernel, so no residual plane ever touches HBM — round 2 materialized
    all S residual sets, ~S x (2+nl) x (depth+1) full-image planes) with
    cotangent g/S, summing the gradient tables.  ``config.adaptive`` is
    supported the same way: the per-sample acceptance masks and the
    early-exit divisor are recorded by the forward scan as fixed-topology
    residuals (discrete outcomes, like hit ids), and each sample's
    cotangent is weighted by accept_k / divisor.

    Equivalent to ``jax.value_and_grad(l2_loss_pallas)`` (kernels/adjoint.py)
    restricted to the ``FitParams`` leaves; scene/camera are constants."""
    import dataclasses

    from ..ops.rays import sample_jitter

    scene_full = params.into_scene(scene)
    if mode is None:
        mode = ("split" if not single_kernel
                else os.environ.get("RTFS_FIT_MODE", "twophase"))
    if mode not in ("twophase", "fused", "split"):
        raise ValueError(f"unknown fit mode {mode!r}")
    use_jitter = config.samples > 1 or config.force_jitter
    if prep is not None and (use_jitter
                             or (mode == "split"
                                 and scene_full.chain_exact)):
        raise ValueError("prep= is only supported on the twophase/fused "
                         "paths (no supersampling)")
    if not use_jitter:
        denom = float(config.height * config.width * 3)
        if not scene_full.chain_exact:
            mode = "fused"   # tree scenes: in-kernel bounce-tree fwd+adjoint
        if mode in ("twophase", "fused"):
            # twophase: packed-residual forward kernel + backward kernel
            # with in-kernel cotangent prologue; fused: one dispatch with
            # residual planes in VMEM scratch.  Identical semantics.
            impl = (twophase_loss_grads_pallas if mode == "twophase"
                    else fused_loss_grads_pallas)
            sq_sum, grads_c = impl(
                scene_full, camera, config, target, denom=denom,
                block_h=block_h, block_w=block_w, interpret=interpret,
                prep=prep)
            return sq_sum / denom, grads_to_fitparams(params, scene_full,
                                                      grads_c)
        img, res = render_forward_with_residuals(
            scene_full, camera, config, block_h=block_h, block_w=block_w,
            interpret=interpret)
        diff = img - target
        loss = jnp.mean(diff * diff)
        g = (2.0 / denom) * diff
        grads_c = fit_grads_pallas(scene_full, camera, config, res, g,
                                   block_h=block_h, block_w=block_w,
                                   interpret=interpret)
        return loss, grads_to_fitparams(params, scene_full, grads_c)

    S = config.samples
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    keys = jax.random.split(key, S)
    cfg1 = dataclasses.replace(config, samples=1, force_jitter=False)
    pts0 = screen_points(camera, config.width, config.height)
    h, w = config.height, config.width

    from .render_pallas import render_image_pallas

    if config.adaptive:
        # Fixed-topology adjoint of the adaptive supersampler
        # (MySdlApplication.cpp:1294-1311 emulation): the per-sample
        # acceptance masks and the early-exit divisor are DISCRETE
        # outcomes, exactly like hit ids and lit flags — record them in
        # the forward scan, then weight each sample's cotangent by
        # accept_k / divisor in the backward.  This matches jax.grad of
        # the core emulation (the convergence test and divisor carry no
        # continuous dependence on the parameters), unlocking gradients
        # for the reference's default render mode on the kernel path.
        small = config.small_number

        def fwd_body_ad(carry, inp):
            accum, divisor, done = carry
            k, key_k = inp
            jit = sample_jitter(key_k, pts0.shape[0], config.jitter_scale,
                                dtype=pts0.dtype)
            img_s = render_image_pallas(scene_full, camera, cfg1,
                                        block_h=block_h, block_w=block_w,
                                        interpret=interpret, pts=pts0 + jit)
            accept = jnp.logical_not(done)
            accum_after = jnp.where(done[..., None], accum, accum + img_s)
            d = k * accum_after - (k + 1.0) * accum
            dnorm = jnp.sqrt(jnp.sum(d * d, -1))
            newly = jnp.logical_and(accept, dnorm < small * k * (k + 1.0))
            divisor = jnp.where(newly, k, divisor)
            done = jnp.logical_or(done, newly)
            return (accum_after, divisor, done), accept

        ks = jnp.arange(S, dtype=jnp.float32)
        init = (jnp.zeros((h, w, 3), jnp.float32),
                jnp.full((h, w), float(S), jnp.float32),
                jnp.zeros((h, w), bool))
        (accum, divisor, _), accepts = jax.lax.scan(fwd_body_ad, init,
                                                    (ks, keys))
        img = accum / divisor[..., None]
        diff = img - target
        loss = jnp.mean(diff * diff)
        g = (2.0 / diff.size) * diff

        def bwd_body_ad(carry, inp):
            key_k, accept = inp
            jit = sample_jitter(key_k, pts0.shape[0], config.jitter_scale,
                                dtype=pts0.dtype)
            wk = jnp.where(accept, 1.0, 0.0) / divisor
            grads_s = recompute_grads_pallas(
                scene_full, camera, cfg1, g * wk[..., None],
                block_h=block_h, block_w=block_w,
                interpret=interpret, pts=pts0 + jit)
            return jax.tree_util.tree_map(jnp.add, carry, grads_s), None

        bwd_body, bwd_xs = bwd_body_ad, (keys, accepts)
    else:
        def fwd_body(carry, k):
            jit = sample_jitter(k, pts0.shape[0], config.jitter_scale,
                                dtype=pts0.dtype)
            img_s = render_image_pallas(scene_full, camera, cfg1,
                                        block_h=block_h, block_w=block_w,
                                        interpret=interpret, pts=pts0 + jit)
            return carry + img_s, None

        img_sum, _ = jax.lax.scan(
            fwd_body, jnp.zeros((h, w, 3), jnp.float32), keys)
        img = img_sum / S
        diff = img - target
        loss = jnp.mean(diff * diff)
        g = (2.0 / (diff.size * S)) * diff

        def bwd_body(carry, k):
            jit = sample_jitter(k, pts0.shape[0], config.jitter_scale,
                                dtype=pts0.dtype)
            grads_s = recompute_grads_pallas(scene_full, camera, cfg1, g,
                                             block_h=block_h,
                                             block_w=block_w,
                                             interpret=interpret,
                                             pts=pts0 + jit)
            return jax.tree_util.tree_map(jnp.add, carry, grads_s), None

        bwd_xs = keys

    sc = compact_scene(scene_full)
    ns_c, m_c, nl_c = sc.num_spheres, sc.num_materials, sc.num_lights
    zeros = dict(sph_center=jnp.zeros((ns_c, 3), jnp.float32),
                 sph_radius=jnp.zeros((ns_c,), jnp.float32),
                 mat_ambient=jnp.zeros((m_c, 3), jnp.float32),
                 mat_diffuse=jnp.zeros((m_c, 3), jnp.float32),
                 mat_specular=jnp.zeros((m_c, 3), jnp.float32),
                 light_pos=jnp.zeros((nl_c, 3), jnp.float32))
    grads_c, _ = jax.lax.scan(bwd_body, zeros, bwd_xs)
    return loss, grads_to_fitparams(params, scene_full, grads_c)
