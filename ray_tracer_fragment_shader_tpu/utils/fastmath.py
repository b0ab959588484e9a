"""Shared fast-math primitives for the Pallas kernels.

``recip`` is the one guarded reciprocal both the forward and the adjoint
kernels use: on TPU (``fast=True``) it lowers to the hardware approximate
reciprocal plus one Newton step (~1 ulp vs the exact divide, roughly half
the VPU slots of Mosaic's multi-slot f32 divide); in interpreter mode it is
the exact divide so CPU tests are bit-stable.

``COUNT_MODE``: when the roofline op counter (utils/opcount.py) traces a
kernel body outside Pallas, ``pl.reciprocal`` is unavailable and the counter
needs recip sites distinguishable from true divides.  Setting the flag makes
``recip`` emit ``lax.integer_pow(x, -1)`` — numerically the same value,
traced as the distinct ``integer_pow[y=-1]`` primitive the counter classifies
as ``recip_nr``.  Never set outside the counter.
"""
from __future__ import annotations

import jax

COUNT_MODE = [False]


def recip(x, fast: bool):
    """Reciprocal of a pre-guarded nonzero plane."""
    if COUNT_MODE[0]:
        return jax.lax.integer_pow(x, -1)
    if not fast:
        return 1.0 / x
    from jax.experimental import pallas as pl
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)
