"""Gradient-safe math helpers.

The renderer is differentiated with fixed hit topology (SURVEY.md section 7,
"Hard parts": discontinuities at hit/miss boundaries carry no gradient).  Every
``sqrt``/division whose operand can be invalid on the *masked-out* branch uses
the double-``where`` trick so that ``jax.grad`` never sees NaN from the dead
branch.
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x, valid=None):
    """sqrt(x) where ``x`` may be negative on masked-out lanes.

    Returns sqrt(max(x,0)) computed as sqrt(where(valid, x, 1)) so the
    gradient of the dead branch is exactly zero rather than NaN.
    """
    if valid is None:
        valid = x > 0.0
    x_safe = jnp.where(valid, x, 1.0)
    return jnp.where(valid, jnp.sqrt(x_safe), 0.0)


def safe_div(num, den, valid=None, eps=0.0):
    """num/den with the dead branch neutralised for autodiff."""
    if valid is None:
        valid = jnp.abs(den) > eps
    den_safe = jnp.where(valid, den, 1.0)
    return jnp.where(valid, num / den_safe, 0.0)


def dot3(a, b, axis=-1):
    return jnp.sum(a * b, axis=axis)


def norm3(v, axis=-1):
    """|v| with a zero (not inf/NaN) gradient at v == 0."""
    sq = dot3(v, v, axis=axis)
    return safe_sqrt(sq, sq > 0.0)


def safe_normalize(v, axis=-1):
    """v/|v|, returning 0 for zero vectors, grad-safe."""
    sq = dot3(v, v, axis=axis)
    valid = sq > 0.0
    sq_safe = jnp.where(valid, sq, 1.0)
    inv = jnp.where(valid, 1.0 / jnp.sqrt(sq_safe), 0.0)
    return v * jnp.expand_dims(inv, axis)


def cross3(a, b):
    return jnp.cross(a, b)
