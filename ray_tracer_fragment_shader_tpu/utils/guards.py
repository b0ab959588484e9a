"""Numerical guards — the JAX-land equivalent of sanitizers (SURVEY.md
section 5, "Race detection / sanitizers"): checkify-based NaN/inf checking
for the render path, used in tests and debugging."""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_render(render_fn: Callable, *args, **kwargs):
    """Run a renderer under checkify float checks; raises on NaN/inf in any
    checked op.  Returns the rendered output."""
    checked = checkify.checkify(
        lambda *a: render_fn(*a, **kwargs), errors=checkify.float_checks)
    err, out = checked(*args)
    err.throw()
    return out


def assert_finite(tree, name: str = "output") -> None:
    """Host-side finiteness assertion over a pytree."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
