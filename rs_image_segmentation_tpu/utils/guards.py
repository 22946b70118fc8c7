"""Numerical guards: structured NaN/Inf detection for jitted stage graphs.

The reference sprinkles ad-hoc ``np.nan_to_num`` calls (extract.py:355,551,
712 etc.); here the sanitization is explicit (`sanitize`) and debugging is
systematic: `checked` wraps a function with jax.experimental.checkify so
NaN/Inf production inside jit raises with a location instead of silently
propagating.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def sanitize(x: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    """NaN -> value, +/-Inf -> finite max/min (jnp.nan_to_num semantics)."""
    return jnp.nan_to_num(x, nan=value)


def assert_finite(x: jnp.ndarray, name: str = "array") -> jnp.ndarray:
    """checkify assertion that all elements are finite; returns x."""
    checkify.check(jnp.isfinite(x).all(), f"{name} contains NaN/Inf")
    return x


def checked(fn: Callable, *static_argnames: str) -> Callable:
    """Wrap ``fn`` so checkify errors (incl. float_checks for NaN produced
    anywhere inside) raise on call. Use for debugging stage graphs:

        stack = checked(hierarchical_stack)(bands)
    """
    errs = checkify.float_checks | checkify.user_checks

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checkify.checkify(fn, errors=errs)(*args, **kwargs)
        err.throw()
        return out

    return wrapper
