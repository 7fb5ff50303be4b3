"""Numerical sanitizers (SURVEY.md §5: the reference has none; the TPU build
gets jit-level NaN guards and checkify wrappers).

Enable globally with HALLUCIDET_DEBUG_NANS=1 (CLIs call `setup_debug()`), or
wrap individual functions with `checked()` to get location-precise NaN/inf
errors out of compiled code.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
from jax.experimental import checkify


def setup_debug() -> bool:
    """Install global NaN debugging when HALLUCIDET_DEBUG_NANS=1 — every jit
    result is checked and the failing primitive is re-run eagerly."""
    if os.environ.get("HALLUCIDET_DEBUG_NANS", "0") == "1":
        jax.config.update("jax_debug_nans", True)
        return True
    return False


def checked(fn: Callable, *, errors=checkify.float_checks) -> Callable:
    """Wrap a jittable fn with checkify float checks; the wrapper raises with
    the exact failing location instead of silently propagating NaNs."""
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
