"""In-graph numerical guards (the race-detection/sanitizer analog).

The reference's only safety nets are MSVC SDLCheck and thread-local RNG
(SURVEY.md §5). In JAX, jit purity plus explicit keys removes data races
by construction; what remains is *numerical* corruption. `checked_render`
wraps any render function with jax.experimental.checkify so NaN/Inf
production inside the traced computation is caught and reported with a
location, instead of silently propagating into images or gradients.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap `fn` so it returns (error, result); error.throw() raises with
    the first NaN/Inf/OOB site if any fired."""
    if errors is None:
        errors = checkify.float_checks
    return checkify.checkify(fn, errors=errors)


def assert_finite(tree, name: str = "value") -> None:
    """Host-side finite check over a pytree (post-device, eager)."""
    import numpy as np

    for i, leaf in enumerate(jax.tree.leaves(tree)):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}: leaf {i} has {bad} non-finite values"
            )
