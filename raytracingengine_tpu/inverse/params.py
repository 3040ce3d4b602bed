"""Parameter partitioning for inverse rendering.

The Scene pytree mixes differentiable float leaves (centers, radii,
albedos, light positions/intensities, ...) with non-differentiable
bool/int leaves (active masks, group ids). `partition` splits the scene
into a float-only parameter tree (None elsewhere) and its static
complement; `combine` merges them back. This is the standard
partition/combine pattern, letting optax treat the scene itself as the
trainable parameter set (BASELINE config #4: recover sphere
centers/radii, albedo, light position/intensity by gradient descent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _is_float_leaf(x) -> bool:
    return np.issubdtype(np.asarray(x).dtype, np.floating)


def partition(scene):
    """-> (params, static): same treedef, leaves split by dtype."""
    params = jax.tree.map(lambda x: x if _is_float_leaf(x) else None, scene)
    static = jax.tree.map(lambda x: None if _is_float_leaf(x) else x, scene)
    return params, static


def combine(params, static):
    """Inverse of `partition`."""
    return jax.tree.map(
        lambda p, s: s if p is None else p,
        params,
        static,
        is_leaf=lambda x: x is None,
    )


def select(params, keep: list[str]):
    """Zero-mask a parameter tree to the named top-level fields.

    `keep` entries are attribute paths like 'spheres.centers' or
    'lights.positions'. Leaves not selected become zeros in gradient
    space when used with optax's masked transforms — here we return a
    mask tree (True where trainable) for optax.masked.
    """

    def mask_for(path, leaf):
        name = jax.tree_util.keystr(path)
        return any(k in name for k in keep)

    flat, treedef = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: x is None
    )
    masks = [
        (mask_for(path, leaf) if leaf is not None else None)
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, masks)
