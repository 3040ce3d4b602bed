"""Materials: scalar description + structure-of-arrays batch.

Mirrors the reference Material (Shape.h:13-19): albedo `color`,
`shininess=128`, `specular=0`, `transparency=0`, `refractive_index=1`.
The SoA form is what the renderer consumes — one field array per property,
gathered per-hit by global primitive id.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Material:
    """Host-side scalar material (scene-building convenience)."""

    color: tuple[float, float, float] = (0.0, 0.0, 0.0)
    shininess: float = 128.0
    specular: float = 0.0
    transparency: float = 0.0
    refractive_index: float = 1.0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["color", "shininess", "specular", "transparency", "refractive_index"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Materials:
    """SoA materials for N primitives."""

    color: jnp.ndarray  # [N, 3]
    shininess: jnp.ndarray  # [N]
    specular: jnp.ndarray  # [N]
    transparency: jnp.ndarray  # [N]
    refractive_index: jnp.ndarray  # [N]

    @staticmethod
    def empty(dtype=jnp.float32) -> "Materials":
        return Materials.stack([], dtype=dtype)

    @staticmethod
    def stack(mats: list[Material], dtype=jnp.float32) -> "Materials":
        n = len(mats)
        return Materials(
            color=jnp.asarray([m.color for m in mats], dtype=dtype).reshape(n, 3),
            shininess=jnp.asarray([m.shininess for m in mats], dtype=dtype),
            specular=jnp.asarray([m.specular for m in mats], dtype=dtype),
            transparency=jnp.asarray([m.transparency for m in mats], dtype=dtype),
            refractive_index=jnp.asarray(
                [m.refractive_index for m in mats], dtype=dtype
            ),
        )

    @staticmethod
    def concat(parts: list["Materials"]) -> "Materials":
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    def __len__(self) -> int:
        return self.shininess.shape[0]
