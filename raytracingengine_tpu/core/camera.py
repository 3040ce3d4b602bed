"""Pinhole camera and batched primary-ray generation.

Re-derivation of the reference camera (Math.h:85-122):

  * screen coords: ``sx = x - width/2``, ``sy = height/2 - y`` (Y flipped),
  * screen point: ``(sx, sy, position.z + focal)`` — focal length is in
    *pixels*,
  * ray direction: ``normalize(screen_point - position)`` — note this
    subtracts the full camera position, so the x/y components are
    ``sx - position.x`` / ``sy - position.y``,
  * optional anti-aliasing jitter: uniform in [0, 1) pixel added to both
    sx and sy (Math.h:103-116 — `invAA = 1.0/double(bool)` is always 1.0),
  * sample 0 of the AA loop is always unjittered (Scene.h:289-296).

The reference generates one ray at a time per OpenMP thread; here we
generate whole pixel blocks at once as [N, 3] arrays so that ray
generation fuses into the downstream intersection matmuls.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["position", "focal", "near", "far"],
    meta_fields=["width", "height", "spp"],
)
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera. `width`/`height`/`spp` are static (trace-time) config;
    `position`/`focal`/`near`/`far` are differentiable leaves.

    Defaults mirror the reference ctor (Math.h:96-97) except `spp`, which
    mirrors `antiAliasingAmount = 32` (Math.h:94).
    """

    position: jnp.ndarray  # [3]
    focal: jnp.ndarray  # scalar, in pixels
    near: jnp.ndarray  # scalar
    far: jnp.ndarray  # scalar
    width: int = 800
    height: int = 600
    spp: int = 32

    @staticmethod
    def create(
        position,
        focal: float = 1.0,
        width: int = 800,
        height: int = 600,
        near: float = 1.0,
        far: float = 1000.0,
        spp: int = 32,
        dtype=jnp.float32,
    ) -> "Camera":
        return Camera(
            position=jnp.asarray(position, dtype=dtype),
            focal=jnp.asarray(focal, dtype=dtype),
            near=jnp.asarray(near, dtype=dtype),
            far=jnp.asarray(far, dtype=dtype),
            width=int(width),
            height=int(height),
            spp=int(spp),
        )

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def rays_for_pixels(
        self,
        px: jnp.ndarray,
        py: jnp.ndarray,
        jitter: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Rays for integer pixel coords px/py [N] -> (origins [N,3], dirs [N,3]).

        `jitter` is an optional [N, 2] array of uniform [0,1) offsets
        (jx, jy); None means the deterministic sample-0 center ray.
        """
        dtype = self.position.dtype
        sx = px.astype(dtype) - self.width / 2.0
        sy = self.height / 2.0 - py.astype(dtype)
        if jitter is not None:
            sx = sx + jitter[..., 0]
            sy = sy + jitter[..., 1]
        # screen point (sx, sy, pos.z + focal); dir = normalize(screen - pos)
        dx = sx - self.position[0]
        dy = sy - self.position[1]
        dz = jnp.broadcast_to(self.focal, sx.shape)
        d = jnp.stack([dx, dy, dz], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(self.position, d.shape)
        return o, d

    def pixel_grid(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Flat pixel index -> (px, py) [H*W] in the reference's row-major
        order (Scene.h:321-323: x = idx % width, y = idx / width)."""
        idx = jnp.arange(self.num_pixels, dtype=jnp.int32)
        return idx % self.width, idx // self.width
