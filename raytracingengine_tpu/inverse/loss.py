"""Losses for inverse rendering (pixel-space L2 per BASELINE config #4)."""

from __future__ import annotations

import jax.numpy as jnp


def l2_image_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((img - target) ** 2)


def l1_image_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(img - target))
