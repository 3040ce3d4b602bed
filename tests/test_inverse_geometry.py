"""Geometry/lighting recovery by gradient descent (BASELINE config #4).

Light position has smooth, well-posed pixel gradients (validated against
finite differences in test_grad_fd.py) and recovers cleanly. Sphere
center/radius recovery from *silhouette* mismatch requires soft primary
visibility (edge-aware rendering), which hard closest-hit does not
provide — interior shading gradients alone are not a descent direction
for silhouette loss. That is intentionally out of scope for the hard
renderer; the FD suite proves the interior gradients themselves correct.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax

from raytracingengine_tpu.inverse import fit, masked_optimizer, partition
from raytracingengine_tpu.inverse.params import select
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.pipeline import render_hdr
from raytracingengine_tpu.scenes.builders import baseline_sphere_scene


def test_recover_light_position():
    scene_true, camera = baseline_sphere_scene(width=24, height=24, spp=1)
    cfg = RenderConfig(chunk_size=24 * 24, shadow_mode="binary")
    target = render_hdr(scene_true, camera, cfg)

    lights = scene_true.lights
    scene0 = dataclasses.replace(
        scene_true,
        lights=dataclasses.replace(
            lights, positions=lights.positions.at[0].add(
                jnp.asarray([1.5, -1.0, 0.5], lights.positions.dtype)
            )
        ),
    )
    loss0 = float(jnp.mean((render_hdr(scene0, camera, cfg) - target) ** 2))

    params0, _ = partition(scene0)
    mask = select(params0, ["lights.positions"])
    opt = masked_optimizer(optax.adam(0.1), mask)
    fitted, losses = fit(scene0, camera, cfg, target, steps=150, optimizer=opt)

    assert losses[-1] < loss0 * 0.05, f"{loss0} -> {losses[-1]}"
    err = np.linalg.norm(
        np.asarray(fitted.lights.positions[0] - scene_true.lights.positions[0])
    )
    start_err = np.linalg.norm([1.5, -1.0, 0.5])
    assert err < start_err * 0.35, f"light pos err {err} (start {start_err})"


def test_radius_gradient_is_finite_and_nonzero():
    """The machinery check: interior radius gradients exist and are finite
    (their sufficiency for silhouette recovery is a separate problem)."""
    import jax

    scene, camera = baseline_sphere_scene(width=16, height=16, spp=1)
    cfg = RenderConfig(chunk_size=256, shadow_mode="binary")
    target = render_hdr(scene, camera, cfg) * 0.9

    def loss_of_r(dr):
        sph = scene.spheres
        s = dataclasses.replace(
            scene, spheres=dataclasses.replace(sph, radii=sph.radii.at[0].add(dr))
        )
        return jnp.mean((render_hdr(s, camera, cfg) - target) ** 2)

    g = jax.grad(loss_of_r)(jnp.float32(0.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
