"""Soft primary visibility: differentiable sphere silhouettes.

Hard closest-hit gives pixel colors that are piecewise-constant in
geometry across silhouette edges — interior shading gradients exist (and
match finite differences), but the *silhouette mismatch* term of an image
loss has zero gradient, so center/radius recovery stalls (see
tests/test_inverse_geometry.py). This module adds a SoftRas-style edge
relaxation for the primary bounce:

  * per sphere, the ray's signed silhouette clearance
        delta_i = |closest_approach - c_i| - r_i
    is smooth in (c_i, r_i); coverage = sigmoid(-delta_min / sigma),
  * rays that *miss* every primitive but graze a sphere shade a
    "pseudo-hit": the sphere point nearest the ray, with its true normal
    and material,
  * pixel = coverage * shaded + (1 - coverage) * sky, and the reflection
    chain continues from the (pseudo-)hit with weight scaled by coverage.

sigma -> 0 recovers the hard renderer. Secondary bounces stay hard: the
edge term that matters for inverse rendering is the primary silhouette.
Spheres only (the BASELINE config #4 target set); plane/triangle
silhouettes stay hard.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from raytracingengine_tpu.core import vecmath as vm
from raytracingengine_tpu.geometry.intersect import (
    FAMILY_SPHERE,
    FlatScene,
    Hit,
    closest_hit,
)
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.integrator import _chain_scan, _shade_from_hit
from raytracingengine_tpu.render.shading import sky_color


def soft_primary_hit(
    flat: FlatScene, o: jnp.ndarray, d: jnp.ndarray, cfg: RenderConfig
) -> tuple[Hit, jnp.ndarray]:
    """-> (hit-with-pseudo-fill, coverage [R]).

    Where the hard hit exists it is kept (coverage still <1 just inside a
    sphere edge, letting gradients pull the edge). Where every primitive
    misses, the nearest-grazed sphere provides a pseudo-hit so the
    blended color is meaningful on the outside of the edge too.
    """
    hit = closest_hit(flat, o, d)
    r = o.shape[0]
    sigma = cfg.soft_sigma

    if flat.n_spheres == 0:
        return hit, hit.valid.astype(o.dtype)

    # Signed clearance per sphere: [S, R] (rays on lanes).
    oc = flat.sph_centers[:, None, :] - o[None, :, :]  # [S,R,3]
    t_c = jnp.maximum(jnp.sum(oc * d[None, :, :], axis=-1), 0.0)  # [S,R]
    closest = o[None, :, :] + d[None, :, :] * t_c[..., None]  # [S,R,3]
    cc = closest - flat.sph_centers[:, None, :]
    cc2 = jnp.sum(cc * cc, axis=-1)
    dist_c = jnp.sqrt(jnp.maximum(cc2, 1e-20))
    delta = dist_c - flat.sph_radii[:, None]  # [S,R]
    delta = jnp.where(flat.sph_active[:, None], delta, jnp.inf)

    j = jnp.argmin(delta, axis=0)  # nearest sphere per ray
    ar = jnp.arange(r)
    delta_min = delta[j, ar]
    delta_min = jnp.where(jnp.isfinite(delta_min), delta_min, 1e6)

    # Coverage: 1 deep inside the silhouette, 0 far outside. Hard hits of
    # *non-sphere* geometry are fully covered.
    cov_sphere = jax.nn.sigmoid(-delta_min / sigma)
    non_sphere_hit = hit.valid & (hit.family != FAMILY_SPHERE)
    coverage = jnp.where(non_sphere_hit, 1.0, cov_sphere)
    # Rays that hard-hit a sphere well inside also read coverage ~1 from
    # the sigmoid; keep max with the sphere-hit indicator for stability
    # far from edges.
    deep_inside = hit.valid & (hit.family == FAMILY_SPHERE) & (
        delta_min < -2.0 * sigma
    )
    coverage = jnp.where(deep_inside, 1.0, coverage)

    # Pseudo-hit on the nearest sphere surface for rays with no hard hit.
    c_j = flat.sph_centers[j]
    r_j = flat.sph_radii[j]
    n_pseudo = vm.normalize(closest[j, ar] - c_j)
    p_pseudo = c_j + n_pseudo * r_j[:, None]
    t_pseudo = t_c[j, ar]

    use_pseudo = ~hit.valid
    mat_j = j  # sphere block leads the flat material tables

    def fill(field_hit, field_pseudo):
        mask = use_pseudo
        if field_hit.ndim == 2:
            mask = mask[:, None]
        return jnp.where(mask, field_pseudo, field_hit)

    merged = Hit(
        t=fill(hit.t, t_pseudo),
        valid=hit.valid | use_pseudo,
        point=fill(hit.point, p_pseudo),
        normal=fill(hit.normal, n_pseudo),
        albedo=fill(hit.albedo, flat.albedo[mat_j]),
        shininess=fill(hit.shininess, flat.shininess[mat_j]),
        specular=fill(hit.specular, flat.specular[mat_j]),
        transparency=fill(hit.transparency, flat.transparency[mat_j]),
        refractive_index=fill(
            hit.refractive_index, flat.refractive_index[mat_j]
        ),
        family=jnp.where(use_pseudo, FAMILY_SPHERE, hit.family),
        index=jnp.where(use_pseudo, mat_j.astype(jnp.int32), hit.index),
    )
    return merged, coverage.astype(o.dtype)


def integrate_chain_soft(
    flat: FlatScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: RenderConfig,
    prim_axis: str | None = None,
) -> jnp.ndarray:
    """Chain integrator with a soft-silhouette primary bounce."""
    r = o.shape[0]
    active = jnp.ones((r,), jnp.bool_)
    merged, cov = soft_primary_hit(flat, o, d, cfg)
    nd = _shade_from_hit(flat, merged, d, active, cfg, prim_axis)

    sky = sky_color(d)
    accum = (1.0 - cov)[:, None] * sky
    accum = accum + jnp.where(
        nd["shade"][:, None], cov[:, None] * nd["local_term"], 0.0
    )

    cont = nd["has_refl"]
    w1 = jnp.where(cont, cov * nd["refl_w"], 0.0)
    return _chain_scan(
        flat,
        jnp.where(cont[:, None], nd["refl_o"], o),
        jnp.where(cont[:, None], nd["refl_dir"], d),
        w1,
        cont,
        accum,
        1,
        cfg,
        prim_axis,
    )
