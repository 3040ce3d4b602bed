"""Fused wavefront backward (kernels/wavefront_grad.py): gradient parity
with XLA autodiff of the wavefront integrator (interpret mode on CPU).

The taped-DFS adjoint covers the reference's full TraceRay domain —
refraction, Fresnel, TIR, the transmittance march (Scene.h:131-198,
:35-77) — so these tests pin every differentiable leaf (scene tables
including transparency and refractive index, plus camera rays) against
the XLA fixed-trip replay."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import raytracingengine_tpu.kernels.chain_trace as ct
import raytracingengine_tpu.kernels.wavefront_grad as wg
import raytracingengine_tpu.kernels.wavefront_trace as wt
from raytracingengine_tpu.geometry.intersect import flatten_scene
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.integrator import integrate_wavefront
from raytracingengine_tpu.scenes.builders import (
    glass_sphere_scene,
    head_box_scene,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(ct.pl, "pallas_call", patched)
    monkeypatch.setattr(wt.pl, "pallas_call", patched)
    monkeypatch.setattr(wg.pl, "pallas_call", patched)
    yield


def _compare(scene, camera, cfg, rtol=2e-3, atol=2e-4):
    o, d = camera.rays_for_pixels(*camera.pixel_grid())

    def loss_k(s):
        return jnp.sum(wt.wavefront_trace(flatten_scene(s), o, d, cfg) ** 2)

    cfg_d = dataclasses.replace(cfg, differentiable=True)

    def loss_x(s):
        return jnp.sum(integrate_wavefront(flatten_scene(s), o, d, cfg_d) ** 2)

    np.testing.assert_allclose(
        float(loss_k(scene)), float(loss_x(scene)), rtol=1e-6
    )
    gk = jax.grad(loss_k, allow_int=True)(scene)
    gx = jax.grad(loss_x, allow_int=True)(scene)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(gk)[0], jax.tree.leaves(gx)
    ):
        a_, b_ = np.asarray(a), np.asarray(b)
        if not np.issubdtype(a_.dtype, np.floating) or b_.size == 0:
            continue
        scale = np.abs(b_).max() + 1e-6
        np.testing.assert_allclose(
            a_, b_, rtol=rtol, atol=atol + 1e-3 * scale,
            err_msg=jax.tree_util.keystr(path),
        )
    return gk


def test_glass_grads_binary():
    scene, camera = glass_sphere_scene(width=8, height=8)
    _compare(
        scene, camera,
        RenderConfig(shadow_mode="binary", max_depth=4, wavefront_budget=40),
    )


def test_glass_grads_march_transparency():
    # March shadows: the transmittance product's transparency adjoint
    # (cot_tau = cot_T * T / tau per crossed surface) must match the XLA
    # fixed-trip march autodiff — and be NONZERO (the glass sphere
    # shadows the floor plane, so d(loss)/d(transparency) flows through
    # T as well as through the local (1 - tau) weighting).
    scene, camera = glass_sphere_scene(width=8, height=8)
    gk = _compare(
        scene, camera,
        RenderConfig(shadow_mode="march", max_depth=4, wavefront_budget=40),
    )
    assert float(jnp.abs(gk.spheres.materials.transparency).max()) > 1e-4


def test_glass_grads_deep_tir():
    # Deeper recursion reaches total-internal-reflection lanes (F = 1,
    # zero-length refraction) — the adjoint must stay finite and match.
    scene, camera = glass_sphere_scene(width=6, height=6)
    _compare(
        scene, camera,
        RenderConfig(shadow_mode="march", max_depth=6, wavefront_budget=100),
    )


def test_head_box_wavefront_grads():
    # The HEAD scene forced through the wavefront engine: opaque + tiny
    # specular, exercises chain-like (single-child) stack traffic.
    scene, camera = head_box_scene(width=8, height=8, spp=1)
    camera = dataclasses.replace(
        camera, position=camera.position + jnp.asarray([0.013, 0.007, 0.0])
    )
    _compare(
        scene, camera,
        RenderConfig(shadow_mode="binary", max_depth=3, wavefront_budget=24),
    )


def test_glass_ray_grads():
    scene, camera = glass_sphere_scene(width=8, height=8)
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    cfg = RenderConfig(shadow_mode="march", max_depth=4, wavefront_budget=40)
    cfg_d = dataclasses.replace(cfg, differentiable=True)

    gk = jax.grad(
        lambda oo, dd: jnp.sum(wt.wavefront_trace(flat, oo, dd, cfg) ** 2),
        argnums=(0, 1),
    )(o, d)
    gx = jax.grad(
        lambda oo, dd: jnp.sum(integrate_wavefront(flat, oo, dd, cfg_d) ** 2),
        argnums=(0, 1),
    )(o, d)
    a_, b_ = np.asarray(gk[0]), np.asarray(gx[0])
    np.testing.assert_allclose(a_, b_, atol=1e-4 * (np.abs(b_).max() + 1e-6))
    # Direction grads agree up to a RADIAL component (the kernel's sky
    # skips the redundant normalize — see test_chain_grad.test_ray_grads).
    dk, dx_g = np.asarray(gk[1]), np.asarray(gx[1])
    dn = np.asarray(d)
    proj = lambda g: g - dn * np.sum(g * dn, axis=1, keepdims=True)
    tk, tx = proj(dk), proj(dx_g)
    scale = np.abs(tx).max() + 1e-6
    err = np.abs(tk - tx)
    assert np.quantile(err, 0.99) < 2e-3 * scale, np.quantile(err, 0.99)
    assert err.max() < 2e-2 * scale, (err.max(), scale)
