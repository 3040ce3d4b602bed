"""Fused Pallas chain-trace kernel: parity with the XLA integrator.

Runs in interpreter mode on CPU (tests/conftest.py backend); the real
Mosaic-compiled path is exercised by bench.py on TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import raytracingengine_tpu.kernels.chain_trace as ct
from raytracingengine_tpu.geometry.intersect import flatten_scene
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.integrator import integrate_chain
from raytracingengine_tpu.scenes.builders import (
    baseline_sphere_scene,
    head_box_scene,
    stress_scene,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(ct.pl, "pallas_call", patched)
    yield


CFG = RenderConfig(shadow_mode="binary")


def _parity(scene, camera, cfg=CFG, atol=1e-4):
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    ref = integrate_chain(flat, o, d, cfg)
    out = ct.chain_trace_pallas(flat, o, d, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_head_box_parity():
    scene, camera = head_box_scene(width=24, height=24, spp=1)
    _parity(scene, camera)


def test_sphere_scene_parity():
    scene, camera = baseline_sphere_scene(width=24, height=24, spp=1, n_lights=3)
    _parity(scene, camera)


def test_stress_slice_parity():
    scene, camera = stress_scene(
        n_spheres=16, n_lights=2, width=16, height=16, pad_multiple=8
    )
    _parity(scene, camera)


def test_depth_variants():
    scene, camera = head_box_scene(width=16, height=16, spp=1)
    for depth in (0, 1, 3):
        cfg = RenderConfig(shadow_mode="binary", max_depth=depth)
        _parity(scene, camera, cfg)


def test_custom_vjp_grads_match_xla():
    scene, camera = baseline_sphere_scene(width=12, height=12, spp=1)
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())

    def loss_k(fl):
        return jnp.sum(ct.chain_trace(fl, o, d, CFG) ** 2)

    def loss_x(fl):
        return jnp.sum(integrate_chain(fl, o, d, CFG) ** 2)

    gk = jax.grad(loss_k, allow_int=True)(flat)
    gx = jax.grad(loss_x, allow_int=True)(flat)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_pipeline_use_pallas_flag():
    from raytracingengine_tpu.render.pipeline import render_hdr

    scene, camera = baseline_sphere_scene(width=16, height=16, spp=1)
    cfg_x = RenderConfig(shadow_mode="binary", chunk_size=256)
    cfg_p = RenderConfig(shadow_mode="binary", chunk_size=256, use_pallas=True)
    a = render_hdr(scene, camera, cfg_x)
    b = render_hdr(scene, camera, cfg_p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dense_mesh_beyond_old_prim_cap():
    # >512 primitives through the fori-loop SMEM scan (the old MAX_PRIMS
    # ceiling): a 1,080-triangle bumpy sphere must match the XLA
    # integrator exactly. (The full 6,016-triangle scene runs on real TPU
    # via bench.py; interpret mode keeps this test's mesh smaller.)
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    flat = flatten_scene(scene)
    assert flat.n_primitives > 512
    assert ct.pallas_applicable(flat, CFG, "chain")
    _parity(scene, camera)


def test_dense_mesh_grad_falls_back_to_xla():
    # Differentiating a dense-mesh render must NOT build the unrolled
    # adjoint kernel (compile time is linear in primitive count); the
    # custom_vjp backward falls back to XLA autodiff and still produces
    # the XLA path's gradients.
    from raytracingengine_tpu.kernels import chain_grad as cg
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    flat = flatten_scene(scene)
    assert flat.n_primitives > cg.MAX_PRIMS_GRAD
    o, d = camera.rays_for_pixels(*camera.pixel_grid())

    called = {"n": 0}
    orig = cg.chain_grad_pallas

    def spy(*a, **k):
        called["n"] += 1
        return orig(*a, **k)

    cg.chain_grad_pallas = spy
    try:
        gk = jax.grad(
            lambda fl: jnp.sum(cg.chain_trace_fused(fl, o, d, CFG) ** 2),
            allow_int=True,
        )(flat)
    finally:
        cg.chain_grad_pallas = orig
    assert called["n"] == 0, "unrolled adjoint kernel must not run for dense meshes"
    gx = jax.grad(
        lambda fl: jnp.sum(integrate_chain(fl, o, d, CFG) ** 2),
        allow_int=True,
    )(flat)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_aabb_culling_all_blocks_missed():
    # A camera looking AWAY from the mesh: every triangle block is culled,
    # and the kernel must still produce the exact sky/plane-only image.
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene
    from raytracingengine_tpu.core.camera import Camera

    scene, _ = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    # Aim at empty space: camera far beyond the mesh looking further away.
    camera2 = Camera.create(
        (0, 0, 200), focal=8.0, width=8, height=8, near=0.0, far=100.0, spp=1
    )
    flat = flatten_scene(scene)
    o, d = camera2.rays_for_pixels(*camera2.pixel_grid())
    ref = integrate_chain(flat, o, d, CFG)
    out = ct.chain_trace_pallas(flat, o, d, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pack_tri_aabbs_shapes_and_padding():
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene, head_box_scene

    # Small mesh: one block.
    scene, _ = head_box_scene(width=8, height=8, spp=1)
    flat = flatten_scene(scene)
    aabb = ct.pack_tri_aabbs(flat)
    assert aabb.shape == (6, -(-flat.n_triangles // ct.TRI_BLOCK))
    lo, hi = np.asarray(aabb[:3]).T, np.asarray(aabb[3:]).T
    assert (lo <= hi).all()
    # The cube at (0,0,10) size 4: bounds within [-2,2]x[-2,2]x[8,12] (+eps)
    assert lo.min() > -2.1 and hi.max() < 12.1

    # Padded scene: all-padding blocks become far point boxes, not
    # hit-everything boxes.
    scene_p, _ = head_box_scene(width=8, height=8, spp=1, pad_multiple=1024)
    flat_p = flatten_scene(scene_p)
    aabb_p = np.asarray(ct.pack_tri_aabbs(flat_p))
    assert aabb_p.shape == (6, 4)  # 1024 padded tris / 256
    # blocks 1..3 are all-padding -> far point boxes
    assert (aabb_p[:, 1:] > 1e37).all()
