"""HBM-streamed triangle path (chain_trace.chain_trace_streamed_pallas):
scenes past the 8,192-primitive SMEM ceiling render fused, matching the
XLA integrator (interpret mode on CPU).

The reference's Model is size-unbounded (/root/reference/
RaytracingEngine/Shape.h:269-300); rounds 1-4 dropped >8,192-triangle
scenes to the ~100x-slower XLA path. The streamed kernel DMAs one
[STREAM_ROWS, TRI_BLOCK] window per non-culled block instead."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import raytracingengine_tpu.kernels.chain_trace as ct
from raytracingengine_tpu.geometry.intersect import flatten_scene
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.integrator import integrate_chain
from raytracingengine_tpu.scenes.builders import dense_mesh_scene


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(ct.pl, "pallas_call", patched)
    yield


def test_streamed_forward_matches_xla():
    scene, cam = dense_mesh_scene(width=16, height=16, ni=72, nj=72)
    flat = flatten_scene(scene)
    assert flat.n_triangles > ct.MAX_PRIMS  # actually streams
    o, d = cam.rays_for_pixels(*cam.pixel_grid())
    cfg = RenderConfig(shadow_mode="binary", max_depth=3)
    a = np.asarray(ct.chain_trace_pallas(flat, o, d, cfg))
    b = np.asarray(integrate_chain(flat, o, d, cfg))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_streamed_applicable_gating():
    scene, cam = dense_mesh_scene(width=8, height=8, ni=72, nj=72)
    flat = flatten_scene(scene)
    cfg = RenderConfig(shadow_mode="binary")
    assert ct.pallas_applicable(flat, cfg, "chain")
    # wavefront keeps the SMEM cap (no streamed wavefront kernel)
    assert not ct.pallas_applicable(flat, cfg, "wavefront")
    assert ct.MAX_TRIS_STREAM > ct.MAX_PRIMS


def test_streamed_adjoint_grads_match_xla(monkeypatch):
    """Training past the SMEM ceiling (VERDICT r04 task #4): the
    streamed blocked adjoint's scene gradients match XLA autodiff of the
    (numerically matching) chain integrator.

    The SMEM ceiling is lowered to 512 for the test so a 616-triangle
    mesh exercises the streamed kernels at interpreter-mode-feasible
    cost (the routing reads chain_trace.MAX_PRIMS at call time; the
    full-scale 50.8k-tri path runs on hardware in bench.py and
    tpu_smoke.py and is forward-validated against the real engine in
    test_reference_parity.py). The MIXED scene (2 spheres + plane +
    mesh) makes the sphere/plane pullback blocks' PBLK-padded ranges
    overlap the next type's scan positions — the r04 advisor's
    high-severity configuration — under the streamed triangle path."""
    from raytracingengine_tpu.inverse import combine, partition
    from raytracingengine_tpu.kernels import chain_grad as cg
    from raytracingengine_tpu.scenes.builders import mixed_dense_scene

    monkeypatch.setattr(ct, "MAX_PRIMS", 512)
    scene, cam = mixed_dense_scene(width=8, height=8, ni=12, nj=28)
    flat = flatten_scene(scene)
    assert flat.n_triangles > ct.MAX_PRIMS  # actually streams
    o, d = cam.rays_for_pixels(*cam.pixel_grid())
    cfg = RenderConfig(shadow_mode="binary", max_depth=2)
    params, static = partition(scene)

    calls = {"n": 0}
    orig = cg.chain_grad_pallas_streamed

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    cg.chain_grad_pallas_streamed = spy
    try:
        def loss(p, o_, d_, fused):
            fl = flatten_scene(combine(p, static))
            if fused:
                img = cg.chain_trace_fused(fl, o_, d_, cfg)
            else:
                img = integrate_chain(fl, o_, d_, cfg)
            return jnp.mean(img * img)

        # One grad call over (scene params, ray origins, ray dirs): the
        # unrolled streamed-adjoint program compiles ONCE (its compile
        # dominates this test's runtime in interpreter mode).
        gf, gof, gdf = jax.grad(
            lambda p, a, b: loss(p, a, b, True), argnums=(0, 1, 2)
        )(params, o, d)
        assert calls["n"] == 1, "streamed adjoint was not used"
        gx, gox, gdx = jax.grad(
            lambda p, a, b: loss(p, a, b, False), argnums=(0, 1, 2)
        )(params, o, d)
    finally:
        cg.chain_grad_pallas_streamed = orig
    total = 0.0
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0], jax.tree.leaves(gx)
    ):
        a_, b_ = np.asarray(a), np.asarray(b)
        if not np.issubdtype(a_.dtype, np.floating) or b_.size == 0:
            continue
        scale = np.abs(b_).max() + 1e-6
        np.testing.assert_allclose(
            a_, b_, rtol=5e-3, atol=2e-3 * scale,
            err_msg=jax.tree_util.keystr(path),
        )
        total += float(np.abs(a_).sum())
    assert total > 0.0
    # Camera-ray gradients through the streamed adjoint match XLA too.
    a_, b_ = np.asarray(gof), np.asarray(gox)
    np.testing.assert_allclose(a_, b_, atol=1e-4 * (np.abs(b_).max() + 1e-6))
    # Direction grads up to the radial component (the kernel treats d as
    # unit — the constrained subgradient — while the XLA integrator
    # differentiates through its internal normalization; they agree on
    # the tangent plane of the unit sphere, same convention as
    # test_chain_grad.test_ray_grads).
    dk, dx_g = np.asarray(gdf), np.asarray(gdx)
    dn = np.asarray(d)
    proj = lambda g: g - dn * np.sum(g * dn, axis=1, keepdims=True)
    tk, tx = proj(dk), proj(dx_g)
    scale = np.abs(tx).max() + 1e-6
    err = np.abs(tk - tx)
    assert np.quantile(err, 0.99) < 2e-3 * scale, np.quantile(err, 0.99)
    assert err.max() < 2e-2 * scale, (err.max(), scale)
