"""Fused wavefront (transparency) kernel: parity with the XLA integrator.

The glass scene exercises the full refract/Fresnel/TIR branch
(Scene.h:161-195) plus the transmittance march (Scene.h:35-77) in-kernel.
Runs in interpreter mode on CPU (tests/conftest.py backend); the Mosaic
compile is exercised by tpu_smoke.py / bench.py on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

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
    monkeypatch.setattr(wt.pl, "pallas_call", patched)
    yield


def _parity(scene, camera, cfg, atol=1e-4, tie_budget=0.0):
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    ref = np.asarray(integrate_wavefront(flat, o, d, cfg))
    out = np.asarray(wt.wavefront_trace_pallas(flat, o, d, cfg))
    diff = np.abs(out - ref)
    frac_bad = float((diff.max(axis=-1) > atol).mean())
    assert np.isfinite(out).all()
    assert frac_bad <= tie_budget, (
        f"{frac_bad:.2e} of pixels differ by > {atol} (max {diff.max():.2e})"
    )


def test_glass_march_parity():
    # Default config: the reference transmittance march in-kernel.
    scene, camera = glass_sphere_scene(width=24, height=24, spp=1)
    _parity(scene, camera, RenderConfig())


def test_glass_binary_parity():
    scene, camera = glass_sphere_scene(width=24, height=24, spp=1)
    _parity(scene, camera, RenderConfig(shadow_mode="binary"))


def test_opaque_scene_matches_wavefront_integrator():
    # On an opaque scene the wavefront kernel must agree with the XLA
    # wavefront (and hence the chain) integrator.
    scene, camera = head_box_scene(width=16, height=16, spp=1)
    _parity(scene, camera, RenderConfig(shadow_mode="binary"))


def test_pipeline_routes_wavefront_kernel(monkeypatch):
    # use_pallas on a transparent scene must route through the fused
    # wavefront kernel (not silently fall back to XLA).
    calls = {"n": 0}
    orig = wt.wavefront_trace_pallas

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(wt, "wavefront_trace_pallas", spy)

    from raytracingengine_tpu.render.pipeline import render_hdr

    scene, camera = glass_sphere_scene(width=16, height=16, spp=1)
    cfg = RenderConfig(use_pallas=True)
    img = np.asarray(render_hdr(scene, camera, cfg))
    assert calls["n"] > 0, "wavefront kernel was not invoked"
    assert np.isfinite(img).all()

    ref = np.asarray(render_hdr(scene, camera, RenderConfig()))
    diff = np.abs(img - ref)
    assert float((diff.max(axis=-1) > 1e-4).mean()) == 0.0


def test_wavefront_trace_grads_match_xla():
    # The custom_vjp backward (XLA wavefront autodiff) must produce the
    # same scene-level gradients as differentiating the XLA path.
    import dataclasses

    import jax

    from raytracingengine_tpu.inverse import combine, partition

    scene, camera = glass_sphere_scene(width=12, height=12, spp=1)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    cfg = RenderConfig(shadow_mode="binary", wavefront_budget=64)
    params, static = partition(scene)

    def loss(p, fused):
        fl = flatten_scene(combine(p, static))
        if fused:
            img = wt.wavefront_trace(fl, o, d, cfg)
        else:
            cfg_d = dataclasses.replace(cfg, differentiable=True)
            img = integrate_wavefront(fl, o, d, cfg_d)
        return jnp.mean(img * img)

    gf = jax.grad(lambda p: loss(p, True))(params)
    gx = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        if a.size == 0:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_wavefront_spp_kernel(monkeypatch):
    """In-kernel AA for the wavefront path (VERDICT r04 task #8): the
    jittered mean is deterministic per seed, routed through the pipeline
    for spp>1 glass scenes, and stays within AA noise of the spp=1
    center render."""
    import jax
    import jax.numpy as jnp

    import raytracingengine_tpu.kernels.spp_trace as st
    from raytracingengine_tpu.render.pipeline import render_hdr

    # Software PRNG stand-in (TPU PRNG has no CPU lowering) — same
    # test-double as test_spp_kernel.py.
    state = {"seed": 0.0, "calls": 0}

    def fake_seed(seed):
        state["seed"] = seed
        state["calls"] = 0

    def fake_uniform(shape):
        state["calls"] += 1
        i = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        j = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
        x = jnp.sin(
            i * 12.9898 + j * 78.233
            + jnp.asarray(state["seed"], jnp.float32) * 0.61803
            + state["calls"] * 2.71828
        ) * 43758.5453
        return x - jnp.floor(x)

    monkeypatch.setattr(st, "_seed_prng", fake_seed)
    monkeypatch.setattr(st, "_uniform01", fake_uniform)

    scene, camera = glass_sphere_scene(width=16, height=16, spp=4)
    flat = flatten_scene(scene)
    cfg = RenderConfig(shadow_mode="binary")
    px, py = camera.pixel_grid()
    a = np.asarray(wt.wavefront_spp_trace_pallas(flat, camera, cfg, px, py, seed=3))
    b = np.asarray(wt.wavefront_spp_trace_pallas(flat, camera, cfg, px, py, seed=3))
    np.testing.assert_array_equal(a, b)  # deterministic per seed
    assert np.isfinite(a).all() and a.std() > 0.01

    # Within AA noise of the spp=1 center render (edges soften).
    scene1, cam1 = glass_sphere_scene(width=16, height=16, spp=1)
    center = np.asarray(
        render_hdr(scene1, cam1, cfg, mode="wavefront")
    ).reshape(-1, 3)
    diff = np.abs(a - center).max(axis=1)
    assert np.quantile(diff, 0.7) < 0.08
    assert diff.mean() < 0.15

    # The pipeline routes spp>1 wavefront renders through this kernel.
    calls = {"n": 0}
    orig = wt.wavefront_spp_trace_pallas

    def spy(*args, **kw):
        calls["n"] += 1
        return orig(*args, **kw)

    monkeypatch.setattr(wt, "wavefront_spp_trace_pallas", spy)
    import raytracingengine_tpu.render.pipeline as pipe  # noqa: F401

    cfgp = RenderConfig(shadow_mode="binary", use_pallas=True, chunk_size=256)
    img = np.asarray(render_hdr(scene, camera, cfgp))
    assert calls["n"] > 0, "pipeline did not use the wavefront spp kernel"
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
