"""In-kernel AA sampler (kernels/spp_trace.py), interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import raytracingengine_tpu.kernels.chain_grad as cg
import raytracingengine_tpu.kernels.chain_trace as ct
import raytracingengine_tpu.kernels.spp_trace as st
from raytracingengine_tpu.geometry.intersect import flatten_scene
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.pipeline import render_hdr
from raytracingengine_tpu.scenes.builders import baseline_sphere_scene


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(ct.pl, "pallas_call", patched)
    monkeypatch.setattr(st.pl, "pallas_call", patched)
    monkeypatch.setattr(cg.pl, "pallas_call", patched)

    # TPU PRNG primitives have no CPU lowering; substitute a hash-based
    # software stream (deterministic per call sequence).
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
    yield


def test_spp_kernel_converges_to_center_render():
    """The jittered mean stays within sub-pixel noise of the spp=1 image
    and is deterministic for a fixed seed."""
    scene, camera = baseline_sphere_scene(width=24, height=24, spp=8)
    flat = flatten_scene(scene)
    cfg = RenderConfig(shadow_mode="binary")
    px, py = camera.pixel_grid()
    a = np.asarray(st.spp_trace_pallas(flat, camera, cfg, px, py, seed=3))
    b = np.asarray(st.spp_trace_pallas(flat, camera, cfg, px, py, seed=3))
    np.testing.assert_array_equal(a, b)  # deterministic per seed

    scene1, camera1 = baseline_sphere_scene(width=24, height=24, spp=1)
    center = np.asarray(render_hdr(scene1, camera1, cfg, mode="chain")).reshape(-1, 3)
    # AA softens edges; interior pixels agree closely.
    diff = np.abs(a - center).max(axis=1)
    assert np.quantile(diff, 0.7) < 0.05
    assert diff.mean() < 0.12


def test_spp_kernel_through_pipeline():
    scene, camera = baseline_sphere_scene(width=16, height=16, spp=4)
    cfg = RenderConfig(shadow_mode="binary", chunk_size=256, use_pallas=True)
    img = np.asarray(render_hdr(scene, camera, cfg))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.std() > 0.05


def test_spp_training_routes_through_fused_kernels():
    """spp>1 + use_pallas + differentiable: the pipeline traces every
    sample through the fused fwd+bwd kernels (chain_trace_fused) with
    explicit replayable jitter — jax.grad works and matches the XLA
    path's gradients (same jitter stream, numerically matching kernels)."""
    scene, camera = baseline_sphere_scene(width=16, height=16, spp=3)
    key = jax.random.PRNGKey(7)

    def make_loss(use_pallas):
        cfg = RenderConfig(
            shadow_mode="binary",
            chunk_size=256,
            use_pallas=use_pallas,
            differentiable=True,
            max_depth=4,
        )
        return lambda s: jnp.sum(render_hdr(s, camera, cfg, key=key) ** 2)

    # Guard against vacuous passing (ADVICE r02): the scene/config must
    # actually be kernel-eligible, and the fused kernel must be invoked.
    from raytracingengine_tpu.geometry.intersect import flatten_scene
    from raytracingengine_tpu.kernels import chain_grad as cg
    from raytracingengine_tpu.kernels.chain_trace import pallas_applicable

    cfg_probe = RenderConfig(shadow_mode="binary", differentiable=True)
    assert pallas_applicable(flatten_scene(scene), cfg_probe, "chain")
    calls = {"n": 0}
    orig_fused = cg.chain_trace_pallas

    def spy(*a, **k):
        calls["n"] += 1
        return orig_fused(*a, **k)

    cg.chain_trace_pallas = spy
    try:
        lk, lx = make_loss(True), make_loss(False)
        np.testing.assert_allclose(float(lk(scene)), float(lx(scene)), rtol=1e-5)
        assert calls["n"] > 0, "use_pallas=True never reached the fused kernel"
    finally:
        cg.chain_trace_pallas = orig_fused
    gk = jax.grad(lk, allow_int=True)(scene)
    gx = jax.grad(lx, allow_int=True)(scene)
    total = 0.0
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(gk)[0], jax.tree.leaves(gx)
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
    assert total > 0.0  # gradients actually flow


def test_software_uniform_range():
    # the test-double stream itself must look uniform
    arr = np.asarray(st._uniform01((8, 128)))
    assert arr.min() >= 0.0 and arr.max() < 1.0
    assert 0.3 < arr.mean() < 0.7
    assert np.unique(arr).size > 500
