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
