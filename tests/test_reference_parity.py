"""Parity against the REAL reference C++ engine.

Round 1 proved parity only against a self-written fp64 oracle
(golden/reference.py). These tests compare against HDR frames dumped by the
actual engine — /root/reference/RaytracingEngine headers compiled unmodified
by refbuild/parity_main.cpp — eliminating the shared-misreading failure mode.

Frames are deterministic (spp=1; Camera::antiAliasingAmount=1 disables the
jitter branch at Scene.h:292). Tolerances: fp32-vs-fp64 elementwise noise is
~1e-5 in HDR; a handful of pixels per million sit on exact closest-hit ties
(plane seams, box silhouette) where fp32 flips the discrete winner — those
are bounded by a pixel-count budget rather than an elementwise tolerance
(verified: at those pixels the fp64 oracle matches the C++ engine to 1e-10,
so the flips are precision artifacts, not semantics).

Skipped when the dumps are absent (run refbuild/build.sh && refbuild/rte_parity).
"""

import numpy as np
import pytest

from raytracingengine_tpu.golden import refdump
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.pipeline import render_hdr
from raytracingengine_tpu.scenes.builders import (
    baseline_sphere_scene,
    glass_sphere_scene,
    head_box_scene,
)

needs = lambda name: pytest.mark.skipif(
    not refdump.have_dump(name), reason=f"refbuild dump {name} not present"
)


def _ldr_bytes(img):
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.int32)


def _compare(name, scene, camera, max_bad_frac=0.0, p999=5e-5):
    ref = refdump.load_dump(name)
    img = np.asarray(render_hdr(scene, camera, RenderConfig()), np.float64)
    assert img.shape == ref.shape
    diff = np.abs(img - ref)
    assert np.percentile(diff, 99.9) < p999, (
        f"{name}: p99.9 HDR diff {np.percentile(diff, 99.9):.2e}"
    )
    byte_diff = np.abs(_ldr_bytes(img) - _ldr_bytes(ref))
    bad_frac = float((byte_diff > 1).mean())
    assert bad_frac <= max_bad_frac, (
        f"{name}: {bad_frac:.2e} of subpixels differ by >1 LDR byte "
        f"(budget {max_bad_frac:.2e}); max byte diff {byte_diff.max()}"
    )


@needs("baseline_spheres_256")
def test_baseline_spheres_vs_real_engine():
    scene, cam = baseline_sphere_scene(256, 256, spp=1)
    _compare("baseline_spheres_256", scene, cam, max_bad_frac=0.0)


@needs("glass_256")
def test_glass_vs_real_engine():
    # Exercises refraction + Fresnel + TIR (Scene.h:161-195) against the
    # real engine — the branching wavefront integrator end-to-end.
    scene, cam = glass_sphere_scene(256, 256, spp=1)
    _compare("glass_256", scene, cam, max_bad_frac=0.0)


@needs("head_box_1000")
def test_head_box_1000_vs_real_engine():
    # Full-resolution parity at the reference's own golden scale
    # (output.ppm is 1000x1000). ~100 subpixels per million sit on
    # closest-hit ties at plane seams; budget 2e-5.
    scene, cam = head_box_scene(width=1000, height=1000, spp=1)
    _compare("head_box_1000", scene, cam, max_bad_frac=2e-5)


@needs("dense_mesh_128")
def test_dense_mesh_vs_real_engine():
    # 6,016-triangle bumpy sphere through the reference's arbitrary-size
    # Model loop (Shape.h:269-300) — the dense-mesh domain the old
    # 512-primitive kernel ceiling excluded.
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, cam = dense_mesh_scene(128, 128, spp=1)
    _compare("dense_mesh_128", scene, cam, max_bad_frac=2e-5)


@needs("dense_mesh_512")
def test_dense_mesh_512_vs_real_engine():
    # Full-resolution dense-mesh parity (VERDICT r04 task #7): the same
    # per-pixel budgets as the box scenes, at 16x the r4 pixel count, so
    # the treelet/tie-break machinery faces the same scrutiny.
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, cam = dense_mesh_scene(512, 512, spp=1)
    _compare("dense_mesh_512", scene, cam, max_bad_frac=2e-5)


@needs("dense_mesh_streamed_256")
def test_streamed_mesh_vs_real_engine():
    # 50,800-triangle mesh — past the 8,192-prim SMEM ceiling, the size
    # class served by chain_trace_streamed_pallas (r5). The XLA
    # integrator validated here is itself the oracle the streamed kernel
    # is pinned against in tests/test_streamed.py, closing the chain
    # streamed kernel == XLA integrator == real C++ engine.
    #
    # Every 8th row (8,192 pixels): the CPU all-pairs oracle at 50.8k
    # primitives costs ~42 GFLOP per 16k-ray chunk — the full frame made
    # this single test dominate the suite (measured 602 s even at 1/4
    # rows). The row stride keeps full horizontal coverage of
    # mesh/floor/sky/silhouettes.
    import jax.numpy as jnp

    from raytracingengine_tpu.render.pipeline import render_rays
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, cam = dense_mesh_scene(256, 256, spp=1, ni=128, nj=200)
    ref = refdump.load_dump("dense_mesh_streamed_256").reshape(256, 256, 3)
    rows = np.arange(0, 256, 8)
    px, py = np.meshgrid(np.arange(256), rows)
    o, d = cam.rays_for_pixels(
        jnp.asarray(px.ravel()), jnp.asarray(py.ravel())
    )
    img = np.asarray(render_rays(scene, o, d, RenderConfig()), np.float64)
    ref_s = ref[rows].reshape(-1, 3)
    diff = np.abs(img - ref_s)
    assert np.percentile(diff, 99.9) < 5e-5
    byte_diff = np.abs(_ldr_bytes(img) - _ldr_bytes(ref_s))
    bad_frac = float((byte_diff > 1).mean())
    assert bad_frac <= 2e-5, (
        f"streamed parity: {bad_frac:.2e} subpixels differ "
        f"(max byte diff {byte_diff.max()})"
    )


@needs("head_box_1080p")
@pytest.mark.slow
def test_head_box_1080p_vs_real_engine():
    # BASELINE config #2: 1920x1080 allclose vs the reference.
    scene, cam = head_box_scene(width=1920, height=1080, spp=1)
    _compare("head_box_1080p", scene, cam, max_bad_frac=2e-5)
