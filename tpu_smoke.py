"""TPU kernel smoke test: Mosaic-compile every Pallas kernel on one tile.

CI runs all kernel tests in interpreter mode on CPU (tests/conftest.py)
because Mosaic has no CPU lowering; only bench.py exercised the real
compile, so a Mosaic regression would surface at bench time (VERDICT r01
weak #5). This script compiles and runs each kernel on the real TPU with
a single tile of rays and checks numerics against the XLA integrator:

  1. chain_trace_pallas      (fused forward, kernels/chain_trace.py)
  2. spp_trace_pallas        (in-kernel AA loop, kernels/spp_trace.py)
  3. chain_grad_pallas       (checkpointed-adjoint backward, via
                              jax.grad of chain_trace_fused)

Run on TPU: python tpu_smoke.py    (exits nonzero on any failure)
Minutes, not bench-time: one tile (TILE rays) per kernel, small scene.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from raytracingengine_tpu.utils.tpu import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    if dev.platform != "tpu":
        print("SKIP: not a TPU backend — smoke test is for Mosaic compiles")
        return 0

    from raytracingengine_tpu.geometry.intersect import flatten_scene
    from raytracingengine_tpu.kernels.chain_grad import chain_trace_fused
    from raytracingengine_tpu.kernels.chain_trace import TILE, chain_trace_pallas
    from raytracingengine_tpu.kernels.spp_trace import spp_trace_pallas
    from raytracingengine_tpu.render.config import RenderConfig
    from raytracingengine_tpu.render.integrator import integrate_chain
    from raytracingengine_tpu.scenes.builders import head_box_scene

    # One tile of pixels: TILE rays (128 x TILE//128 image).
    w, h = 128, TILE // 128
    failures = 0

    def check(name, ours, ref, atol, frac_budget=1e-3):
        # Mosaic and XLA contract FMAs differently, so a handful of
        # pixels sitting exactly on a hit/shadow tie flip their binary
        # visibility — full-contribution diffs on <=0.1% of pixels are
        # seam ties, not kernel bugs (same budget as
        # tests/test_reference_parity.py). Everything else must agree.
        nonlocal failures
        ours = np.asarray(ours)
        diff = np.abs(ours - ref)
        frac_bad = float((diff.max(axis=-1) > atol).mean())
        ok = np.isfinite(ours).all() and frac_bad <= frac_budget
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"(max|diff|={diff.max():.2e}, frac>tol={frac_bad:.2e})",
              flush=True)
        failures += 0 if ok else 1

    cfg = RenderConfig(shadow_mode="binary")
    scene, camera = head_box_scene(width=w, height=h, spp=1)
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    ref = np.asarray(jax.jit(lambda: integrate_chain(flat, o, d, cfg))())

    t0 = time.time()
    fwd = jax.jit(lambda oo, dd: chain_trace_pallas(flat, oo, dd, cfg))
    check("chain_trace (fwd kernel)", fwd(o, d), ref, atol=1e-4)
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # spp kernel at spp=1 is exactly the center-ray trace -> same ref.
    _, cam_spp = head_box_scene(width=w, height=h, spp=1)
    px, py = cam_spp.pixel_grid()
    t0 = time.time()
    spp_fn = jax.jit(lambda: spp_trace_pallas(flat, cam_spp, cfg, px, py, 7))
    check("spp_trace (AA kernel, spp=1)", spp_fn().reshape(-1, 3), ref, atol=1e-4)
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # Backward kernel: grads of a scalar loss w.r.t. the user-facing SCENE
    # parameters, vs the XLA integrator's autodiff on the same loss.
    # NOTE: FlatScene-level leafwise comparison is INVALID here — FlatScene
    # carries redundant derived triangle/plane fields and the Pallas kernel
    # reads a different subset (v0/e1/e2/nunit) than the XLA integrator
    # (ngeo/k/c1/c2/aux), so each implementation's cotangents land on
    # different leaves of the same mathematical gradient. Pulling both back
    # to Scene parameters (inverse.partition) makes them comparable — and
    # that is the space training actually optimizes in.
    from raytracingengine_tpu.inverse import combine, partition

    params, static = partition(scene)

    def loss_fused(p):
        fl = flatten_scene(combine(p, static))
        return jnp.sum(chain_trace_fused(fl, o, d, cfg) ** 2)

    def loss_xla(p):
        fl = flatten_scene(combine(p, static))
        return jnp.sum(integrate_chain(fl, o, d, cfg) ** 2)

    t0 = time.time()
    g_fused = jax.jit(jax.grad(loss_fused))(params)
    g_ref = jax.jit(jax.grad(loss_xla))(params)
    leaves_f = [x for x in jax.tree.leaves(g_fused) if x.size]
    leaves_r = [x for x in jax.tree.leaves(g_ref) if x.size]
    rel = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-6))
        for a, b in zip(leaves_f, leaves_r)
    )
    finite = all(bool(jnp.isfinite(a).all()) for a in leaves_f)
    grad_l1 = sum(float(jnp.sum(jnp.abs(a))) for a in leaves_f)
    max_diff = rel
    ok = finite and rel < 5e-2 and grad_l1 > 0.0
    print(f"{'PASS' if ok else 'FAIL'} chain_grad (bwd kernel) "
          f"(max|diff|={max_diff:.2e}, grad_l1={grad_l1:.3e})", flush=True)
    failures += 0 if ok else 1
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # Wavefront (transparency) kernel: glass scene with the reference
    # transmittance march in-kernel, vs the XLA wavefront integrator.
    from raytracingengine_tpu.kernels.wavefront_trace import (
        wavefront_trace_pallas,
    )
    from raytracingengine_tpu.render.integrator import integrate_wavefront
    from raytracingengine_tpu.scenes.builders import glass_sphere_scene

    gscene, gcam = glass_sphere_scene(width=w, height=h, spp=1)
    gflat = flatten_scene(gscene)
    go, gd = gcam.rays_for_pixels(*gcam.pixel_grid())
    gcfg = RenderConfig()  # march shadows (the reference default)
    gref = np.asarray(jax.jit(lambda: integrate_wavefront(gflat, go, gd, gcfg))())
    t0 = time.time()
    wf = jax.jit(lambda oo, dd: wavefront_trace_pallas(gflat, oo, dd, gcfg))
    check("wavefront_trace (glass, march)", wf(go, gd), gref, atol=1e-4)
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # Blocked adjoint kernel: dense-mesh (> _MAX_PRIMS_UNROLL) training
    # grads through chain_grad_pallas_blocked, vs XLA autodiff — at
    # SCENE-parameter level (see the chain_grad note above).
    from raytracingengine_tpu.kernels import chain_grad as cg
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    dscene, dcam = dense_mesh_scene(width=32, height=32, spp=1, ni=16, nj=36)
    dflat = flatten_scene(dscene)
    assert dflat.n_primitives > cg._MAX_PRIMS_UNROLL
    do_, dd_ = dcam.rays_for_pixels(*dcam.pixel_grid())
    dparams, dstatic = partition(dscene)

    def dloss_fused(p):
        fl = flatten_scene(combine(p, dstatic))
        return jnp.sum(chain_trace_fused(fl, do_, dd_, cfg) ** 2)

    def dloss_xla(p):
        fl = flatten_scene(combine(p, dstatic))
        return jnp.sum(integrate_chain(fl, do_, dd_, cfg) ** 2)

    t0 = time.time()
    dg_f = jax.jit(jax.grad(dloss_fused))(dparams)
    dg_r = jax.jit(jax.grad(dloss_xla))(dparams)
    dl_f = [x for x in jax.tree.leaves(dg_f) if x.size]
    dl_r = [x for x in jax.tree.leaves(dg_r) if x.size]
    rel = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-6))
        for a, b in zip(dl_f, dl_r)
    )
    finite = all(bool(jnp.isfinite(a).all()) for a in dl_f)
    grad_l1 = sum(float(jnp.sum(jnp.abs(a))) for a in dl_f)
    ok = finite and rel < 5e-2 and grad_l1 > 0.0
    print(f"{'PASS' if ok else 'FAIL'} chain_grad_blocked (dense bwd) "
          f"(max|diff|={rel:.2e}, grad_l1={grad_l1:.3e})", flush=True)
    failures += 0 if ok else 1
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # Wavefront taped-DFS adjoint (r5): glass training grads on-chip vs
    # XLA autodiff of the fixed-trip wavefront replay (scene-parameter
    # space, see the chain_grad note).
    import dataclasses as _dc

    from raytracingengine_tpu.kernels.wavefront_trace import wavefront_trace
    from raytracingengine_tpu.render.integrator import (
        integrate_wavefront as _iw,
    )

    gparams, gstatic = partition(gscene)
    wcfg = RenderConfig(shadow_mode="binary", wavefront_budget=24)

    def wloss_fused(p):
        fl = flatten_scene(combine(p, gstatic))
        return jnp.sum(wavefront_trace(fl, go, gd, wcfg) ** 2)

    def wloss_xla(p):
        fl = flatten_scene(combine(p, gstatic))
        cfg_d = _dc.replace(wcfg, differentiable=True)
        return jnp.sum(_iw(fl, go, gd, cfg_d) ** 2)

    t0 = time.time()
    wg_f = jax.jit(jax.grad(wloss_fused))(gparams)
    wg_r = jax.jit(jax.grad(wloss_xla))(gparams)
    wl_f = [x for x in jax.tree.leaves(wg_f) if x.size]
    wl_r = [x for x in jax.tree.leaves(wg_r) if x.size]
    rel = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-6))
        for a, b in zip(wl_f, wl_r)
    )
    finite = all(bool(jnp.isfinite(a).all()) for a in wl_f)
    grad_l1 = sum(float(jnp.sum(jnp.abs(a))) for a in wl_f)
    ok = finite and rel < 5e-2 and grad_l1 > 0.0
    print(f"{'PASS' if ok else 'FAIL'} wavefront_grad (taped-DFS adjoint) "
          f"(max|diff|={rel:.2e}, grad_l1={grad_l1:.3e})", flush=True)
    failures += 0 if ok else 1
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # Wavefront in-kernel AA sampler (r5) at spp=1 == center-ray trace.
    from raytracingengine_tpu.kernels.wavefront_trace import (
        wavefront_spp_trace_pallas,
    )

    gpx, gpy = gcam.pixel_grid()
    t0 = time.time()
    wspp = jax.jit(
        lambda: wavefront_spp_trace_pallas(gflat, gcam, gcfg, gpx, gpy, 7)
    )
    # Budget 0.5%: this kernel builds camera rays in-kernel (VPU rsqrt),
    # and ULP-level direction differences vs the XLA-built reference rays
    # get discretely amplified at refraction/TIR branch boundaries —
    # measured diffs stay <1e-3 HDR on ~0.24% of glass pixels.
    check("wavefront_spp (glass AA, spp=1)", wspp().reshape(-1, 3), gref,
          atol=1e-4, frac_budget=5e-3)
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # HBM-streamed forward (r5): 50,800 triangles past SMEM residency,
    # vs the XLA integrator on a 32x32 ray set.
    sscene, scam = dense_mesh_scene(width=32, height=32, spp=1,
                                    ni=128, nj=200)
    sflat = flatten_scene(sscene)
    from raytracingengine_tpu.kernels.chain_trace import MAX_PRIMS

    assert sflat.n_triangles > MAX_PRIMS
    so_, sd_ = scam.rays_for_pixels(*scam.pixel_grid())
    sref = np.asarray(jax.jit(lambda: integrate_chain(sflat, so_, sd_, cfg))())
    t0 = time.time()
    sfwd = jax.jit(lambda oo, dd: chain_trace_pallas(sflat, oo, dd, cfg))
    check("chain_trace_streamed (50.8k tris)",
          sfwd(so_, sd_).reshape(-1, 3), sref.reshape(-1, 3), atol=1e-4)
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    # Streamed adjoint (r5): training grads past SMEM residency — finite,
    # nonzero, and loss decreases under one SGD step (full grad parity is
    # pinned at interpreter scale in tests/test_streamed.py).
    sparams, sstatic = partition(sscene)

    def sloss(p):
        fl = flatten_scene(combine(p, sstatic))
        return jnp.mean(chain_trace_fused(fl, so_, sd_, cfg) ** 2)

    t0 = time.time()
    sgf = jax.jit(jax.value_and_grad(sloss))
    l0, sg = sgf(sparams)
    l0 = float(l0)
    sgl = [x for x in jax.tree.leaves(sg)
           if x.size and jnp.issubdtype(x.dtype, jnp.floating)]
    finite = all(bool(jnp.isfinite(a).all()) for a in sgl)
    grad_l1 = sum(float(jnp.sum(jnp.abs(a))) for a in sgl)
    p1 = jax.tree.map(
        lambda a, b: a - 1e-4 * b
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        sparams, sg,
    )
    l1 = float(sgf(p1)[0])
    ok = finite and grad_l1 > 0.0 and l1 < l0
    print(f"{'PASS' if ok else 'FAIL'} chain_grad_streamed (50.8k bwd) "
          f"(grad_l1={grad_l1:.3e}, loss {l0:.5f} -> {l1:.5f})", flush=True)
    failures += 0 if ok else 1
    print(f"  compile+run {time.time() - t0:.1f}s", flush=True)

    print(f"{9 - failures}/9 kernels PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
