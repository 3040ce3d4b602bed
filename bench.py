"""Benchmark: rays/s/chip on the reference's workloads, on real TPU.

Headline (the BASELINE.json metric): the fused forward+backward training
step at 1080p — value_and_grad of an image loss w.r.t. every scene
parameter through the fused Pallas forward AND checkpointed-adjoint
backward kernels — measured inside a jitted 8-step SGD loop (lax.scan),
the shape of a production training loop. Per-step wall time then reflects
device time: this image's tunneled TPU backend costs ~28 ms per dispatch
(profiling/profile_step.py), which a real training loop amortizes exactly
like the scan does. The single-dispatch step time is reported alongside.

Secondary lines (stderr + BENCH_DETAIL_r05.json) cover every BASELINE
config on this chip:
  - forward render @1080p spp=8 (production path, config #2 resolution)
  - 32-spp in-kernel AA at 1000x1000 (config #1 semantics, the
    reference's own antiAliasingAmount=32 golden workload)
  - glass scene @1080p through the fused wavefront kernel — refraction/
    Fresnel/TIR + transmittance march (config #2's full shading domain)
  - 4K 64-sphere 4-light stress forward (config #5, single chip)
  - 6,016-triangle dense mesh @512^2 (Model's arbitrary-size loop)
  - mesh-of-1 shard_map render with kernels (the distributed composition)

The reference publishes no numbers (BASELINE.md): the baseline is the
reference engine built unmodified from /root/reference (refbuild/build.sh)
on THIS host — 185,343 primary rays/s at 1080p spp=1 (OpenMP, all cores;
refbuild/baseline_measured.json). `vs_baseline` divides our fwd+bwd
training rate by that forward-only rate — conservative, since the
reference has no backward pass at all.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: Measured reference throughput (fallback if the JSON record is absent).
BASELINE_RAYS_PER_S = 185343.0


def _measured_baseline() -> float:
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "refbuild", "baseline_measured.json")
    try:
        with open(p) as f:
            return float(json.load(f)["head_scene_1080p_spp1_rays_per_s"])
    except Exception:
        return BASELINE_RAYS_PER_S


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from raytracingengine_tpu.utils.tpu import setup_compile_cache

    setup_compile_cache()
    import jax
    import jax.numpy as jnp

    from raytracingengine_tpu.geometry.intersect import flatten_scene
    from raytracingengine_tpu.inverse import combine, partition
    from raytracingengine_tpu.kernels import chain_grad as cg
    from raytracingengine_tpu.render.config import RenderConfig
    from raytracingengine_tpu.render.pipeline import render_hdr
    from raytracingengine_tpu.scenes.builders import (
        dense_mesh_scene,
        glass_sphere_scene,
        head_box_scene,
        stress_scene,
    )

    detail = {}
    width, height = 1920, 1080
    rays_1080 = width * height

    def timed(fn, iters=3, warmup=1, label=""):
        t0 = time.time()
        for _ in range(warmup):
            jax.block_until_ready(fn())
        warm = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            r = jax.block_until_ready(fn())
        dt = (time.time() - t0) / iters
        if label:
            log(f"{label}: warmup {warm:.1f}s, {dt*1e3:.1f} ms/iter")
        return dt

    # ---- headline: fused fwd+bwd training loop @1080p spp=1 ----
    scene_b, camera_b = head_box_scene(width=width, height=height, spp=1)
    o, d = camera_b.rays_for_pixels(*camera_b.pixel_grid())
    cfg_b = RenderConfig(shadow_mode="binary")
    params, static = partition(scene_b)

    def loss(p):
        fl = flatten_scene(combine(p, static))
        img = cg.chain_trace_fused(fl, o, d, cfg_b)
        return jnp.mean(img * img)

    K = 8

    @jax.jit
    def train_k_steps(p):
        def step(p, _):
            l, g = jax.value_and_grad(loss)(p)
            p = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
            return p, l

        p, ls = jax.lax.scan(step, p, None, length=K)
        return p, ls

    dt_loop = timed(lambda: train_k_steps(params), label=f"train loop ({K} steps)")
    step_ms = dt_loop / K * 1e3
    bwd_rays = rays_1080 / (dt_loop / K)
    log(f"fwd+bwd training step (scan-amortized): {step_ms:.1f} ms/step "
        f"@1080p -> {bwd_rays/1e6:.2f} Mrays/s")
    detail["train_step_scan_ms"] = round(step_ms, 2)
    detail["train_step_scan_mrays_s"] = round(bwd_rays / 1e6, 2)

    gf = jax.jit(jax.value_and_grad(loss))

    def one_step():
        l, g = gf(params)
        return l

    dt1 = timed(one_step, label="single-dispatch step")
    log(f"fwd+bwd single dispatch: {dt1*1e3:.1f} ms/step -> "
        f"{rays_1080/dt1/1e6:.2f} Mrays/s (incl. ~28 ms tunnel overhead)")
    detail["train_step_single_ms"] = round(dt1 * 1e3, 2)

    # A failed secondary line must never cost the headline JSON (the
    # 512^2 glass-train compile once crashed the remote-compile helper
    # outright): one guard around everything after the headline.
    try:
        # ---- forward render @1080p spp=8 (production path) ----
        scene, camera = head_box_scene(width=width, height=height, spp=8)
        cfg = RenderConfig(shadow_mode="binary", use_pallas=True,
                           chunk_size=rays_1080)
        fwd = jax.jit(lambda s: jnp.sum(render_hdr(s, camera, cfg)))
        dt = timed(lambda: fwd(scene), label="forward spp=8 @1080p")
        log(f"forward: {dt*1e3/8:.1f} ms/frame -> {rays_1080*8/dt/1e6:.1f} Mrays/s")
        detail["forward_1080p_mrays_s"] = round(rays_1080 * 8 / dt / 1e6, 1)

        # ---- config #1: the reference's own 32-spp 1000x1000 workload ----
        s32, c32 = head_box_scene(width=1000, height=1000, spp=32)
        cfg32 = RenderConfig(shadow_mode="binary", use_pallas=True,
                             chunk_size=1000 * 1000)
        f32 = jax.jit(lambda s: jnp.sum(render_hdr(s, c32, cfg32)))
        dt = timed(lambda: f32(s32), label="spp=32 1000x1000 (in-kernel AA)")
        detail["spp32_1000_mrays_s"] = round(1000 * 1000 * 32 / dt / 1e6, 1)
        log(f"spp=32 AA: {dt*1e3:.0f} ms/image -> "
            f"{detail['spp32_1000_mrays_s']} Mrays/s")

        # ---- config #2 domain: glass @1080p through the wavefront kernel ----
        # Wall time AND device time: the r4 driver run measured 150.6 ms
        # wall where the committed run had 65.7 — a 2.3x swing PROFILE.md
        # §7 traces to dispatch/tunnel variance, not device work. Report
        # both so the run of record is interpretable (VERDICT r04 task #2).
        gs, gc = glass_sphere_scene(width=width, height=height, spp=1)
        gcfg = RenderConfig(use_pallas=True, chunk_size=rays_1080)  # march shadows
        gfwd = jax.jit(lambda s: jnp.sum(render_hdr(s, gc, gcfg)))
        dt = timed(lambda: gfwd(gs), iters=10, label="glass @1080p (wavefront kernel)")
        detail["glass_1080p_mrays_s"] = round(rays_1080 / dt / 1e6, 1)
        log(f"glass: {dt*1e3:.1f} ms/frame -> {detail['glass_1080p_mrays_s']} Mrays/s")
        try:
            from raytracingengine_tpu.utils.profiling import profile_step

            rep = profile_step(lambda: jax.block_until_ready(gfwd(gs)))
            if rep.device_total_ms > 0:
                detail["glass_1080p_device_ms"] = round(rep.device_total_ms, 1)
                detail["glass_1080p_device_mrays_s"] = round(
                    rays_1080 / rep.device_total_ms / 1e3, 1
                )
                log(f"glass device time: {rep.device_total_ms:.1f} ms -> "
                    f"{detail['glass_1080p_device_mrays_s']} Mrays/s device-side")
        except Exception as e:
            log(f"glass device-trace failed: {e!r}")

        # ---- glass spp=8: whole AA loop inside the wavefront kernel ----
        # (kernels/wavefront_trace.wavefront_spp_trace_pallas, r5): one
        # dispatch instead of looping the wavefront kernel per sample.
        gs8, gc8 = glass_sphere_scene(width=width, height=height, spp=8)
        g8 = jax.jit(lambda s: jnp.sum(render_hdr(s, gc8, gcfg)))
        dt = timed(lambda: g8(gs8), label="glass spp=8 @1080p (in-kernel AA)")
        detail["glass_spp8_1080p_mrays_s"] = round(rays_1080 * 8 / dt / 1e6, 1)
        log(f"glass spp=8: {dt*1e3:.1f} ms -> "
            f"{detail['glass_spp8_1080p_mrays_s']} Mrays/s (in-kernel AA)")

        # ---- glass TRAINING: fused taped-DFS adjoint (r5) ----
        # The wavefront backward now runs on-chip (kernels/
        # wavefront_grad.py): the forward DFS is replayed writing popped
        # nodes to an HBM tape, then swept in reverse with a mirrored
        # cotangent stack. r4 priced this path at 0.01 Mrays/s through
        # XLA autodiff of the fixed-trip replay; the fused adjoint is the
        # VERDICT r04 task #1 fix. Grad parity vs XLA autodiff is pinned
        # in tests/test_wavefront_grad.py.
        from raytracingengine_tpu.kernels.wavefront_trace import wavefront_trace

        try:
            for gl_res in (256, 1080):
                if gl_res == 256:
                    gw, gh = 256, 256
                else:
                    gw, gh = 1920, 1080
                gts, gtc = glass_sphere_scene(width=gw, height=gh, spp=1)
                gto, gtd = gtc.rays_for_pixels(*gtc.pixel_grid())
                gt_cfg = RenderConfig()  # march shadows, lossless budget
                gt_params, gt_static = partition(gts)

                def glass_loss(p, _o=gto, _d=gtd, _s=gt_static, _c=gt_cfg):
                    fl = flatten_scene(combine(p, _s))
                    img = wavefront_trace(fl, _o, _d, _c)
                    return jnp.mean(img * img)

                ggf = jax.jit(jax.value_and_grad(glass_loss))
                dt = timed(lambda: ggf(gt_params)[0],
                           label=f"glass fwd+bwd @{gl_res}")
                key = f"glass_train_{gl_res}_mrays_s"
                detail[key] = round(gw * gh / dt / 1e6, 2)
                log(f"glass fwd+bwd @{gl_res}: {dt*1e3:.1f} ms/step -> "
                    f"{detail[key]} Mrays/s (fused taped-DFS adjoint)")
            detail["glass_train_backward_engine"] = "fused_taped_dfs_adjoint"
        except Exception as e:  # never lose the headline to this line
            log(f"glass fwd+bwd bench failed: {e!r}")
            detail["glass_train_backward_engine"] = "failed"

        # ---- config #5 single chip: 4K 64-sphere 4-light stress ----
        # pad_multiple=None: the builder's default 128 exists for prim-axis
        # sharding divisibility and would pad LIGHTS 4 -> 128, multiplying
        # shadow work 32x.
        ss, sc = stress_scene(n_spheres=64, n_lights=4, width=3840, height=2160,
                              pad_multiple=None)
        scfg = RenderConfig(shadow_mode="binary", use_pallas=True,
                            chunk_size=3840 * 2160)
        sfwd = jax.jit(lambda s: jnp.sum(render_hdr(s, sc, scfg)))
        dt = timed(lambda: sfwd(ss), label="4K stress 64 spheres 4 lights")
        detail["stress_4k_mrays_s"] = round(3840 * 2160 / dt / 1e6, 1)
        log(f"4K stress: {dt*1e3:.1f} ms/frame -> {detail['stress_4k_mrays_s']} Mrays/s")

        # ---- dense mesh: 6,016 triangles @512^2 ----
        ds, dc = dense_mesh_scene(width=512, height=512, spp=1)
        dcfg = RenderConfig(shadow_mode="binary", use_pallas=True,
                            chunk_size=512 * 512)
        dfwd = jax.jit(lambda s: jnp.sum(render_hdr(s, dc, dcfg)))
        dt = timed(lambda: dfwd(ds), label="dense mesh 6016 tris @512^2")
        detail["dense_mesh_512_mrays_s"] = round(512 * 512 / dt / 1e6, 2)
        log(f"dense mesh: {dt*1e3:.1f} ms/frame -> "
            f"{detail['dense_mesh_512_mrays_s']} Mrays/s "
            f"(treelet scan, 6017 prims; single dispatch incl. ~28 ms tunnel)")

        # ---- dense mesh, dispatch-amortized: spp=8 in one dispatch ----
        # A single 512^2 dispatch is dominated by the ~28 ms tunnel
        # round-trip (measured floor: a trivial jnp.sum dispatch costs the
        # same 28 ms wall). The spp=8 render runs 8 sample passes inside ONE
        # dispatch (in-kernel AA sampler), so its per-ray rate reflects
        # device time the way a production multi-frame loop would.
        ds8, dc8 = dense_mesh_scene(width=512, height=512, spp=8)
        dfwd8 = jax.jit(lambda s: jnp.sum(render_hdr(s, dc8, dcfg)))
        dt = timed(lambda: dfwd8(ds8), label="dense mesh spp=8 @512^2")
        detail["dense_mesh_spp8_512_mrays_s"] = round(
            512 * 512 * 8 / dt / 1e6, 2
        )
        log(f"dense mesh spp=8: {dt*1e3:.1f} ms -> "
            f"{detail['dense_mesh_spp8_512_mrays_s']} Mrays/s (amortized)")

        # ---- dense mesh TRAINING: fwd+bwd through the BLOCKED adjoint ----
        # VERDICT r03 task #1: the fused backward now covers dense meshes
        # (chain_grad_pallas_blocked — per-depth shade-vjp + winner-masked
        # per-block hit pullback). This line is the first recorded number
        # for training a >512-primitive scene on-chip. Rays are patch-
        # swizzled like the render pipeline's (row-major order hands each
        # kernel tile a 512x2 strip — device-profiled 3x slower scans).
        from raytracingengine_tpu.kernels.chain_trace import tile_layout as _tl
        from raytracingengine_tpu.render.pipeline import _swizzle_perm as _sp

        _dpx, _dpy = dc.pixel_grid()
        _dperm, _ = _sp(512, 512, *_tl(flatten_scene(ds).n_triangles)[1])
        do_, dd_ = dc.rays_for_pixels(_dpx[_dperm], _dpy[_dperm])
        d_params, d_static = partition(ds)

        def dense_loss(p):
            fl = flatten_scene(combine(p, d_static))
            img = cg.chain_trace_fused(fl, do_, dd_, dcfg)
            return jnp.mean(img * img)

        dgf = jax.jit(jax.value_and_grad(dense_loss))
        dt = timed(lambda: dgf(d_params)[0], label="dense mesh fwd+bwd @512^2")
        detail["dense_mesh_train_512_mrays_s"] = round(512 * 512 / dt / 1e6, 2)
        log(f"dense mesh fwd+bwd: {dt*1e3:.1f} ms/step -> "
            f"{detail['dense_mesh_train_512_mrays_s']} Mrays/s (blocked adjoint)")

        # ---- dense mesh, scan-amortized: 8 frames in one dispatch ----
        # The single-dispatch line above cannot exceed 262144 rays / 28 ms
        # = 9.4 Mrays/s even with ZERO device work (the tunnel's measured
        # dispatch floor, PROFILE.md §4). A jitted 8-frame animation loop
        # (tiny camera dolly per frame, lax.scan — the same shape as the
        # headline's training loop) amortizes the dispatch like any real
        # multi-frame workload and reflects device time.
        from raytracingengine_tpu.kernels.chain_trace import (
            chain_trace_pallas, tile_layout,
        )
        from raytracingengine_tpu.render.pipeline import _swizzle_perm

        dflat = flatten_scene(ds)
        dpx, dpy = dc.pixel_grid()
        dperm, _ = _swizzle_perm(512, 512, *tile_layout(dflat.n_triangles)[1])
        dso, dsd = dc.rays_for_pixels(dpx[dperm], dpy[dperm])

        @jax.jit
        def dense_frames(fl):
            def frame(carry, i):
                o_i = dso.at[:, 2].add(i * 1e-3)  # dolly: distinct frames
                return carry + jnp.sum(
                    chain_trace_pallas(fl, o_i, dsd, dcfg)
                ), None

            acc, _ = jax.lax.scan(frame, 0.0, jnp.arange(8.0))
            return acc

        dt = timed(lambda: dense_frames(dflat),
                   label="dense mesh 8-frame scan loop @512^2")
        detail["dense_mesh_scanloop_mrays_s"] = round(
            512 * 512 * 8 / dt / 1e6, 2
        )
        log(f"dense mesh scan loop: {dt/8*1e3:.1f} ms/frame -> "
            f"{detail['dense_mesh_scanloop_mrays_s']} Mrays/s (amortized)")

        # ---- dense mesh, worst-case authoring order (hash-order OBJ) ----
        # Same geometry, triangle list randomly shuffled: block culling is
        # useless in authoring order, so throughput here measures the
        # adaptive spatial reorder (pack_forward_tables) doing its job.
        ss2, _ = dense_mesh_scene(width=512, height=512, spp=1, scramble=7)
        dt = timed(lambda: dfwd(ss2), label="dense mesh scrambled order")
        detail["dense_mesh_scrambled_mrays_s"] = round(512 * 512 / dt / 1e6, 2)
        log(f"dense mesh (scrambled OBJ order): {dt*1e3:.1f} ms/frame -> "
            f"{detail['dense_mesh_scrambled_mrays_s']} Mrays/s")

        # ---- streamed mesh: 50,800 triangles @512^2 (HBM-streamed) ----
        # Past MAX_PRIMS=8192 the triangle tables no longer fit SMEM; the
        # chain kernel DMAs [STREAM_ROWS, TRI_BLOCK] windows from HBM per
        # non-culled block (chain_trace.chain_trace_streamed_pallas, r5).
        # Rounds 1-4 dropped such scenes to the ~100x-slower XLA path.
        sts, stc = dense_mesh_scene(width=512, height=512, spp=1,
                                    ni=128, nj=200)
        stn = flatten_scene(sts).n_triangles
        stfwd = jax.jit(lambda s: jnp.sum(render_hdr(s, stc, dcfg)))
        dt = timed(lambda: stfwd(sts), label=f"streamed mesh {stn} tris @512^2")
        detail["streamed_mesh_tris"] = int(stn)
        detail["streamed_mesh_512_mrays_s"] = round(512 * 512 / dt / 1e6, 2)
        log(f"streamed mesh ({stn} tris): {dt*1e3:.1f} ms/frame -> "
            f"{detail['streamed_mesh_512_mrays_s']} Mrays/s")

        # ---- streamed mesh TRAINING: fwd+bwd past SMEM residency ----
        # chain_grad.chain_grad_pallas_streamed (r5): the blocked adjoint
        # with triangle windows DMA'd from HBM and cotangents accumulated
        # by read-modify-write DMA — every scene that renders fused
        # trains fused (grad parity pinned in tests/test_streamed.py).
        _stperm, _ = _sp(512, 512, *_tl(stn)[1])
        sto_, std_ = stc.rays_for_pixels(
            *(g[_stperm] for g in stc.pixel_grid())
        )
        st_params, st_static = partition(sts)

        def streamed_loss(p):
            fl = flatten_scene(combine(p, st_static))
            img = cg.chain_trace_fused(fl, sto_, std_, dcfg)
            return jnp.mean(img * img)

        stgf = jax.jit(jax.value_and_grad(streamed_loss))
        dt = timed(lambda: stgf(st_params)[0],
                   label=f"streamed mesh fwd+bwd {stn} tris @512^2")
        detail["streamed_mesh_train_512_mrays_s"] = round(
            512 * 512 / dt / 1e6, 2
        )
        log(f"streamed mesh fwd+bwd: {dt*1e3:.1f} ms/step -> "
            f"{detail['streamed_mesh_train_512_mrays_s']} Mrays/s "
            f"(streamed adjoint)")

        # ---- distribution composition: mesh-of-1 shard_map + kernels ----
        try:
            from raytracingengine_tpu.parallel.mesh import make_mesh
            from raytracingengine_tpu.parallel.sharded import render_hdr_sharded

            mesh = make_mesh(n_ray_shards=1)
            mcfg = RenderConfig(shadow_mode="binary", use_pallas=True,
                                chunk_size=rays_1080)
            ms, mc = head_box_scene(width=width, height=height, spp=1)
            mfwd = jax.jit(lambda s: jnp.sum(render_hdr_sharded(s, mc, mcfg, mesh)))
            dt = timed(lambda: mfwd(ms), label="mesh-of-1 shard_map + kernels @1080p")
            detail["sharded_mesh1_mrays_s"] = round(rays_1080 / dt / 1e6, 1)
            log(f"mesh-of-1 + kernels: {dt*1e3:.1f} ms/frame -> "
                f"{detail['sharded_mesh1_mrays_s']} Mrays/s")
        except Exception as e:  # never lose the headline to the extra line
            log(f"mesh-of-1 bench failed: {e!r}")
            detail["sharded_mesh1_mrays_s"] = None

    except Exception as e:
        log(f"secondary bench sections aborted: {e!r}")

    detail["baseline_rays_s"] = _measured_baseline()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_DETAIL_r05.json")
    # Merge over any previous record so an aborted secondary section
    # can't erase numbers an earlier complete run already measured.
    merged = {}
    try:
        with open(out) as f:
            merged = json.load(f)
    except Exception:
        pass
    merged.update(detail)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    log(f"detail -> {out}")

    print(
        json.dumps(
            {
                "metric": "fwd+bwd rays/s/chip @1080p depth-10 "
                          "(HEAD box scene, fused fwd+adjoint kernels, "
                          "jitted 8-step training loop)",
                "value": round(bwd_rays, 1),
                "unit": "rays/s",
                "vs_baseline": round(bwd_rays / _measured_baseline(), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
