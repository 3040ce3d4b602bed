"""Benchmark: rays/s/chip at 1080p on the HEAD box scene.

Scene: the reference's HEAD main() scene (RaytracingEngine.cpp:216-290 —
12 box triangles, 5 planes, 2 lights), 1920x1080, full Whitted chain
(max depth 10, binary shadow visibility == the reference march on this
all-opaque scene).

Path measured: the production forward renderer — render_hdr with the
fused Pallas chain-trace kernel (kernels/chain_trace.py) — at spp=8, so
one compiled program traces 8 full frames (16.6M primary rays) per call.
Timing forces a host readback (this image's tunneled TPU backend reports
buffers ready before device completion) and amortizes the ~30 ms relay
round-trip across the 8 samples.

A forward+backward training-step number (value_and_grad w.r.t. every
scene parameter through the differentiable XLA path) is reported to
stderr at reduced resolution; making that pass speed-of-light (a fused
backward kernel) is tracked work.

The reference publishes no numbers (BASELINE.md). `vs_baseline`
compares against a generous estimate of the reference C++/OpenMP
engine's throughput on a 16-thread desktop CPU: ~2e6 primary rays/s
(SURVEY.md §3.2 cost model).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_RAYS_PER_S = 2.0e6


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from raytracingengine_tpu.utils.tpu import setup_compile_cache

    setup_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracingengine_tpu.render.config import RenderConfig
    from raytracingengine_tpu.render.pipeline import render_hdr
    from raytracingengine_tpu.scenes.builders import head_box_scene

    width, height, spp = 1920, 1080, 8
    scene, camera = head_box_scene(width=width, height=height, spp=spp)
    cfg = RenderConfig(
        shadow_mode="binary", use_pallas=True, chunk_size=width * height
    )

    fwd = jax.jit(lambda s: jnp.sum(render_hdr(s, camera, cfg)))
    t0 = time.time()
    v = float(fwd(scene))  # compile + run; float() forces readback
    print(f"forward warmup (incl. compile): {time.time()-t0:.1f}s  sum={v:.3f}",
          file=sys.stderr)
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        v = float(fwd(scene))
    dt = (time.time() - t0) / iters
    n_rays = width * height * spp
    fwd_rays = n_rays / dt
    print(
        f"forward: {dt*1e3:.1f} ms for {spp} frames @1080p "
        f"({dt*1e3/spp:.1f} ms/frame) -> {fwd_rays/1e6:.1f} Mrays/s",
        file=sys.stderr,
    )

    # fwd+bwd detail at reduced size (XLA differentiable path)
    try:
        from raytracingengine_tpu.inverse import combine, partition

        bw, bh = 480, 270
        scene_b, camera_b = head_box_scene(width=bw, height=bh, spp=1)
        cfg_b = RenderConfig(shadow_mode="binary", chunk_size=bw * bh)
        params, static = partition(scene_b)

        def loss(p):
            img = render_hdr(combine(p, static), camera_b, cfg_b)
            return jnp.mean(img * img)

        gf = jax.jit(jax.value_and_grad(loss))
        (l0, g0) = gf(params)
        _ = float(l0)
        t0 = time.time()
        for _ in range(2):
            l, g = gf(params)
            _ = float(l)
        dtb = (time.time() - t0) / 2
        print(
            f"fwd+bwd (XLA, {bw}x{bh}): {dtb*1e3:.1f} ms/step -> "
            f"{bw*bh/dtb/1e6:.2f} Mrays/s",
            file=sys.stderr,
        )
    except Exception as e:  # detail metric must not break the headline
        print(f"fwd+bwd detail failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "fwd rays/s/chip @1080p depth-10 (HEAD box scene, fused Pallas)",
                "value": round(fwd_rays, 1),
                "unit": "rays/s",
                "vs_baseline": round(fwd_rays / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
