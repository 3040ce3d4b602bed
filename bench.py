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

The headline is the forward+backward training step — value_and_grad of
an image loss w.r.t. every scene parameter — through the fused forward
AND fused checkpointed-adjoint backward kernels (kernels/chain_grad.py),
the metric BASELINE.json declares. The forward-only render rate is
reported to stderr.

The reference publishes no numbers (BASELINE.md), so the baseline is
MEASURED on this host: the reference engine built unmodified from
/root/reference (refbuild/build.sh) renders the identical HEAD scene at
1920x1080 spp=1 in 11.19 s -> 185,343 primary rays/s (OpenMP, all cores;
refbuild/baseline_measured.json). The 32-spp 1000x1000 run agrees
(186,771 rays/s over 171.3 s), so the figure is stable across configs.
`vs_baseline` divides our fwd+bwd step rate by that measured forward-only
rate — conservative, since the reference has no backward pass at all.

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
    fwd_rays = width * height * spp / dt
    print(
        f"forward: {dt*1e3:.1f} ms for {spp} frames @1080p "
        f"({dt*1e3/spp:.1f} ms/frame) -> {fwd_rays/1e6:.1f} Mrays/s",
        file=sys.stderr,
    )

    # Headline: fused forward+backward training step at 1080p spp=1.
    import raytracingengine_tpu.kernels.chain_grad as cg
    from raytracingengine_tpu.geometry.intersect import flatten_scene
    from raytracingengine_tpu.inverse import combine, partition

    scene_b, camera_b = head_box_scene(width=width, height=height, spp=1)
    o, d = camera_b.rays_for_pixels(*camera_b.pixel_grid())
    cfg_b = RenderConfig(shadow_mode="binary")
    params, static = partition(scene_b)

    def loss(p):
        fl = flatten_scene(combine(p, static))
        img = cg.chain_trace_fused(fl, o, d, cfg_b)
        return jnp.mean(img * img)

    gf = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    l, g = gf(params)
    _ = float(l)
    print(f"fwd+bwd warmup (incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    for _ in range(iters):
        l, g = gf(params)
        _ = float(l)
    dtb = (time.time() - t0) / iters
    bwd_rays = width * height / dtb
    print(
        f"fwd+bwd (fused kernels): {dtb*1e3:.1f} ms/step @1080p -> "
        f"{bwd_rays/1e6:.2f} Mrays/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "fwd+bwd rays/s/chip @1080p depth-10 "
                          "(HEAD box scene, fused fwd+adjoint kernels)",
                "value": round(bwd_rays, 1),
                "unit": "rays/s",
                "vs_baseline": round(bwd_rays / _measured_baseline(), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
