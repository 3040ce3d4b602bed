"""Benchmark: forward+backward rays/s/chip at 1080p (BASELINE.json metric).

Scene: the reference's HEAD box scene (RaytracingEngine.cpp:216-290 — 12
box triangles, 5 planes, 2 lights) at 1920x1080, 1 spp, the full Whitted
chain (max depth 10) with shadows.

  * forward: exact-parity config (transmittance march, Scene.h:35-77)
  * forward+backward: value_and_grad of an L2-style scalar w.r.t. every
    scene parameter, with shadow_mode='binary' (identical pixel values on
    this all-opaque scene; see render/config.py) so the pass is
    reverse-mode differentiable.

The reference publishes no numbers (BASELINE.md). `vs_baseline` is
reported against a generous estimate of the reference C++/OpenMP engine's
primary-ray throughput on a 16-thread desktop CPU: ~2e6 primary rays/s
(SURVEY.md §3.2 cost model; a 1000x1000x32spp frame in ~16 s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline fwd+bwd number; detailed numbers go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from raytracingengine_tpu.utils.tpu import setup_compile_cache

BASELINE_RAYS_PER_S = 2.0e6  # estimated reference CPU throughput (see above)


def main() -> None:
    setup_compile_cache()

    from raytracingengine_tpu.inverse import partition, combine
    from raytracingengine_tpu.render.config import RenderConfig
    from raytracingengine_tpu.render.pipeline import render_hdr
    from raytracingengine_tpu.scenes.builders import head_box_scene

    width, height, spp = 1920, 1080, 1
    n_rays = width * height * spp
    scene, camera = head_box_scene(width=width, height=height, spp=spp)

    def timeit(fn, *args, iters=3):
        out = jax.block_until_ready(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.block_until_ready(fn(*args))
        return out, (time.perf_counter() - t0) / iters

    # Forward, parity config
    cfg_fwd = RenderConfig(chunk_size=129600)
    fwd = jax.jit(lambda s: render_hdr(s, camera, cfg_fwd))
    img, t_fwd = timeit(fwd, scene)
    fwd_rays = n_rays / t_fwd
    print(
        f"forward: {t_fwd*1e3:.1f} ms/frame, {fwd_rays/1e6:.2f} Mrays/s",
        file=sys.stderr,
    )

    # Forward + backward
    cfg_bwd = RenderConfig(chunk_size=129600, shadow_mode="binary")
    params, static = partition(scene)

    def loss_fn(p):
        img = render_hdr(combine(p, static), camera, cfg_bwd)
        return jnp.mean(img * img)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    (_, grads), t_bwd = timeit(grad_fn, params)
    bwd_rays = n_rays / t_bwd
    print(
        f"fwd+bwd: {t_bwd*1e3:.1f} ms/frame, {bwd_rays/1e6:.2f} Mrays/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "fwd+bwd rays/s/chip @1080p (HEAD box scene)",
                "value": round(bwd_rays, 1),
                "unit": "rays/s",
                "vs_baseline": round(bwd_rays / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
