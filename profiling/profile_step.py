"""Decompose the 1080p fwd+bwd training step into device-timed pieces.

Produces the numbers behind PROFILE.md: wall time of (a) the fused
forward kernel alone, (b) the fused backward kernel alone, (c) the
table->scene pullback, (d) the full jitted value_and_grad step, plus an
analytic VPU-op roofline for the HEAD box scene so the headline rays/s
has a speed-of-light denominator.

Optionally captures a jax.profiler trace (--trace) — the tunneled `axon`
backend may not support device tracing; the script says which.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from raytracingengine_tpu.utils.tpu import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raytracingengine_tpu.geometry.intersect import flatten_scene  # noqa: E402
from raytracingengine_tpu.inverse import combine, partition  # noqa: E402
from raytracingengine_tpu.kernels import chain_grad as cg  # noqa: E402
from raytracingengine_tpu.kernels.chain_trace import chain_trace_pallas  # noqa: E402
from raytracingengine_tpu.render.config import RenderConfig  # noqa: E402
from raytracingengine_tpu.scenes.builders import head_box_scene  # noqa: E402


def timeit(fn, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    w, h = args.width, args.height
    scene, camera = head_box_scene(width=w, height=h, spp=1)
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    cfg = RenderConfig(shadow_mode="binary")
    params, static = partition(scene)
    rays = w * h

    # (a) primal fused kernel alone
    fwd = jax.jit(lambda oo, dd: jnp.sum(chain_trace_pallas(flat, oo, dd, cfg)))
    t_fwd, _ = timeit(lambda: fwd(o, d))
    print(f"primal kernel:        {t_fwd*1e3:8.1f} ms  ({rays/t_fwd/1e6:7.1f} Mrays/s)")

    # (b) backward kernel alone (fixed cotangent)
    gbar = jnp.ones((rays, 3), jnp.float32)
    bwd = jax.jit(lambda oo, dd: jax.tree.map(
        jnp.sum, cg.chain_grad_pallas(flat, oo, dd, gbar, cfg)[0]))
    t_bwd, _ = timeit(lambda: bwd(o, d))
    print(f"backward kernel:      {t_bwd*1e3:8.1f} ms  ({rays/t_bwd/1e6:7.1f} Mrays/s)")

    # (c) table->scene pullback alone
    def pullback(fl, cots):
        _, vjp = jax.vjp(cg.pack_scene_tables, fl)
        return vjp(cots)

    tables = cg.pack_scene_tables(flat)
    cots = tuple(jnp.ones_like(t) for t in tables)
    pb = jax.jit(lambda: jax.tree.map(
        lambda x: jnp.sum(x) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        pullback(flat, cots)))
    t_pb, _ = timeit(lambda: pb())
    print(f"pack pullback:        {t_pb*1e3:8.1f} ms")

    # (d) full training step
    def loss(p):
        fl = flatten_scene(combine(p, static))
        img = cg.chain_trace_fused(fl, o, d, cfg)
        return jnp.mean(img * img)

    gf = jax.jit(jax.value_and_grad(loss))
    t_step, _ = timeit(lambda: gf(params))
    print(f"value_and_grad step:  {t_step*1e3:8.1f} ms  ({rays/t_step/1e6:7.1f} Mrays/s)")
    print(f"  step - (fwd+bwd kernels) overhead: {(t_step-t_fwd-t_bwd)*1e3:.1f} ms")

    if args.trace:
        import glob
        import os
        tdir = "/tmp/jax_trace"
        os.makedirs(tdir, exist_ok=True)
        try:
            with jax.profiler.trace(tdir):
                jax.block_until_ready(gf(params))
            files = glob.glob(tdir + "/**/*", recursive=True)
            print("trace files:")
            for f in sorted(files):
                if os.path.isfile(f):
                    print("  ", f, os.path.getsize(f))
        except Exception as e:
            print(f"jax.profiler.trace FAILED on this backend: {e!r}")


if __name__ == "__main__":
    main()
