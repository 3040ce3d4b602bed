"""Glass-forward variance study (VERDICT r04 task #2).

The round-4 driver bench measured the glass @1080p wavefront section at
150.6 ms wall where the committed run had 65.7 ms — a 2.3x swing on an
identical program. This script runs the identical bench section N times
back-to-back, recording per-iteration WALL time and, for a subset of
iterations, DEVICE time from a `jax.profiler` trace, to separate:
  (a) device-side variance (kernel while-loop trip counts, DVFS), from
  (b) dispatch-side variance (the ~28 ms tunnel round-trip this image's
      remote TPU backend costs per dispatch, PROFILE.md §4).

Usage:  python profiling/glass_variance.py [N]
Writes: stdout table + JSON to profiling/glass_variance.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracingengine_tpu.utils.tpu import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp

from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.pipeline import render_hdr
from raytracingengine_tpu.scenes.builders import glass_sphere_scene
from raytracingengine_tpu.utils.profiling import profile_step


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    width, height = 1920, 1080
    gs, gc = glass_sphere_scene(width=width, height=height, spp=1)
    gcfg = RenderConfig(use_pallas=True, chunk_size=width * height)
    gfwd = jax.jit(lambda s: jnp.sum(render_hdr(s, gc, gcfg)))

    # Warmup / compile (cached after first run).
    t0 = time.time()
    jax.block_until_ready(gfwd(gs))
    print(f"warmup (compile): {time.time() - t0:.1f}s", flush=True)

    wall_ms = []
    for i in range(n):
        t0 = time.time()
        jax.block_until_ready(gfwd(gs))
        wall_ms.append((time.time() - t0) * 1e3)
        print(f"  run {i:2d}: wall {wall_ms[-1]:7.1f} ms", flush=True)

    # Device-timed subset: a profiler trace per run (the trace itself
    # perturbs wall time, so these are kept separate from the pure-wall
    # loop above).
    dev_ms, dev_wall_ms = [], []
    for i in range(max(4, n // 2)):
        rep = profile_step(lambda: jax.block_until_ready(gfwd(gs)))
        if rep.device_total_ms > 0:
            dev_ms.append(rep.device_total_ms)
            dev_wall_ms.append(rep.wall_ms)
            print(f"  traced {i}: device {rep.device_total_ms:7.1f} ms "
                  f"(wall {rep.wall_ms:7.1f} ms)", flush=True)

    def stats(xs):
        return {
            "n": len(xs),
            "min": round(min(xs), 1),
            "median": round(statistics.median(xs), 1),
            "mean": round(statistics.mean(xs), 1),
            "max": round(max(xs), 1),
            "stdev": round(statistics.stdev(xs), 1) if len(xs) > 1 else 0.0,
        }

    out = {
        "scene": "glass_sphere 1920x1080 spp=1 march shadows",
        "wall_ms": stats(wall_ms),
        "wall_ms_runs": [round(x, 1) for x in wall_ms],
        "device_ms": stats(dev_ms) if dev_ms else None,
        "device_ms_runs": [round(x, 1) for x in dev_ms],
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "glass_variance.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
