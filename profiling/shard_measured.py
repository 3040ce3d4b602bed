"""MEASURED per-shard imbalance on the real chip (VERDICT r04 task #6).

SCALING_r04 predicted per-shard efficiency from a work MODEL (live-depth
tile costs). This script closes the model->measurement gap available on
one chip: it dispatches each of the 8 shards' actual ray sets as a
separate device-timed run of the real fused kernel and reports measured
per-shard device times (max/mean), contiguous vs round-robin patch
assignment, next to the model's prediction.

What this measures: the per-shard WORK a static 8-way split assigns,
executed by the real kernel on real hardware — i.e. the compute-side
scaling ceiling. What it cannot measure here: collective overhead and
launch skew of a real 8-chip run (this image exposes one chip).

Run: python profiling/shard_measured.py   (writes SCALING_r05.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracingengine_tpu.utils.tpu import setup_compile_cache

setup_compile_cache()

import numpy as np

N_SHARDS = 8


def shard_rays(camera, n_tris, round_robin):
    """Per-shard (px, py) under the sharded renderer's actual split
    (parallel/sharded.py): swizzle (optionally round-robin patch deal),
    pad, contiguous slice per shard."""
    from raytracingengine_tpu.kernels.chain_trace import tile_layout
    from raytracingengine_tpu.render.pipeline import _swizzle_perm

    pw, ph = tile_layout(n_tris)[1]
    perm, _ = _swizzle_perm(
        camera.width, camera.height, pw, ph,
        round_robin=N_SHARDS if round_robin else None,
    )
    r = camera.num_pixels
    px = np.asarray(perm, np.int64) % camera.width
    py = np.asarray(perm, np.int64) // camera.width
    local = -(-r // N_SHARDS)
    pad = N_SHARDS * local - r
    px = np.pad(px, (0, pad)).reshape(N_SHARDS, local)
    py = np.pad(py, (0, pad)).reshape(N_SHARDS, local)
    return px, py


def measure_scene(name, scene, camera, cfg):
    import jax
    import jax.numpy as jnp

    from raytracingengine_tpu.geometry.intersect import flatten_scene
    from raytracingengine_tpu.kernels.chain_trace import chain_trace_pallas
    from raytracingengine_tpu.utils.profiling import profile_step

    flat = flatten_scene(scene)
    fn = jax.jit(
        lambda fl, o, d: jnp.sum(chain_trace_pallas(fl, o, d, cfg))
    )
    out = {}
    for label, rr in (("contiguous", False), ("round_robin", True)):
        px, py = shard_rays(camera, flat.n_triangles, rr)
        dev_ms = []
        for s in range(N_SHARDS):
            o, d = camera.rays_for_pixels(
                jnp.asarray(px[s]), jnp.asarray(py[s])
            )
            jax.block_until_ready(fn(flat, o, d))  # compile once (shared)
            rep = profile_step(lambda: jax.block_until_ready(fn(flat, o, d)))
            dev_ms.append(rep.device_total_ms)
            print(f"  {name} {label} shard {s}: {rep.device_total_ms:.2f} ms "
                  f"device", flush=True)
        dev = np.asarray(dev_ms)
        out[label] = {
            "per_shard_device_ms": [round(float(x), 2) for x in dev],
            "max_over_mean": round(float(dev.max() / dev.mean()), 4),
            "measured_efficiency": round(float(dev.mean() / dev.max()), 4),
        }
    return out


def main() -> None:
    import jax  # noqa: F401

    from raytracingengine_tpu.render.config import RenderConfig
    from raytracingengine_tpu.scenes.builders import head_box_scene, stress_scene

    t0 = time.time()
    results = {}
    scene, cam = head_box_scene(width=1920, height=1080, spp=1)
    results["head_box_1080p"] = measure_scene(
        "head_box_1080p", scene, cam,
        RenderConfig(shadow_mode="binary"),
    )
    ss, sc = stress_scene(n_spheres=64, n_lights=4, width=3840, height=2160,
                          pad_multiple=None)
    results["stress_4k"] = measure_scene(
        "stress_4k", ss, sc, RenderConfig(shadow_mode="binary"),
    )

    # Model columns from the r4 work-distribution study, for comparison.
    model = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "SCALING_r04.json")) as f:
            r4 = json.load(f)
        for sc_ in r4.get("scenes", []):
            m = sc_["tile_cost_model"]["early_exit_depth(max_per_tile)"]
            model[sc_["scene"]] = {
                k: {"predicted_efficiency": v["predicted_efficiency"]}
                for k, v in m.items()
            }
    except Exception:
        pass

    doc = {
        "what": "Per-shard DEVICE TIME of each shard's actual ray set, "
                "dispatched separately through the real fused chain kernel "
                "on the one physical chip — the measured compute-side "
                "scaling ceiling of the static 8-way split. 'model' columns "
                "are SCALING_r04's live-depth work model for comparison.",
        "caveat": "One physical chip: collective overhead and launch skew "
                  "of a real 8-chip run are not included. measured_efficiency "
                  "= mean/max of per-shard device ms.",
        "n_shards": N_SHARDS,
        "measured": results,
        "model_r04": model,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r05.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))
    print(f"wrote {out} in {time.time()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
