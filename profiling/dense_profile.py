"""Round-5 kernel profiles (VERDICT r04 task #3): the blocked adjoint
and the treelet forward on the dense mesh, with ablations that attribute
device time to closest-hit scans vs shadow scans vs overheads.

Writes per-op device tables + ablation rows to stdout (curated into
PROFILE.md §6) and profiling/dense_profile.json.

Run: python profiling/dense_profile.py
"""

from __future__ import annotations

import dataclasses
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
import numpy as np

from raytracingengine_tpu.geometry.intersect import flatten_scene
from raytracingengine_tpu.inverse import combine, partition
from raytracingengine_tpu.kernels import chain_grad as cg
from raytracingengine_tpu.kernels.chain_trace import chain_trace_pallas, tile_layout
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.pipeline import _swizzle_perm
from raytracingengine_tpu.scenes.builders import dense_mesh_scene
from raytracingengine_tpu.utils.profiling import profile_step

OUT = {}


def timed_dev(name, fn, arg_perturb, n=5):
    """Median wall over n perturbed-input runs + one device trace."""
    jax.block_until_ready(fn(arg_perturb(0)))
    ts = []
    for i in range(1, n + 1):
        a = arg_perturb(i)
        t0 = time.time()
        jax.block_until_ready(fn(a))
        ts.append((time.time() - t0) * 1e3)
    rep = profile_step(lambda: jax.block_until_ready(fn(arg_perturb(0))))
    med = statistics.median(ts)
    print(f"{name}: wall {med:.1f} ms | device {rep.device_total_ms:.1f} ms")
    for op, ms in rep.top_ops(4):
        print(f"    {ms:9.3f} ms  {op[:70]}")
    OUT[name] = {
        "wall_ms_median": round(med, 2),
        "device_ms": round(rep.device_total_ms, 2),
        "top_ops": [[op[:80], round(ms, 3)] for op, ms in rep.top_ops(6)],
    }
    return med, rep.device_total_ms


def main() -> None:
    ds, dc = dense_mesh_scene(width=512, height=512, spp=1)
    flat = flatten_scene(ds)
    dpx, dpy = dc.pixel_grid()
    perm, _ = _swizzle_perm(512, 512, *tile_layout(flat.n_triangles)[1])
    o, d = dc.rays_for_pixels(dpx[perm], dpy[perm])

    def perturb(fl, i):
        return dataclasses.replace(
            fl, tri_v0=fl.tri_v0 * (1.0 + 1e-7 * i)
        )

    # ---- forward: treelet scan, full config and ablations ----
    for name, cfg in [
        ("fwd_2lights", RenderConfig(shadow_mode="binary")),
        ("fwd_depth1", RenderConfig(shadow_mode="binary", max_depth=1)),
    ]:
        f = jax.jit(lambda fl, _c=cfg: jnp.sum(chain_trace_pallas(fl, o, d, _c)))
        timed_dev(name, f, lambda i: perturb(flat, i))

    # lights ablation: deactivating both lights removes the in-bounce
    # shadow any-hit scans (dead-light gating), isolating closest-hit
    # scan cost.
    ds_nl = dataclasses.replace(ds, lights=dataclasses.replace(
        ds.lights, active=jnp.zeros_like(ds.lights.active)
    ))
    flat_nl = flatten_scene(ds_nl)
    cfgb = RenderConfig(shadow_mode="binary")
    f_nl = jax.jit(lambda fl: jnp.sum(chain_trace_pallas(fl, o, d, cfgb)))
    timed_dev("fwd_lights_inactive", f_nl, lambda i: perturb(flat_nl, i))

    # ---- backward: blocked adjoint fwd+bwd ----
    params, static = partition(ds)

    def dense_loss(p):
        fl = flatten_scene(combine(p, static))
        img = cg.chain_trace_fused(fl, o, d, cfgb)
        return jnp.mean(img * img)

    dgf = jax.jit(jax.value_and_grad(dense_loss))

    def perturb_params(i):
        return jax.tree.map(
            lambda a: a * (1.0 + 1e-7 * i)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    wall_tr, dev_tr = timed_dev(
        "train_fwd_bwd", lambda p: dgf(p)[0], perturb_params
    )
    wall_f, dev_f = OUT["fwd_2lights"]["wall_ms_median"], OUT[
        "fwd_2lights"]["device_ms"]
    OUT["backward_over_forward_device"] = round(
        (dev_tr - dev_f) / max(dev_f, 1e-9), 2
    )
    print(f"backward/forward device ratio: "
          f"{OUT['backward_over_forward_device']} "
          f"(train {dev_tr:.1f} ms vs fwd {dev_f:.1f} ms)")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "dense_profile.json")
    with open(out, "w") as f:
        json.dump(OUT, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
