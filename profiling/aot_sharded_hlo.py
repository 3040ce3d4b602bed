"""AOT-compile the 8-chip sharded training step (shard_map + fused
kernels) for a v5e:2x4 topology — no hardware needed, the TPU compiler
accepts a compile-only topology — and inspect the optimized HLO schedule
for the scene-gradient all-reduce's position relative to backward compute.

This is the psum/backward-overlap evidence for PROFILE.md: the optimized
module shows whether XLA emitted an async all-reduce-start/done pair and
what it scheduled between them.

Usage: python profiling/aot_sharded_hlo.py [--out /tmp/sharded_8chip.hlo]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

from raytracingengine_tpu.utils.tpu import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from raytracingengine_tpu.inverse import partition  # noqa: E402
from raytracingengine_tpu.parallel.sharded import make_sharded_loss  # noqa: E402
from raytracingengine_tpu.render.config import RenderConfig  # noqa: E402
from raytracingengine_tpu.scenes.builders import head_box_scene  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sharded_8chip.hlo")
    ap.add_argument("--topology", default="v5e:2x4")
    args = ap.parse_args()

    topo = topologies.get_topology_desc(args.topology, "tpu")
    devs = list(topo.devices)
    print(f"topology: {args.topology} -> {len(devs)} x {devs[0].device_kind}")
    mesh = Mesh(devs, ("rays",))

    w, h = 1920, 1080
    scene, cam = head_box_scene(width=w, height=h, spp=1)
    o, d = cam.rays_for_pixels(*cam.pixel_grid())
    cfg = RenderConfig(shadow_mode="binary", use_pallas=True)
    params, static = partition(scene)
    # Pad rays to divide the mesh (1920*1080 % 8 == 0 already).
    assert o.shape[0] % 8 == 0

    loss = make_sharded_loss(static, cfg, mesh)
    target = jnp.zeros((o.shape[0], 3), o.dtype)

    repl = NamedSharding(mesh, P())
    ray_sh = NamedSharding(mesh, P("rays"))
    p_sh = jax.tree.map(lambda _: repl, params)
    fn = jax.jit(
        jax.value_and_grad(loss),
        in_shardings=(p_sh, ray_sh, ray_sh, ray_sh),
        out_shardings=(repl, p_sh),
    )
    shp = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
    lowered = fn.lower(
        jax.tree.map(shp, params), shp(o), shp(d), shp(target)
    )
    print("lowered; compiling for 8 chips ...", flush=True)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    lines = txt.splitlines()
    print(f"optimized HLO: {len(lines)} lines -> {args.out}")

    # Locate collectives and the custom calls (Mosaic kernels) around them.
    interesting = re.compile(
        r"all-reduce|reduce-scatter|all-gather|collective|custom-call|tpu_custom_call"
    )
    for i, l in enumerate(lines):
        if re.search(r"all-reduce|reduce-scatter|all-gather", l):
            print(f"{i:6d}: {l.strip()[:180]}")
    # Entry computation schedule region: report what sits between
    # all-reduce-start and all-reduce-done.
    starts = [i for i, l in enumerate(lines) if "all-reduce-start" in l]
    dones = [i for i, l in enumerate(lines) if "all-reduce-done" in l]
    if starts and dones:
        s, e = starts[0], dones[0]
        between = [l for l in lines[s + 1:e] if "=" in l]
        print(f"\nasync all-reduce: start line {s}, done line {e}, "
              f"{len(between)} instructions scheduled between them")
        for l in between[:10]:
            print("   ", l.strip()[:160])


if __name__ == "__main__":
    main()
