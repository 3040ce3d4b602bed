"""Per-leaf comparison of the fused backward kernel vs XLA autodiff on TPU.

tpu_smoke.py r03 found chain_grad diverging on the real chip (max rel
9.3e11) while interpret-mode tests pass. This narrows down which leaf and
which part of the kernel is wrong.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from raytracingengine_tpu.utils.tpu import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracingengine_tpu.geometry.intersect import flatten_scene  # noqa: E402
from raytracingengine_tpu.kernels.chain_grad import (  # noqa: E402
    chain_grad_pallas,
    chain_trace_fused,
    pack_scene_tables,
)
from raytracingengine_tpu.kernels.chain_trace import TILE, chain_trace_pallas  # noqa: E402
from raytracingengine_tpu.render.config import RenderConfig  # noqa: E402
from raytracingengine_tpu.render.integrator import integrate_chain  # noqa: E402
from raytracingengine_tpu.scenes.builders import head_box_scene  # noqa: E402


def main():
    w, h = 128, TILE // 128
    cfg = RenderConfig(shadow_mode="binary")
    scene, camera = head_box_scene(width=w, height=h, spp=1)
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())

    # 0. forward parity of the two backward inputs
    img_k = jax.jit(lambda: chain_trace_pallas(flat, o, d, cfg))()
    img_x = jax.jit(lambda: integrate_chain(flat, o, d, cfg))()
    print("fwd max|diff|:", float(jnp.max(jnp.abs(img_k - img_x))))

    # 1. raw table cotangents from the grad kernel vs XLA vjp through the
    #    same table-level function.
    gbar = 2.0 * img_x  # cotangent of sum(img^2)

    tg, go, gd = jax.jit(
        lambda: chain_grad_pallas(flat, o, d, gbar, cfg)
    )()
    names = ["sph", "pl", "tri", "mat", "light"]
    for n, g in zip(names, tg):
        gn = np.asarray(g)
        print(f"kernel d{n}: max|g|={np.abs(gn).max():.4e} l1={np.abs(gn).sum():.4e} finite={np.isfinite(gn).all()}")
    print(f"kernel dO: max={float(jnp.max(jnp.abs(go))):.4e}  dD: max={float(jnp.max(jnp.abs(gd))):.4e}")

    # XLA reference at the same granularity: vjp of integrate_chain wrt flat,
    # pulled forward through pack to table space is awkward; instead compare
    # leaf grads end-to-end.
    def loss_fused(fl, oo, dd):
        return jnp.sum(chain_trace_fused(fl, oo, dd, cfg) ** 2)

    def loss_xla(fl, oo, dd):
        return jnp.sum(integrate_chain(fl, oo, dd, cfg) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2), allow_int=True))(flat, o, d)
    gr = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2), allow_int=True))(flat, o, d)
    leaves_f, tree = jax.tree.flatten(gf)
    leaves_r, _ = jax.tree.flatten(gr)
    paths = jax.tree_util.tree_flatten_with_path(gf)[0]
    for (path, a), b in zip(paths, leaves_r):
        if not (jnp.issubdtype(a.dtype, jnp.floating) and a.size):
            continue
        an, bn = np.asarray(a), np.asarray(b)
        md = np.abs(an - bn).max()
        scale = np.abs(bn).max()
        flag = "  <-- BAD" if md > 5e-2 * (scale + 1e-6) else ""
        print(f"{jax.tree_util.keystr(path):40s} maxdiff={md:.4e} ref_max={scale:.4e}{flag}")


if __name__ == "__main__":
    main()
