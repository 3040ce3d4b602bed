"""Scene-level gradient comparison: fused kernels vs XLA autodiff on TPU.

FlatScene carries redundant derived triangle/plane fields; the Pallas
kernels and the XLA integrator read different subsets, so leafwise grads
at FlatScene level are NOT comparable (each implementation's cotangent
lands on the fields it read). Comparing at the user-facing Scene-parameter
level (inverse.partition) pulls both back through the same flatten, which
is the valid check — and the one training actually uses.
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
from raytracingengine_tpu.kernels.chain_grad import chain_trace_fused  # noqa: E402
from raytracingengine_tpu.kernels.chain_trace import TILE  # noqa: E402
from raytracingengine_tpu.inverse import combine, partition  # noqa: E402
from raytracingengine_tpu.render.config import RenderConfig  # noqa: E402
from raytracingengine_tpu.render.integrator import integrate_chain  # noqa: E402
from raytracingengine_tpu.scenes.builders import head_box_scene  # noqa: E402


def main():
    w, h = 128, TILE // 128
    cfg = RenderConfig(shadow_mode="binary")
    scene, camera = head_box_scene(width=w, height=h, spp=1)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    params, static = partition(scene)

    def loss(p, use_fused):
        fl = flatten_scene(combine(p, static))
        img = (
            chain_trace_fused(fl, o, d, cfg)
            if use_fused
            else integrate_chain(fl, o, d, cfg)
        )
        return jnp.mean(img * img)

    gf = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    gx = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    paths_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    leaves_x = jax.tree.leaves(gx)
    bad = 0
    for (path, a), b in zip(paths_f, leaves_x):
        an, bn = np.asarray(a), np.asarray(b)
        if an.size == 0:
            continue
        md = np.abs(an - bn).max()
        scale = max(np.abs(bn).max(), np.abs(an).max())
        rel = md / (scale + 1e-12)
        flag = ""
        if rel > 5e-2 and md > 1e-6:
            flag = "  <-- BAD"
            bad += 1
        print(f"{jax.tree_util.keystr(path):45s} maxdiff={md:.4e} scale={scale:.4e} rel={rel:.3f}{flag}")
    print("BAD leaves:", bad)


if __name__ == "__main__":
    main()
