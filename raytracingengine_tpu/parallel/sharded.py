"""Sharded rendering: shard_map over the device mesh.

Replaces the reference's OpenMP pixel loop (Scene.h:318-320) with a
`jax.shard_map` over a `Mesh`:

  * pixel blocks shard along `rays`; every chip traces its own rays,
  * the scene pytree is replicated along `rays` — and optionally its
    triangle block is sharded along `prims` (each chip intersects its
    triangle shard, winners combine via all_gather argmin inside
    `closest_hit`),
  * gradients w.r.t. replicated scene parameters are psum-reduced across
    the mesh automatically by shard_map's transpose. In the compiled
    8-chip program (PROFILE.md §5: AOT-compiled for a v5e:2x4 topology),
    XLA's all-reduce combiner merges ALL scene-gradient psums into ONE
    ~1.3 kB tuple all-reduce issued after the fused backward kernel —
    with a monolithic backward there is no residual compute to overlap
    it with, and at ~1 us on ICI vs a ~24 ms backward none is needed.

The image edge is padded so the ray axis divides evenly; padding pixels
trace real rays and are cropped on return.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from raytracingengine_tpu.core.camera import Camera
from raytracingengine_tpu.geometry.intersect import flatten_scene
from raytracingengine_tpu.parallel.mesh import PRIM_AXIS, RAY_AXIS
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.pipeline import _render_chunk, resolve_mode
from raytracingengine_tpu.scene import Scene


def scene_partition_specs(scene: Scene, shard_triangles: bool) -> Scene:
    """PartitionSpec pytree for a Scene: everything replicated except
    (optionally) the triangle block, sharded along PRIM_AXIS on dim 0."""

    def repl(_):
        return P()

    specs = jax.tree.map(repl, scene)
    if shard_triangles:
        tri_specs = jax.tree.map(lambda _: P(PRIM_AXIS), scene.triangles)
        specs = jax.tree_util.tree_map(
            lambda s: s, specs
        )  # copy container
        specs = specs.__class__(
            spheres=specs.spheres,
            planes=specs.planes,
            triangles=tri_specs,
            lights=specs.lights,
            has_transparency=scene.has_transparency,
        )
    return specs


def render_hdr_sharded(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    key: jnp.ndarray | None = None,
    mode: str | None = None,
) -> jnp.ndarray:
    """Full-frame sharded render -> [H, W, 3]. Jittable.

    Mesh axes: RAY_AXIS shards pixels; PRIM_AXIS (if present) shards the
    triangle block (triangle count must divide the axis size — build the
    scene with pad_multiple).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    m = mode or resolve_mode(scene, cfg)
    has_prim_axis = PRIM_AXIS in mesh.axis_names
    prim_axis = PRIM_AXIS if has_prim_axis else None
    n_ray = mesh.shape[RAY_AXIS]

    px, py = camera.pixel_grid()
    r = camera.num_pixels
    # Fused kernels want compact image patches per tile (see
    # pipeline._swizzle_perm); reorder before the shard split and invert
    # after the gather. Shards also get contiguous patch runs this way.
    swizzle = cfg.use_pallas
    if swizzle:
        from raytracingengine_tpu.kernels.chain_trace import tile_layout
        from raytracingengine_tpu.render.pipeline import _swizzle_perm

        from raytracingengine_tpu.geometry.intersect import flatten_scene as _fs

        pw, ph = tile_layout(_fs(scene).n_triangles)[1]
        # Round-robin patch deal across shards: a contiguous split of
        # the patch-major order would hand each shard a horizontal band,
        # whose live-bounce work differs several-x between sky and
        # geometry (load_balance.py: 0.49 efficiency ceiling at 4K;
        # SCALING_r05.json has the measured per-shard device times).
        perm, inv_perm = _swizzle_perm(
            camera.width, camera.height, pw, ph, round_robin=n_ray
        )
        # Host-side constants, not device gathers: TPU gathers at 2M
        # arbitrary indices cost ~15 ms each (PROFILE.md §7) — derive the
        # swizzled coordinates from the numpy permutation directly.
        import numpy as _np

        px = jnp.asarray((_np.asarray(perm) % camera.width).astype(_np.int32))
        py = jnp.asarray(
            (_np.asarray(perm) // camera.width).astype(_np.int32)
        )
    # Local chunking keeps per-chip memory bounded; pad to n_ray * chunk.
    local = -(-r // n_ray)
    chunk = min(cfg.chunk_size, local)
    n_chunks = -(-local // chunk)
    local = n_chunks * chunk
    pad = n_ray * local - r
    px = jnp.pad(px, (0, pad))
    py = jnp.pad(py, (0, pad))

    scene_specs = scene_partition_specs(scene, has_prim_axis)
    cam_specs = jax.tree.map(lambda _: P(), camera)

    def local_render(px_l, py_l, scene_l, camera_l, key_l):
        flat = flatten_scene(scene_l)
        shard_id = jax.lax.axis_index(RAY_AXIS)
        px_c = px_l.reshape(n_chunks, chunk)
        py_c = py_l.reshape(n_chunks, chunk)

        def per_chunk(args):
            cid, px_i, py_i = args
            ck = jax.random.fold_in(key_l, shard_id * n_chunks + cid)
            # base_key (replicated across shards) + per-pixel jitter
            # keying makes spp>1 renders shard-count-invariant AND
            # identical to the single-device pipeline at the same seed.
            return _render_chunk(
                flat, camera_l, cfg, m, px_i, py_i, ck, prim_axis,
                base_key=key_l,
            )

        out = jax.lax.map(per_chunk, (jnp.arange(n_chunks), px_c, py_c))
        return out.reshape(-1, 3)

    fn = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), scene_specs, cam_specs, P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    out = fn(px, py, scene, camera, key)
    out = out[:r]
    if swizzle:
        out = out[inv_perm]
    return out.reshape(camera.height, camera.width, 3)


def render_hdr_auto(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    key: jnp.ndarray | None = None,
    mode: str | None = None,
) -> jnp.ndarray:
    """GSPMD auto-partitioned render: the single-device pipeline with a
    sharding constraint on the ray axis; XLA distributes compute and
    inserts the backward-pass gradient psums itself. This is the
    differentiation-friendly distribution path (shard_map's manual path
    above is forward-render oriented).
    """
    from raytracingengine_tpu.render.pipeline import render_hdr

    return render_hdr(scene, camera, cfg, key=key, mode=mode, mesh=mesh)


def make_sharded_loss(static, cfg: RenderConfig, mesh: Mesh, mode: str = "chain"):
    """Multi-chip training loss through the FUSED kernels: shard_map over
    the ray axis, scene parameters replicated.

    Real TPU lowering cannot auto-partition Mosaic kernels (GSPMD raises
    "wrap the call in a shard_map" — verified by AOT-compiling for a
    v5e:2x4 topology), so this wrapper is THE way to combine the fused
    forward+backward kernels with a device mesh. shard_map's transpose
    inserts the psum of the replicated scene-parameter gradients
    automatically; XLA's latency-hiding scheduler overlaps it with the
    remaining backward compute (see PROFILE.md).

    Returns loss(params, o, d, target) -> scalar mean-squared error;
    o/d/target lead with a ray axis divisible by mesh.shape[RAY_AXIS].

    Ray ORDER matters for dense scenes: feed patch-swizzled rays
    (pipeline._swizzle_perm with chain_trace.tile_layout's patch, the
    order render_hdr uses) so each kernel tile sees a compact image
    patch — row-major order hands tiles full-width strips and was
    device-profiled ~2-3x slower on the 6k-triangle mesh (the swizzle is
    a pure permutation, so the loss value is identical either way).
    """
    from raytracingengine_tpu.inverse import combine
    from raytracingengine_tpu.kernels.chain_grad import chain_trace_fused
    from raytracingengine_tpu.kernels.chain_trace import pallas_applicable
    from raytracingengine_tpu.kernels.wavefront_trace import wavefront_trace
    from raytracingengine_tpu.render.integrator import (
        integrate_chain,
        integrate_wavefront,
    )

    def loss(params, o, d, target):
        n_elems = target.size

        def local(p, oo, dd, tt):
            flat = flatten_scene(combine(p, static))
            if cfg.use_pallas and pallas_applicable(flat, cfg, mode):
                trace = chain_trace_fused if mode == "chain" else wavefront_trace
            else:
                trace = integrate_chain if mode == "chain" else integrate_wavefront
            img = trace(flat, oo, dd, cfg)
            return jax.lax.psum(jnp.sum((img - tt) ** 2), RAY_AXIS)

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
            out_specs=P(),
            check_vma=False,
        )
        return fn(params, o, d, target) / n_elems

    return loss
