"""In-kernel anti-aliasing: the reference's 32-sample AA loop on-chip.

The reference traces `antiAliasingAmount = 32` jittered rays per pixel
(Scene.h:283-309, Math.h:103-116): sample 0 is the deterministic center
ray, samples 1.. add uniform [0,1)-pixel jitter, and the pixel is the
mean. The pipeline's generic path re-invokes the trace per sample; this
kernel runs the entire sample loop inside one Pallas program:

  * pixel screen coordinates arrive per lane; ray directions are built
    in-kernel (camera position/focal from SMEM),
  * jitter comes from the TPU hardware PRNG (pltpu.prng_random_bits),
    seeded per (seed, tile) so tiles decorrelate; bits map to [0,1) via
    the mantissa trick,
  * each sample reuses the fused chain trace (_trace_tile) and
    accumulates; one HBM write of the mean per pixel.

This kernel is the forward-only rendering path: jitter comes from the
hardware PRNG, generated in-kernel (fastest, no jitter HBM traffic),
but the randomness cannot be replayed by an adjoint, so it carries no
VJP. Differentiable spp>1 rendering sets `cfg.differentiable`, and the
pipeline (render/pipeline.py:_render_chunk) traces each sample through
the fused forward+backward kernels (kernels/chain_grad.chain_trace_fused)
with explicit counter-based jitter instead — spp>1 training stays on
Pallas, at exact gradients for scene AND camera leaves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingengine_tpu.geometry.intersect import FlatScene
from raytracingengine_tpu.kernels.chain_trace import (
    LANE,
    SUB,
    TILE,
    _trace_tile,
    pack_forward_tables,
)


#: Seeding hook (module-level so interpreter-mode tests can substitute a
#: software PRNG: prng_seed/prng_random_bits have no CPU lowering).
_seed_prng = pltpu.prng_seed


def _uniform01(shape):
    """Hardware PRNG bits -> float32 uniform in [0, 1)."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    mantissa = jnp.right_shift(bits, jnp.uint32(9))
    one_to_two = pltpu.bitcast(
        jnp.bitwise_or(mantissa, jnp.uint32(0x3F800000)), jnp.float32
    )
    return one_to_two - 1.0


def _make_spp_kernel(ns, np_, nt, nl, max_depth, bias, spp, min_weight=0.0):
    def kernel(
        seed_ref,  # SMEM [1] int32
        cam_ref,  # SMEM [4]: pos_x, pos_y, pos_z, focal
        sph_ref, pl_ref, tri_ref, taabb_ref, mat_ref, light_ref,
        sx_ref, sy_ref,  # base screen coords per lane [SUB, LANE]
        live_ref,  # 0/1 validity (padding lanes dead, see chain_trace)
        r_ref, g_ref, b_ref,
    ):
        _seed_prng(seed_ref[0] + pl.program_id(0))
        cx, cy, cz = cam_ref[0], cam_ref[1], cam_ref[2]
        focal = cam_ref[3]
        sx0 = sx_ref[:]
        sy0 = sy_ref[:]
        shape = sx0.shape

        def sample(s_idx, acc):
            ar, ag, ab = acc
            # Sample 0 unjittered (Scene.h:289-296); jitter ~ U[0,1) px.
            jx = jnp.where(s_idx > 0, _uniform01(shape), jnp.zeros(shape))
            jy = jnp.where(s_idx > 0, _uniform01(shape), jnp.zeros(shape))
            sx = sx0 + jx
            sy = sy0 + jy
            # dir = normalize(screenPoint - position) (Math.h:118-120)
            ddx = sx - cx
            ddy = sy - cy
            ddz = jnp.full(shape, focal)
            inv = jax.lax.rsqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            r, g, b = _trace_tile(
                sph_ref, pl_ref, tri_ref, mat_ref, light_ref,
                ns, np_, nt, nl, max_depth, bias,
                jnp.full(shape, cx), jnp.full(shape, cy), jnp.full(shape, cz),
                ddx * inv, ddy * inv, ddz * inv, live_ref[:],
                min_weight=min_weight, taabb=taabb_ref,
            )
            return ar + r, ag + g, ab + b

        zero = jnp.zeros(shape)
        ar, ag, ab = jax.lax.fori_loop(0, spp, sample, (zero, zero, zero))
        inv_spp = 1.0 / spp
        r_ref[:] = ar * inv_spp
        g_ref[:] = ag * inv_spp
        b_ref[:] = ab * inv_spp

    return kernel


def spp_trace_pallas(flat: FlatScene, camera, cfg, px, py, seed: int = 0):
    """Render pixels with the full in-kernel AA loop -> HDR [R, 3].

    px/py are integer pixel coords [R]; spp comes from `camera.spp`.
    """
    from raytracingengine_tpu.kernels.chain_trace import tile_layout

    r = px.shape[0]
    # Dense scenes use small tiles so per-tile culling sees a tight
    # frustum — same layout contract as chain_trace_pallas.
    sub, _ = tile_layout(flat.n_triangles)
    tile = sub * LANE
    n_tiles = -(-r // tile)
    pad = n_tiles * tile - r
    dtype = camera.position.dtype

    # Base screen coords (Math.h:100-101): sx = x - w/2, sy = h/2 - y.
    sx = px.astype(jnp.float32) - camera.width / 2.0
    sy = camera.height / 2.0 - py.astype(jnp.float32)

    def shape_lane(x):
        return (
            jnp.pad(x, (0, pad)).reshape(n_tiles * sub, LANE).astype(jnp.float32)
        )

    sx, sy = shape_lane(sx), shape_lane(sy)
    live = shape_lane(jnp.ones((r,), jnp.float32))
    seed_arr = jnp.asarray([seed], jnp.int32)
    cam = jnp.stack(
        [
            camera.position[0].astype(jnp.float32),
            camera.position[1].astype(jnp.float32),
            camera.position[2].astype(jnp.float32),
            camera.focal.astype(jnp.float32),
        ]
    )

    tables = pack_forward_tables(flat)
    kernel = _make_spp_kernel(
        flat.n_spheres, flat.n_planes, flat.n_triangles, flat.n_lights,
        cfg.max_depth, cfg.bias, camera.spp, cfg.min_weight,
    )
    smem = lambda t: pl.BlockSpec(
        t.shape, lambda i, _nz=t.ndim: (0,) * _nz, memory_space=pltpu.SMEM
    )
    lane_spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem(seed_arr), smem(cam)]
        + [smem(t) for t in tables]
        + [lane_spec, lane_spec, lane_spec],
        out_specs=(lane_spec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * sub, LANE), jnp.float32)
            for _ in range(3)
        ),
    )(seed_arr, cam, *tables, sx, sy, live)
    rgb = jnp.stack([c.reshape(-1)[:r] for c in out], axis=-1)
    return rgb.astype(dtype)
