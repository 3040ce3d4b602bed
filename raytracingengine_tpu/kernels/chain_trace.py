"""Fused Pallas TPU kernel: the entire opaque Whitted chain in one kernel.

The XLA pipeline (render/integrator.py) materializes a [rays, prims]
distance matrix, hit records, and march state in HBM between every bounce
and every shadow test. This kernel keeps *all* per-ray state in registers
/ VMEM for the whole trace: a tile of TILE = SUB*LANE rays (a stack of
SUB-row VPU blocks) is loaded once, bounced up to max_depth times — closest-hit scan, binary
shadow tests against every light, Blinn-Phong shading, reflection-chain
update — and only the final RGB leaves the chip.

Scene layout: the primitive scan runs as a `fori_loop` over primitives
with per-primitive scalars read from SMEM tables (the TPU scalar memory
— exactly what it is for). Padded slots hold degenerate primitives that
can never hit (sphere r^2 = -1, plane n = 0, triangle a = 0). This
matches the reference's linear scan (Scene.h:218-257) with strict-<
first-wins updates, vectorized 1024 rays at a time.

Scope: opaque scenes (the chain integrator's domain), binary shadow
visibility (== the reference march on opaque scenes, render/config.py),
scenes up to MAX_PRIMS = 8192 SMEM-resident primitives — and beyond, to
MAX_TRIS_STREAM = 131,072 triangles, by streaming DMA-ready
[STREAM_ROWS, TRI_BLOCK] triangle windows from HBM per non-culled block
(chain_trace_streamed_pallas; only per-block AABBs and sphere/plane
tables stay in SMEM). Above TRI_BLOCK triangles the scan turns
hierarchical: triangles are reordered into spatially compact blocks
(pack_forward_tables picks the tightest of authoring / Morton / kd
median-split order by summed block surface area), one conservative AABB
per block is tested against the whole ray tile, and blocks no live
lane's segment can touch are skipped — result-identical, with equal-t
ties still resolved in authoring order via a carried original-index
row. Transparency goes through the wavefront kernel. Training runs the
fused adjoints in chain_grad.py (unrolled / blocked / streamed, via
chain_trace_fused's custom_vjp); the plain `chain_trace` here keeps the
simpler primal-kernel + XLA-autodiff-backward pattern.

Parity notes (all mirrored from the reference):
  sphere quadratic with a = d.d and eps=1e-6 preferring the near root
  (Shape.h:72-98); plane |denom|>1e-6, t>=0 (Shape.h:149-159);
  Moller-Trumbore EPSILON=1e-6 (Shape.h:202-220); shading skip conditions
  and 1/d^2 falloff (Scene.h:79-129); Schlick Fresnel with opaque
  reflectiveness = material.specular and the reflectiveness > bias spawn
  test (Scene.h:189-195); sky gradient on miss/depth-exhaustion
  (Scene.h:30-33, :132-139).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingengine_tpu.geometry.intersect import EPS, FlatScene

SUB, LANE = 64, 128
TILE = SUB * LANE  # rays per kernel instance

#: Dense-scene tile: whole-tile culling and the whole-tile early-exit
#: depth loop only skip work when EVERY lane in the tile agrees, so
#: their win shrinks as the tile's image footprint grows. Above
#: DENSE_TRI_THRESHOLD triangles the forward kernel switches to
#: [DENSE_SUB=8, LANE] tiles covering one 32x32 pixel patch (one native
#: fp32 VPU tile, so per-op efficiency is unchanged): the tile frustum
#: is ~8x tighter, so far more treelet groups/blocks cull and depth
#: loops exit earlier. Pure partitioning — results are bit-identical.
DENSE_SUB = 8
DENSE_TRI_THRESHOLD = 1024


def tile_layout(n_triangles: int):
    """(sub, (patch_w, patch_h)) for a scene's triangle count: the
    kernel tile sublane count and the matching swizzle patch
    (pipeline._swizzle_perm) whose row-major ravel is exactly one tile."""
    if n_triangles >= DENSE_TRI_THRESHOLD:
        return DENSE_SUB, (32, 32)
    return SUB, (LANE, SUB)


_INF = 3.0e38

#: Triangles per culling block: the scan tests one conservative AABB per
#: block against the whole ray tile and skips blocks no ray can touch
#: (lax.cond). Exact-result-preserving: skipped blocks have no hits.
#: 128 (one lane vector) measured 1.57x faster than 256 on the 6k-tri
#: dense mesh @512^2 (28 vs 44 ms; 64 and 32 are slower again — the
#: per-block slab test + cond overhead starts to win).
TRI_BLOCK = 128

#: Culling blocks per treelet group: the scan's SECOND hierarchy level
#: (VERDICT r03 task #2). One conservative AABB bounds each run of
#: TRI_GROUP blocks (TRI_GROUP * TRI_BLOCK = 1024 triangles); a group
#: the whole tile misses skips TRI_GROUP block tests AND their scans
#: with a single slab test. Same conservativeness argument as the block
#: level, so results stay bit-identical.
TRI_GROUP = 8


def n_culling_blocks(nt: int) -> int:
    """Culling-block count for nt triangles, padded to a full treelet
    group multiple — the table width contract between
    pack_forward_tables (which pads with far-point blocks / degenerate
    triangles) and the kernels' fixed-width group/block loops."""
    nb = -(-nt // TRI_BLOCK)
    return -(-nb // TRI_GROUP) * TRI_GROUP


def pack_group_aabbs(taabb: jnp.ndarray) -> jnp.ndarray:
    """Treelet-level AABBs over runs of TRI_GROUP blocks -> [6, n_groups].

    Empty blocks are represented as far-point boxes (lo = hi = 2e38,
    pack_tri_aabbs); a max over them would inflate the group box to
    cover everything, so they are excluded from the reduction and
    all-empty groups get the same far-point representation."""
    lo, hi = taabb[:3], taabb[3:]  # [3, n_blocks]
    far = jnp.asarray(2.0e38, taabb.dtype)
    empty = jnp.any(lo > hi, axis=0) | (lo[0] >= 1.0e38)
    big = jnp.asarray(_INF, taabb.dtype)
    lo_m = jnp.where(empty[None], big, lo)
    hi_m = jnp.where(empty[None], -big, hi)
    n_blocks = taabb.shape[1]
    n_groups = -(-n_blocks // TRI_GROUP)
    pad = n_groups * TRI_GROUP - n_blocks
    lo_m = jnp.pad(lo_m, ((0, 0), (0, pad)), constant_values=_INF)
    hi_m = jnp.pad(hi_m, ((0, 0), (0, pad)), constant_values=-_INF)
    glo = jnp.min(lo_m.reshape(3, n_groups, TRI_GROUP), axis=2)
    ghi = jnp.max(hi_m.reshape(3, n_groups, TRI_GROUP), axis=2)
    gempty = jnp.any(glo > ghi, axis=0, keepdims=True)
    glo = jnp.where(gempty, far, glo)
    ghi = jnp.where(gempty, far, ghi)
    return jnp.concatenate([glo, ghi], axis=0)


def pack_tri_aabbs(flat: FlatScene, block: int = TRI_BLOCK, perm=None):
    """Per-block triangle AABBs -> [6, n_blocks] (lo.xyz, hi.xyz).

    Inactive/padded triangles contribute nothing (+inf lo / -inf hi), so
    an all-padding block can never pass the slab test. Boxes are inflated
    by a relative epsilon so fp32 slab-test roundoff can't exclude a
    boundary-grazing hit the exact scan would find. `perm` (from
    triangle_morton_perm) reorders triangles before blocking so boxes
    bound *spatially adjacent* triangles — it must match the order of the
    tri table handed to the kernel (see pack_forward_tables)."""
    dt = jnp.float32
    nt = flat.n_triangles
    if nt == 0:
        return jnp.zeros((6, 1), dt)
    v0 = flat.tri_v0
    v1 = flat.tri_v0 + flat.tri_e1
    v2 = flat.tri_v0 + flat.tri_e2
    act = flat.tri_active[:, None]
    if perm is not None:
        v0, v1, v2, act = v0[perm], v1[perm], v2[perm], act[perm]
    big = jnp.asarray(_INF, dt)
    los = jnp.where(act, jnp.minimum(jnp.minimum(v0, v1), v2), big)
    his = jnp.where(act, jnp.maximum(jnp.maximum(v0, v1), v2), -big)
    n_blocks = -(-nt // block)
    pad = n_blocks * block - nt
    los = jnp.pad(los, ((0, pad), (0, 0)), constant_values=_INF)
    his = jnp.pad(his, ((0, pad), (0, 0)), constant_values=-_INF)
    lo = jnp.min(los.reshape(n_blocks, block, 3), axis=1)  # [n_blocks,3]
    hi = jnp.max(his.reshape(n_blocks, block, 3), axis=1)
    eps = jnp.maximum(hi - lo, 0.0) * 1e-5 + 1e-5
    lo = lo - eps
    hi = hi + eps
    # All-padding blocks have inverted (+inf/-inf) bounds, which the slab
    # test's per-axis min/max would normalize into a hit-everything box.
    # Represent them as a far point box instead: every ray misses it
    # (t ~ 1e38 exceeds any segment bound; sign mismatches across axes
    # empty the interval).
    empty = jnp.any(lo > hi, axis=1, keepdims=True)
    far = jnp.asarray(2.0e38, dt)
    lo = jnp.where(empty, far, lo)
    hi = jnp.where(empty, far, hi)
    return jnp.concatenate([lo.T, hi.T], axis=0).astype(dt)  # [6, n_blocks]


def _part1by2(x):
    """Spread the low 10 bits of int32 x so bits land 3 apart (Morton)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def triangle_morton_perm(flat: FlatScene) -> jnp.ndarray:
    """Morton (Z-order) permutation of triangle indices by centroid.

    The kernels cull whole TRI_BLOCK-sized blocks with one AABB per block
    (pack_tri_aabbs); in authoring order a block's triangles can span the
    entire model (e.g. a ring-major procedural mesh puts a full 360° band
    in every block) and the boxes cull nothing. Sorting by 30-bit Morton
    code of the quantized centroid makes blocks spatially compact, so
    most blocks miss most ray tiles. Inactive/padded triangles sort last
    (keeps padded blocks degenerate). Stable sort: equal cells keep
    authoring order. Fully traced — works under jit with FlatScene leaves
    as tracers."""
    c = flat.tri_v0 + (flat.tri_e1 + flat.tri_e2) / 3.0  # [nt, 3]
    act = flat.tri_active
    big = jnp.asarray(_INF, jnp.float32)
    lo = jnp.min(jnp.where(act[:, None], c, big), axis=0)
    hi = jnp.max(jnp.where(act[:, None], c, -big), axis=0)
    span = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((c - lo) / span * 1023.0, 0.0, 1023.0).astype(jnp.int32)
    code = (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << 1)
        | (_part1by2(q[:, 2]) << 2)
    )
    key = jnp.where(act, code, jnp.int32(0x40000000))
    return jnp.argsort(key, stable=True)


def triangle_split_perm(flat: FlatScene) -> jnp.ndarray:
    """Recursive largest-axis median-split ordering of triangles.

    A kd-treelet build flattened to its in-order leaf sequence: at each
    level every group picks its widest centroid axis and splits at the
    median, so consecutive runs of triangles are compact spatial patches
    (tighter than a Z-curve, which jumps across octant boundaries on
    surface meshes). Fixed depth = ceil(log2(n_blocks)) + 1 levels, all
    static — the body is argsorts and segment reductions, traceable under
    jit. Inactive/padded triangles sort to the end."""
    nt = flat.n_triangles
    c = flat.tri_v0 + (flat.tri_e1 + flat.tri_e2) / 3.0  # [nt, 3]
    act = flat.tri_active
    n_blocks = -(-nt // TRI_BLOCK)
    levels = max(1, int(math.ceil(math.log2(max(n_blocks, 1)))) + 1)
    big = jnp.asarray(3.0e38, jnp.float32)
    order = jnp.arange(nt)
    g = jnp.zeros(nt, jnp.int32)
    ones = jnp.ones(nt, jnp.int32)
    for lvl in range(levels):
        ng = 1 << lvl
        cm = jnp.where(act[:, None], c, big)
        cM = jnp.where(act[:, None], c, -big)
        lo = jax.ops.segment_min(cm, g, num_segments=ng)
        hi = jax.ops.segment_max(cM, g, num_segments=ng)
        ext = jnp.where(hi >= lo, hi - lo, 0.0)
        axis = jnp.argmax(ext, axis=1)  # widest axis per group
        v = jnp.take_along_axis(c, axis[g][:, None], axis=1)[:, 0]
        v = jnp.where(act, v, big)
        ordv = jnp.argsort(v, stable=True)
        order = ordv[jnp.argsort(g[ordv], stable=True)]  # by (group, v)
        gs = g[order]
        counts = jax.ops.segment_sum(ones, g, num_segments=ng)
        starts = jnp.cumsum(counts) - counts
        rank = jnp.arange(nt) - starts[gs]
        child = (rank >= (counts[gs] + 1) // 2).astype(jnp.int32)
        g = jnp.zeros(nt, jnp.int32).at[order].set(gs * 2 + child)
    inactive_last = (1 - act[order].astype(jnp.int32))
    return order[jnp.argsort(inactive_last, stable=True)]


def _block_sa_sum(taabb) -> jnp.ndarray:
    """Summed surface area of the per-block boxes (SAH-style cost proxy:
    a block's chance of intersecting a random ray ~ its surface area).
    Empty far-point blocks have zero extent and contribute nothing."""
    e = jnp.maximum(taabb[3:] - taabb[:3], 0.0)  # [3, n_blocks]
    return jnp.sum(
        2.0 * (e[0] * e[1] + e[1] * e[2] + e[0] * e[2])
    )


def pack_forward_tables(flat: FlatScene):
    """SMEM tables for the forward kernels -> (sph, pl, tri13, taabb, mat, light).

    When block culling is active (n_triangles > TRI_BLOCK) the triangles
    are reordered by whichever candidate ordering — authoring order,
    Morton/Z-order (triangle_morton_perm), or kd median-split
    (triangle_split_perm) — yields the smallest summed block surface
    area, so each TRI_BLOCK's AABB bounds a compact spatial patch even
    for arbitrarily-ordered OBJ meshes, while already-coherent meshes
    keep their authored order. The selection is traced (works under jit
    with scene leaves as tracers) and costs O(n log n) scene-sized ops —
    noise next to the ray workload.

    The tri table gains row 12 = ORIGINAL global primitive index as
    float32. Kernels use that row for the material lookup and to
    reproduce the reference's first-wins tie-break in *authoring* order
    (Scene.h:218-257) exactly, independent of scan order — so reordering
    is bit-result-identical."""
    tables, _perm = pack_forward_tables_perm(flat)
    return tables


def pack_forward_tables_perm(flat: FlatScene, dmean=None):
    """pack_forward_tables, also returning the triangle permutation.

    -> ((sph, pl, tri13, taabb, mat, light), perm) where `perm` is the
    scan-order -> authoring-order map actually applied to the tri table
    (scan column j holds authoring triangle perm[j]; -1 on padded
    columns), or None when no reorder fired (nt <= TRI_BLOCK). The
    blocked adjoint kernel (chain_grad.py) accumulates triangle
    cotangents in scan order and needs `perm` to scatter them back to
    authoring order.

    When culling is active the tri table is width-padded to a full
    block multiple (padded columns are degenerate: e1 = e2 = 0 -> a = 0
    -> miss, original-index row 2^30 so they lose every tie), so every
    block the kernels scan is exactly TRI_BLOCK wide.

    `dmean` (optional [3] unit vector, the mean ray direction) sorts
    whole BLOCKS front-to-back along it: the per-lane best-t bound then
    culls far blocks as soon as near hits land (back faces of a closed
    mesh stop being scanned at all). Result-identical: the closest-hit
    update is a lexicographic (t, original-index) min, which is
    visit-order independent, and culling stays conservative."""
    sph, pl_, tri, mat, light = pack_scene_tables(flat)
    nt = flat.n_triangles
    if nt == 0:
        tri13 = jnp.concatenate(
            [tri, jnp.zeros((1, tri.shape[1]), jnp.float32)], axis=0
        )
        return (sph, pl_, tri13, pack_tri_aabbs(flat), mat, light), None
    base = flat.n_spheres + flat.n_planes
    gi = (base + jnp.arange(nt)).astype(jnp.float32)
    perm = None
    if nt > TRI_BLOCK:
        cands = jnp.stack(
            [
                jnp.arange(nt),
                triangle_morton_perm(flat),
                triangle_split_perm(flat),
            ]
        )  # [3, nt]
        aabbs = jnp.stack(
            [pack_tri_aabbs(flat, perm=cands[i]) for i in range(3)]
        )  # [3, 6, n_blocks]
        best = jnp.argmin(
            jnp.stack([_block_sa_sum(aabbs[i]) for i in range(3)])
        )
        perm = cands[best]
        taabb = aabbs[best]
        tri = tri[:, perm]
        gi = gi[perm]
        # Full blocks AND full groups: pad the table (degenerate
        # triangles, far-point blocks) so the kernels' fixed-width
        # block/group loops are exact (n_culling_blocks contract).
        n_blocks = n_culling_blocks(nt)
        pad_b = n_blocks - taabb.shape[1]
        if pad_b:
            taabb = jnp.pad(
                taabb, ((0, 0), (0, pad_b)), constant_values=2.0e38
            )
        pad = n_blocks * TRI_BLOCK - nt
        if pad:
            tri = jnp.pad(tri, ((0, 0), (0, pad)))
            gi = jnp.pad(gi, (0, pad), constant_values=float(2 ** 30))
            perm = jnp.pad(perm, (0, pad), constant_values=-1)
        if dmean is not None:
            # Hierarchy-preserving front-to-back: order treelet GROUPS
            # by their nearest block's projection on the mean ray
            # direction, and blocks WITHIN each group likewise. Group
            # membership (hence group boxes) is unchanged — a plain
            # global depth sort would smear every group box across the
            # whole silhouette and forfeit group-level skips (measured
            # 27.5 -> 44.8 ms on the dense mesh) — while the per-lane
            # best-t bound still sees near geometry first and culls the
            # mesh's far side. Empty far-point blocks sort last.
            c = (taabb[:3] + taabb[3:]) * 0.5
            key = dmean[0] * c[0] + dmean[1] * c[1] + dmean[2] * c[2]
            key = jnp.where(taabb[0] >= 1.0e38, 3.0e38, key)
            ng = n_blocks // TRI_GROUP
            kg = key.reshape(ng, TRI_GROUP)
            within = jnp.argsort(kg, axis=1)
            go = jnp.argsort(jnp.min(kg, axis=1))
            order = (
                jnp.arange(ng)[:, None] * TRI_GROUP + within
            )[go].reshape(-1)
            taabb = taabb[:, order]
            blk = (
                order[:, None] * TRI_BLOCK + jnp.arange(TRI_BLOCK)[None, :]
            ).reshape(-1)
            tri = tri[:, blk]
            gi = gi[blk]
            perm = perm[blk]
        # Treelet level: group AABBs ride in the SAME table, columns
        # [n_blocks:] — the kernels know n_blocks statically from nt, so
        # no signature changes anywhere.
        taabb = jnp.concatenate([taabb, pack_group_aabbs(taabb)], axis=1)
    else:
        taabb = pack_tri_aabbs(flat)
    tri13 = jnp.concatenate([tri, gi[None, :]], axis=0)
    return (sph, pl_, tri13, taabb, mat, light), perm


#: Rows of one streamed triangle block: 13 tri rows (v0, e1, e2, nunit,
#: original index) + 7 material rows + 4 zero pad rows -> 24 = 3 full
#: sublane tiles, the alignment DMA slices need.
STREAM_ROWS = 24

#: Triangle ceiling for the HBM-streamed scan (kernels DMA TRI_BLOCK
#: windows per non-culled block; only the per-block AABBs stay SMEM).
#: The bound is the SMEM AABB table + the adjoint's VMEM accumulators,
#: not the stream itself.
MAX_TRIS_STREAM = 131072


def pack_streamed_tables(flat: FlatScene, dmean=None):
    """Tables for the HBM-streamed kernels (triangles past MAX_PRIMS).

    -> ((sph, pl_, mat_sp, light, taabb, stream), perm): sph/pl_/light
    as in pack_scene_tables; `mat_sp` = the material table restricted to
    sphere+plane columns (all that still needs SMEM residency);
    `stream` = [n_blocks, STREAM_ROWS, TRI_BLOCK] — one DMA-ready window
    per culling block carrying the 13 triangle rows PLUS each slot's 7
    material rows (gathered by original index), so nothing per-triangle
    is left in SMEM. Ordering/padding identical to
    pack_forward_tables_perm, so results are bit-identical to the SMEM
    scan."""
    (sph, pl_, tri13, taabb, mat, light), perm = pack_forward_tables_perm(
        flat, dmean=dmean
    )
    NT = tri13.shape[1]
    n_blocks = -(-NT // TRI_BLOCK)
    pad = n_blocks * TRI_BLOCK - NT
    if pad:  # nt <= TRI_BLOCK never streams, but keep the math total
        tri13 = jnp.pad(tri13, ((0, 0), (0, pad)))
    gi = tri13[12]
    idx = jnp.clip(gi, 0.0, float(max(flat.n_primitives - 1, 0))).astype(
        jnp.int32
    )
    mat_cols = mat[:, idx]  # [7, NT]: per-slot materials ride the stream
    rows = jnp.concatenate(
        [tri13, mat_cols,
         jnp.zeros((STREAM_ROWS - 20, tri13.shape[1]), jnp.float32)],
        axis=0,
    )
    stream = rows.reshape(STREAM_ROWS, n_blocks, TRI_BLOCK).transpose(
        1, 0, 2
    )
    nsp = max(flat.n_spheres + flat.n_planes, 1)
    mat_sp = mat[:, :nsp] if mat.shape[1] >= nsp else jnp.zeros(
        (7, 1), jnp.float32
    )
    return (sph, pl_, mat_sp, light, taabb, stream), perm


def _block_hits_tile(aabb, b, ox, oy, oz, dx, dy, dz, interest, t_hi):
    """Conservative: does ANY interested lane's ray segment [0, t_hi]
    intersect block b's AABB? Slab method with sign-preserving clamp of
    near-zero direction components (keeps the test NaN-free and errs
    toward True)."""
    def inv(d):
        tiny = jnp.abs(d) < 1e-12
        safe = jnp.where(tiny, jnp.where(d < 0.0, -1e-12, 1e-12), d)
        return 1.0 / safe

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    t1x = (aabb[0, b] - ox) * ivx
    t2x = (aabb[3, b] - ox) * ivx
    t1y = (aabb[1, b] - oy) * ivy
    t2y = (aabb[4, b] - oy) * ivy
    t1z = (aabb[2, b] - oz) * ivz
    t2z = (aabb[5, b] - oz) * ivz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    hit = (tmax >= tmin) & (tmax >= 0.0) & (tmin <= t_hi)
    return jnp.any(hit & interest)


def _sky(dx, dy, dz):
    """Scene.h:30-33 on unit directions."""
    t = 0.5 * (dy + 1.0)
    return (
        1.0 * (1.0 - t) + 0.5 * t,
        1.0 * (1.0 - t) + 0.7 * t,
        1.0 * (1.0 - t) + 1.0 * t,
    )


def _closest_hit(
    sph, pl_, tri, mat, ns, np_, nt, ox, oy, oz, dx, dy, dz,
    taabb=None, interest=None, want_pos=False,
):
    """Linear scan over SMEM primitive tables -> best-hit state.

    Returns (t, nx, ny, nz, ar, ag, ab, spec, shin); t >= _INF means miss.
    `tri` is the 13-row table from pack_forward_tables: row 12 holds each
    triangle's ORIGINAL global index, so the scan can run in Morton order
    while ties (t_new == t, mesh seam hits) still resolve to the lowest
    authoring-order primitive — exactly the reference's first-wins
    strict-< scan (Scene.h:218-257). With `taabb` (per-block triangle
    AABBs, pack_tri_aabbs) the triangle scan skips whole blocks no
    `interest` lane's ray can touch — result-identical, since skipped
    blocks contain no hits for any lane whose output is used.

    `want_pos=True` (the blocked adjoint kernel, chain_grad.py) appends
    two more outputs: the winner's SCAN position (sphere i -> i, plane i
    -> ns+i, triangle slot i -> ns+np_+i — the table column, NOT the
    original authoring index) and the winner's transparency (mat row 5).
    The scan-position row is what lets the backward pass pull hit-field
    cotangents back to the one winning primitive per lane with a one-hot
    mask, and it adds two carry rows only for callers that ask.
    """
    shape = ox.shape
    # Static: spatial reorder (pack_forward_tables) only fires above
    # TRI_BLOCK, so smaller scenes skip the best-index carry row and its
    # tie compare entirely — zero cost vs the plain strict-< scan.
    tie_gi = nt > TRI_BLOCK
    # Single packed carry [9..12, SUB, LANE]:
    # (t, nx, ny, nz, ar, ag, ab, sp, sh[, best_gi][, pos, tau]).
    # All fields update through ONE jnp.where: if the predicate chain were
    # consumed by several selects, XLA may duplicate it per consumer with
    # different FMA contraction, and an exact edge hit (u or v == 0) can
    # then update t but not the attributes — observed in practice. A single
    # select makes the decision atomic.
    rows = [jnp.full((1,) + shape, _INF), jnp.zeros((8,) + shape)]
    if tie_gi:
        rows.append(jnp.full((1,) + shape, _INF))  # best original index
    if want_pos:
        rows.append(jnp.full((1,) + shape, _INF))  # winner scan position
        rows.append(jnp.zeros((1,) + shape))  # winner transparency
    carry = jnp.concatenate(rows, axis=0)

    a_coef = dx * dx + dy * dy + dz * dz  # d.d (Shape.h:75)

    def upd(carry, t_new, hit, n3, gi, gi_f, pos_f):
        t = carry[0]
        if tie_gi:
            # Equal-t ties go to the lower ORIGINAL index: with in-order
            # scans this is identical to strict <; under spatial reorder
            # it restores authoring-order first-wins.
            closer = hit & (
                (t_new < t) | ((t_new == t) & (gi_f < carry[9]))
            )
        else:
            closer = hit & (t_new < t)
        nxn, nyn, nzn = n3
        one = jnp.ones(shape)
        fields = [
            t_new,
            nxn,
            nyn,
            nzn,
            mat[0, gi] * one,
            mat[1, gi] * one,
            mat[2, gi] * one,
            mat[3, gi] * one,
            mat[4, gi] * one,
        ]
        if tie_gi:
            fields.append(gi_f * one)
        if want_pos:
            fields.append(pos_f * one)
            fields.append(mat[5, gi] * one)
        return jnp.where(closer[None], jnp.stack(fields), carry)

    def sphere_body(i, carry):
        cx, cy, cz, r2 = sph[0, i], sph[1, i], sph[2, i], sph[3, i]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - 4.0 * a_coef * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, jnp.maximum(disc, 0.0), 0.0))
        inv2a = 0.5 / a_coef
        tt0 = (-b - sq) * inv2a
        tt1 = (-b + sq) * inv2a
        t_new = jnp.where(tt0 >= EPS, tt0, tt1)
        hit = ok & (t_new >= EPS)
        px = ox + dx * t_new
        py = oy + dy * t_new
        pz = oz + dz * t_new
        gx, gy, gz = px - cx, py - cy, pz - cz
        g2 = gx * gx + gy * gy + gz * gz
        inv = jax.lax.rsqrt(jnp.maximum(g2, 1e-24))
        return upd(
            carry, t_new, hit, (gx * inv, gy * inv, gz * inv), i,
            i.astype(jnp.float32), i.astype(jnp.float32),
        )

    def plane_body(i, carry):
        nx_, ny_, nz_, pn = pl_[0, i], pl_[1, i], pl_[2, i], pl_[3, i]
        denom = dx * nx_ + dy * ny_ + dz * nz_
        ok = jnp.abs(denom) > EPS
        on = ox * nx_ + oy * ny_ + oz * nz_
        t_new = (pn - on) / jnp.where(ok, denom, 1.0)
        hit = ok & (t_new >= 0.0)
        one = jnp.ones_like(ox)
        return upd(
            carry, t_new, hit, (nx_ * one, ny_ * one, nz_ * one), ns + i,
            (ns + i).astype(jnp.float32), (ns + i).astype(jnp.float32),
        )

    def tri_body(i, carry):
        v0x, v0y, v0z = tri[0, i], tri[1, i], tri[2, i]
        e1x, e1y, e1z = tri[3, i], tri[4, i], tri[5, i]
        e2x, e2y, e2z = tri[6, i], tri[7, i], tri[8, i]
        nux, nuy, nuz = tri[9, i], tri[10, i], tri[11, i]
        # h = d x e2
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        ok = jnp.abs(a) > EPS
        f = 1.0 / jnp.where(ok, a, 1.0)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t_new = f * (e2x * qx + e2y * qy + e2z * qz)
        hit = (
            ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t_new > EPS)
        )
        one = jnp.ones_like(ox)
        if tie_gi:  # original global index (pack_forward_tables row 12)
            gi_f = tri[12, i]
            # Padded slots carry gi_f = 2^30 (loses every tie) — clamp
            # the MATERIAL lookup to a valid column: they have a = 0 so
            # hit is False and the loaded value is discarded, but the
            # dynamic SMEM read itself must stay in bounds (OOB dynamic
            # indexing is unspecified in Mosaic, ADVICE r04).
            gi = jnp.minimum(
                gi_f, jnp.float32(ns + np_ + nt - 1)
            ).astype(jnp.int32)
        else:  # no reorder possible: scan position IS the global index
            gi_f = jnp.float32(0.0)
            gi = ns + np_ + i
        return upd(
            carry, t_new, hit, (nux * one, nuy * one, nuz * one), gi, gi_f,
            (ns + np_ + i).astype(jnp.float32),
        )

    carry = jax.lax.fori_loop(0, ns, sphere_body, carry)
    carry = jax.lax.fori_loop(0, np_, plane_body, carry)
    if taabb is not None and nt > TRI_BLOCK:
        want = interest if interest is not None else jnp.ones(shape) > 0.0
        n_blocks = n_culling_blocks(nt)

        def blk_body(b, carry):
            # Segment bound = each lane's current best t. Under tie_gi an
            # equal-t hit with a lower original index CAN still win, so
            # the bound must keep tie candidates un-culled: the slab test
            # uses the inclusive tmin <= t_hi (plus pack_tri_aabbs' box
            # inflation), so a block containing a t == best_t tie always
            # passes. Only blocks strictly behind the best hit are
            # skipped, which no update rule could ever select from.
            any_hit_blk = _block_hits_tile(
                taabb, b, ox, oy, oz, dx, dy, dz, want, carry[0]
            )
            lo_i = b * TRI_BLOCK
            # Full block: pack_forward_tables pads the tri table to a
            # block multiple (padded entries are degenerate misses).
            hi_i = lo_i + TRI_BLOCK
            return jax.lax.cond(
                any_hit_blk,
                lambda c: jax.lax.fori_loop(lo_i, hi_i, tri_body, c),
                lambda c: c,
                carry,
            )

        # Treelet level: taabb columns [n_blocks:] hold TRI_GROUP-block
        # group AABBs (pack_group_aabbs); one whole-tile miss skips the
        # whole group's block tests and scans.
        n_groups = n_blocks // TRI_GROUP

        def grp_body(g, carry):
            hit_grp = _block_hits_tile(
                taabb, n_blocks + g, ox, oy, oz, dx, dy, dz, want, carry[0]
            )
            lo_b = g * TRI_GROUP
            hi_b = lo_b + TRI_GROUP  # groups are full (n_culling_blocks)
            return jax.lax.cond(
                hit_grp,
                lambda c: jax.lax.fori_loop(lo_b, hi_b, blk_body, c),
                lambda c: c,
                carry,
            )

        carry = jax.lax.fori_loop(0, n_groups, grp_body, carry)
    else:
        carry = jax.lax.fori_loop(0, nt, tri_body, carry)
    if want_pos:
        p = 10 if tie_gi else 9
        return tuple(carry[i] for i in range(9)) + (carry[p], carry[p + 1])
    return tuple(carry[i] for i in range(9))


def _any_hit(
    sph, pl_, tri, ns, np_, nt, ox, oy, oz, dx, dy, dz, lo, hi,
    taabb=None, interest=None,
):
    """Binary occlusion: any primitive with lo < t < hi (per lane).

    The accumulator is float32 (1.0 = occluded): Mosaic cannot carry an
    i1 vector through an scf.for loop (roll_vectors on i1 fails to
    legalize), so booleans are materialized as 0/1 floats in the carry.
    With `taabb`, triangle blocks outside every interested lane's shadow
    segment are skipped (same conservative test as _closest_hit).
    (A nearest-block-first shadow probe was tried here and measured
    device-neutral-to-negative on the dense mesh: the probe block gets
    rescanned per light per bounce, and interest rarely collapses early
    enough to pay for it.)
    """
    occ0 = jnp.zeros(ox.shape, jnp.float32)
    a_coef = dx * dx + dy * dy + dz * dz

    def sphere_body(i, occ):
        cx, cy, cz, r2 = sph[0, i], sph[1, i], sph[2, i], sph[3, i]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - 4.0 * a_coef * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, jnp.maximum(disc, 0.0), 0.0))
        inv2a = 0.5 / a_coef
        tt0 = (-b - sq) * inv2a
        tt1 = (-b + sq) * inv2a
        t_new = jnp.where(tt0 >= EPS, tt0, tt1)
        hit = ok & (t_new >= EPS)
        blocked = hit & (t_new > lo) & (t_new < hi)
        return jnp.maximum(occ, blocked.astype(jnp.float32))

    def plane_body(i, occ):
        nx_, ny_, nz_, pn = pl_[0, i], pl_[1, i], pl_[2, i], pl_[3, i]
        denom = dx * nx_ + dy * ny_ + dz * nz_
        ok = jnp.abs(denom) > EPS
        on = ox * nx_ + oy * ny_ + oz * nz_
        t_new = (pn - on) / jnp.where(ok, denom, 1.0)
        hit = ok & (t_new >= 0.0)
        blocked = hit & (t_new > lo) & (t_new < hi)
        return jnp.maximum(occ, blocked.astype(jnp.float32))

    def tri_body(i, occ):
        v0x, v0y, v0z = tri[0, i], tri[1, i], tri[2, i]
        e1x, e1y, e1z = tri[3, i], tri[4, i], tri[5, i]
        e2x, e2y, e2z = tri[6, i], tri[7, i], tri[8, i]
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        ok = jnp.abs(a) > EPS
        f = 1.0 / jnp.where(ok, a, 1.0)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t_new = f * (e2x * qx + e2y * qy + e2z * qz)
        hit = (
            ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t_new > EPS)
        )
        blocked = hit & (t_new > lo) & (t_new < hi)
        return jnp.maximum(occ, blocked.astype(jnp.float32))

    occ = jax.lax.fori_loop(0, ns, sphere_body, occ0)
    occ = jax.lax.fori_loop(0, np_, plane_body, occ)
    if taabb is not None and nt > TRI_BLOCK:
        want = interest if interest is not None else jnp.ones(ox.shape) > 0.0
        n_blocks = n_culling_blocks(nt)

        def blk_body(b, occ):
            any_hit_blk = _block_hits_tile(
                taabb, b, ox, oy, oz, dx, dy, dz, want & (occ == 0.0), hi
            )
            lo_i = b * TRI_BLOCK
            # Full block: pack_forward_tables pads the tri table to a
            # block multiple (padded entries are degenerate misses).
            hi_i = lo_i + TRI_BLOCK
            return jax.lax.cond(
                any_hit_blk,
                lambda c: jax.lax.fori_loop(lo_i, hi_i, tri_body, c),
                lambda c: c,
                occ,
            )

        n_groups = n_blocks // TRI_GROUP

        def grp_body(g, occ):
            hit_grp = _block_hits_tile(
                taabb, n_blocks + g, ox, oy, oz, dx, dy, dz,
                want & (occ == 0.0), hi,
            )
            lo_b = g * TRI_GROUP
            hi_b = lo_b + TRI_GROUP  # groups are full (n_culling_blocks)
            return jax.lax.cond(
                hit_grp,
                lambda c: jax.lax.fori_loop(lo_b, hi_b, blk_body, c),
                lambda c: c,
                occ,
            )

        occ = jax.lax.fori_loop(0, n_groups, grp_body, occ)
    else:
        occ = jax.lax.fori_loop(0, nt, tri_body, occ)
    return occ > 0.0


def _tri_slot_math(win, j, ox, oy, oz, dx, dy, dz):
    """Möller–Trumbore for streamed window slot j (STATIC index — the
    whole TRI_BLOCK body is python-unrolled once and reused for every
    block via the fori/cond around it). Returns (t_new, hit, n3)."""
    v0x, v0y, v0z = win[0, j], win[1, j], win[2, j]
    e1x, e1y, e1z = win[3, j], win[4, j], win[5, j]
    e2x, e2y, e2z = win[6, j], win[7, j], win[8, j]
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    ok = jnp.abs(a) > EPS
    f = 1.0 / jnp.where(ok, a, 1.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t_new = f * (e2x * qx + e2y * qy + e2z * qz)
    hit = (
        ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t_new > EPS)
    )
    return t_new, hit, (win[9, j], win[10, j], win[11, j])


def _stream_tri_blocks(stream_ref, taabb, window, sem, nt, slot_fn,
                       ox, oy, oz, dx, dy, dz, interest, carry,
                       t_hi_from_carry0=True, t_hi=None):
    """Group/block-culled loop over HBM-streamed triangle windows.

    Mirrors the SMEM scan's two-level treelet structure exactly (same
    `_block_hits_tile` conservativeness argument -> bit-identical
    results); a surviving block costs one [STREAM_ROWS, TRI_BLOCK] DMA
    (~12 KB) plus the unrolled 128-slot scan."""
    n_blocks = n_culling_blocks(nt)

    def blk_body(b, carry):
        bound = carry[0] if t_hi_from_carry0 else t_hi
        any_hit_blk = _block_hits_tile(
            taabb, b, ox, oy, oz, dx, dy, dz, interest, bound
        )

        def do(c):
            cp = pltpu.make_async_copy(stream_ref.at[b], window, sem)
            cp.start()
            cp.wait()
            for j in range(TRI_BLOCK):
                c = slot_fn(window, b, j, c)
            return c

        return jax.lax.cond(any_hit_blk, do, lambda c: c, carry)

    n_groups = n_blocks // TRI_GROUP

    def grp_body(g, carry):
        bound = carry[0] if t_hi_from_carry0 else t_hi
        hit_grp = _block_hits_tile(
            taabb, n_blocks + g, ox, oy, oz, dx, dy, dz, interest, bound
        )
        lo_b = g * TRI_GROUP
        hi_b = lo_b + TRI_GROUP
        return jax.lax.cond(
            hit_grp,
            lambda c: jax.lax.fori_loop(lo_b, hi_b, blk_body, c),
            lambda c: c,
            carry,
        )

    return jax.lax.fori_loop(0, n_groups, grp_body, carry)


def _closest_hit_streamed(
    sph, pl_, mat_sp, stream_ref, taabb, window, sem,
    ns, np_, nt, ox, oy, oz, dx, dy, dz, interest=None, want_pos=False,
):
    """_closest_hit semantics with the triangle table streamed from HBM
    (scenes past MAX_PRIMS SMEM residency). Sphere/plane scans and the
    carry layout are identical to the SMEM path; triangle materials are
    read from the streamed window (rows 13..19), so SMEM holds only the
    sphere+plane material columns (`mat_sp`)."""
    shape = ox.shape
    rows = [jnp.full((1,) + shape, _INF), jnp.zeros((8,) + shape),
            jnp.full((1,) + shape, _INF)]  # best original index
    if want_pos:
        rows.append(jnp.full((1,) + shape, _INF))
        rows.append(jnp.zeros((1,) + shape))
    carry = jnp.concatenate(rows, axis=0)
    a_coef = dx * dx + dy * dy + dz * dz

    def upd(carry, t_new, hit, n3, matv, gi_f, pos_f):
        t = carry[0]
        closer = hit & ((t_new < t) | ((t_new == t) & (gi_f < carry[9])))
        nxn, nyn, nzn = n3
        one = jnp.ones(shape)
        fields = [t_new, nxn * one, nyn * one, nzn * one] + [
            m * one for m in matv[:5]
        ] + [gi_f * one]
        if want_pos:
            fields.append(pos_f * one)
            fields.append(matv[5] * one)
        return jnp.where(closer[None], jnp.stack(fields), carry)

    def sphere_body(i, carry):
        cx, cy, cz, r2 = sph[0, i], sph[1, i], sph[2, i], sph[3, i]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - 4.0 * a_coef * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, jnp.maximum(disc, 0.0), 0.0))
        inv2a = 0.5 / a_coef
        tt0 = (-b - sq) * inv2a
        tt1 = (-b + sq) * inv2a
        t_new = jnp.where(tt0 >= EPS, tt0, tt1)
        hit = ok & (t_new >= EPS)
        px = ox + dx * t_new
        py = oy + dy * t_new
        pz = oz + dz * t_new
        gx, gy, gz = px - cx, py - cy, pz - cz
        g2 = gx * gx + gy * gy + gz * gz
        inv = jax.lax.rsqrt(jnp.maximum(g2, 1e-24))
        matv = tuple(mat_sp[r, i] for r in range(6))
        i_f = i.astype(jnp.float32)
        return upd(
            carry, t_new, hit, (gx * inv, gy * inv, gz * inv), matv,
            i_f, i_f,
        )

    def plane_body(i, carry):
        nx_, ny_, nz_, pn = pl_[0, i], pl_[1, i], pl_[2, i], pl_[3, i]
        denom = dx * nx_ + dy * ny_ + dz * nz_
        ok = jnp.abs(denom) > EPS
        on = ox * nx_ + oy * ny_ + oz * nz_
        t_new = (pn - on) / jnp.where(ok, denom, 1.0)
        hit = ok & (t_new >= 0.0)
        matv = tuple(mat_sp[r, ns + i] for r in range(6))
        gi_f = (ns + i).astype(jnp.float32)
        return upd(carry, t_new, hit, (nx_, ny_, nz_), matv, gi_f, gi_f)

    def tri_slot(win, b, j, carry):
        t_new, hit, n3 = _tri_slot_math(win, j, ox, oy, oz, dx, dy, dz)
        matv = tuple(win[13 + r, j] for r in range(6))
        gi_f = win[12, j]
        pos_f = (
            jnp.float32(ns + np_) + b.astype(jnp.float32) * TRI_BLOCK + j
        )
        return upd(carry, t_new, hit, n3, matv, gi_f, pos_f)

    carry = jax.lax.fori_loop(0, ns, sphere_body, carry)
    carry = jax.lax.fori_loop(0, np_, plane_body, carry)
    want = interest if interest is not None else jnp.ones(shape) > 0.0
    carry = _stream_tri_blocks(
        stream_ref, taabb, window, sem, nt, tri_slot,
        ox, oy, oz, dx, dy, dz, want, carry,
    )
    if want_pos:
        return tuple(carry[i] for i in range(9)) + (carry[10], carry[11])
    return tuple(carry[i] for i in range(9))


def _any_hit_streamed(
    sph, pl_, stream_ref, taabb, window, sem,
    ns, np_, nt, ox, oy, oz, dx, dy, dz, lo, hi, interest=None,
):
    """_any_hit with HBM-streamed triangle blocks."""
    occ0 = jnp.zeros(ox.shape, jnp.float32)
    a_coef = dx * dx + dy * dy + dz * dz

    def sphere_body(i, occ):
        cx, cy, cz, r2 = sph[0, i], sph[1, i], sph[2, i], sph[3, i]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - 4.0 * a_coef * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, jnp.maximum(disc, 0.0), 0.0))
        inv2a = 0.5 / a_coef
        tt0 = (-b - sq) * inv2a
        tt1 = (-b + sq) * inv2a
        t_new = jnp.where(tt0 >= EPS, tt0, tt1)
        hit = ok & (t_new >= EPS)
        blocked = hit & (t_new > lo) & (t_new < hi)
        return jnp.maximum(occ, blocked.astype(jnp.float32))

    def plane_body(i, occ):
        nx_, ny_, nz_, pn = pl_[0, i], pl_[1, i], pl_[2, i], pl_[3, i]
        denom = dx * nx_ + dy * ny_ + dz * nz_
        ok = jnp.abs(denom) > EPS
        on = ox * nx_ + oy * ny_ + oz * nz_
        t_new = (pn - on) / jnp.where(ok, denom, 1.0)
        hit = ok & (t_new >= 0.0)
        blocked = hit & (t_new > lo) & (t_new < hi)
        return jnp.maximum(occ, blocked.astype(jnp.float32))

    def tri_slot(win, b, j, occ):
        t_new, hit, _n3 = _tri_slot_math(win, j, ox, oy, oz, dx, dy, dz)
        blocked = hit & (t_new > lo) & (t_new < hi)
        return jnp.maximum(occ, blocked.astype(jnp.float32))

    occ = jax.lax.fori_loop(0, ns, sphere_body, occ0)
    occ = jax.lax.fori_loop(0, np_, plane_body, occ)
    want = interest if interest is not None else jnp.ones(ox.shape) > 0.0
    occ = _stream_tri_blocks(
        stream_ref, taabb, window, sem, nt, tri_slot,
        ox, oy, oz, dx, dy, dz, want & (occ == 0.0), occ,
        t_hi_from_carry0=False, t_hi=hi,
    )
    return occ > 0.0


def _trace_tile(
    sph, pl_, tri, mat, light, ns, np_, nt, nl, max_depth, bias,
    ox0, oy0, oz0, dx0, dy0, dz0, live0=None, min_weight=0.0, taabb=None,
    closest_fn=None, any_fn=None,
):
    """Full Whitted chain for one [SUB, LANE] ray tile -> (r, g, b).

    Shared by the single-sample kernel and the in-kernel spp sampler.
    `live0` (0/1 float) marks valid lanes: padding lanes in the last
    partial tile start dead so they can never extend the whole-tile
    early-exit depth loop (their outputs are discarded anyway).
    `closest_fn(o..., d..., interest)` / `any_fn(o..., d..., lo, hi,
    interest)` override the primitive scans — the HBM-streamed kernel
    injects its windowed variants; default = the SMEM scans."""
    if closest_fn is None:
        closest_fn = lambda cox, coy, coz, cdx, cdy, cdz, interest: (
            _closest_hit(
                sph, pl_, tri, mat, ns, np_, nt,
                cox, coy, coz, cdx, cdy, cdz, taabb=taabb,
                interest=interest,
            )
        )
    if any_fn is None:
        any_fn = lambda aox, aoy, aoz, adx, ady, adz, lo, hi, interest: (
            _any_hit(
                sph, pl_, tri, ns, np_, nt, aox, aoy, aoz, adx, ady, adz,
                lo, hi, taabb=taabb, interest=interest,
            )
        )
    shape = ox0.shape
    if True:  # preserved indentation of the original kernel body
        zero = jnp.zeros(shape)
        if live0 is None:
            live0 = jnp.ones(shape)
        # Depth loop as a while_loop with whole-tile early exit: one body
        # keeps the Mosaic compile tractable, and the loop stops as soon
        # as every lane in the tile is dead (miss or no reflective
        # continuation). Dead-lane bounces are identity maps on the
        # carry, so exiting early is bit-identical to running out the
        # full max_depth — but on typical scenes most tiles finish in
        # 1-2 bounces instead of 10. `live` rides as 0/1 float (i1
        # vectors can't be loop-carried).
        carry0 = (
            ox0, oy0, oz0, dx0, dy0, dz0,
            jnp.ones(shape),  # weight
            live0,  # live (0/1)
            zero, zero, zero,  # accum rgb
        )

        def depth_cond(c):
            i, carry = c
            return (i < max_depth) & (jnp.max(carry[7]) > 0.0)

        def depth_step(c):
            i, carry = c
            return i + 1, depth_body(carry)

        def depth_body(carry):
            ox, oy, oz, dx, dy, dz, weight, live_f, acc_r, acc_g, acc_b = carry
            live = live_f > 0.0
            skr, skg, skb = _sky(dx, dy, dz)

            (t, nx, ny, nz, ar, ag, ab, spec, shin) = closest_fn(
                ox, oy, oz, dx, dy, dz, live
            )
            hit = t < _INF
            miss = live & ~hit
            acc_r += jnp.where(miss, weight * skr, 0.0)
            acc_g += jnp.where(miss, weight * skg, 0.0)
            acc_b += jnp.where(miss, weight * skb, 0.0)
            shade = live & hit

            # Front-face flip (Scene.h:145-146)
            ndotd = nx * dx + ny * dy + nz * dz
            flip = jnp.where(ndotd < 0.0, 1.0, -1.0)
            nx, ny, nz = nx * flip, ny * flip, nz * flip

            t_safe = jnp.where(hit, t, 0.0)
            px = ox + dx * t_safe
            py = oy + dy * t_safe
            pz = oz + dz * t_safe

            # Direct lighting, binary shadows (Scene.h:79-129)
            diff_r = jnp.zeros(shape)
            diff_g = jnp.zeros(shape)
            diff_b = jnp.zeros(shape)
            spec_r = jnp.zeros(shape)
            spec_g = jnp.zeros(shape)
            spec_b = jnp.zeros(shape)
            sox = px + nx * bias
            soy = py + ny * bias
            soz = pz + nz * bias
            spec_on = spec > 0.0  # opaque kernel: transparency == 0

            def light_body(li, carry):
                dr, dg, db, sr, sg, sb = carry
                lx, ly, lz = light[0, li], light[1, li], light[2, li]
                er, eg, eb = light[3, li], light[4, li], light[5, li]
                vx, vy, vz = lx - px, ly - py, lz - pz
                dist2 = vx * vx + vy * vy + vz * vz
                dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
                inv_d = 1.0 / dist
                ldx, ldy, ldz = vx * inv_d, vy * inv_d, vz * inv_d
                ndotl = jnp.maximum(0.0, nx * ldx + ny * ldy + nz * ldz)
                ok = shade & (dist > bias) & (ndotl > 0.0)

                # Skip the whole shadow scan when no lane needs this
                # light — padded light slots (emit = 0, position = far)
                # and back-facing tiles would otherwise pay a full
                # primitive scan for nothing.
                def do_scan():
                    return any_fn(
                        sox, soy, soz, ldx, ldy, ldz,
                        jnp.full(shape, bias), dist - bias, ok,
                    ).astype(jnp.float32)

                occ_f = jax.lax.cond(
                    jnp.any(ok), do_scan, lambda: jnp.ones(shape)
                )
                vis = ok & (occ_f == 0.0)
                inv_d2 = inv_d * inv_d
                contrib = inv_d2 * ndotl
                dr += jnp.where(vis, er * contrib, 0.0)
                dg += jnp.where(vis, eg * contrib, 0.0)
                db += jnp.where(vis, eb * contrib, 0.0)
                # Blinn-Phong (Scene.h:115-123)
                hx_, hy_, hz_ = ldx - dx, ldy - dy, ldz - dz  # l + view
                h2 = hx_ * hx_ + hy_ * hy_ + hz_ * hz_
                invh = jax.lax.rsqrt(jnp.maximum(h2, 1e-24))
                ndoth = jnp.maximum(
                    0.0, (nx * hx_ + ny * hy_ + nz * hz_) * invh
                )
                s_ok = vis & spec_on & (ndoth > 0.0)
                ndoth_s = jnp.where(s_ok, ndoth, 1.0)
                sf = jnp.exp(shin * jnp.log(ndoth_s)) * inv_d2
                sr += jnp.where(s_ok, er * sf, 0.0)
                sg += jnp.where(s_ok, eg * sf, 0.0)
                sb += jnp.where(s_ok, eb * sf, 0.0)
                return dr, dg, db, sr, sg, sb

            (diff_r, diff_g, diff_b, spec_r, spec_g, spec_b) = (
                jax.lax.fori_loop(
                    0, nl, light_body,
                    (diff_r, diff_g, diff_b, spec_r, spec_g, spec_b),
                )
            )
            local_r = ar * diff_r + spec_r * spec
            local_g = ag * diff_g + spec_g * spec
            local_b = ab * diff_b + spec_b * spec
            acc_r += jnp.where(shade, weight * local_r, 0.0)
            acc_g += jnp.where(shade, weight * local_g, 0.0)
            acc_b += jnp.where(shade, weight * local_b, 0.0)

            # Reflection chain (Scene.h:189-195); opaque: refl = specular.
            # Chains whose weight would drop below min_weight are pruned:
            # their remaining contribution is bounded by weight * local
            # radiance (see RenderConfig.min_weight).
            cont = shade & (spec > bias) & (weight * spec >= min_weight)
            ddn = dx * nx + dy * ny + dz * nz
            rx = dx - 2.0 * ddn * nx
            ry = dy - 2.0 * ddn * ny
            rz = dz - 2.0 * ddn * nz
            r2 = rx * rx + ry * ry + rz * rz
            invr = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
            rx, ry, rz = rx * invr, ry * invr, rz * invr
            ox = jnp.where(cont, px + rx * bias, ox)
            oy = jnp.where(cont, py + ry * bias, oy)
            oz = jnp.where(cont, pz + rz * bias, oz)
            dx = jnp.where(cont, rx, dx)
            dy = jnp.where(cont, ry, dy)
            dz = jnp.where(cont, rz, dz)
            weight = jnp.where(cont, weight * spec, weight)
            return (
                ox, oy, oz, dx, dy, dz, weight,
                cont.astype(jnp.float32), acc_r, acc_g, acc_b,
            )

        _, carry = jax.lax.while_loop(
            depth_cond, depth_step, (jnp.int32(0), carry0)
        )
        ox, oy, oz, dx, dy, dz, weight, live_f, acc_r, acc_g, acc_b = carry
        # Depth exhaustion -> sky (Scene.h:132-134)
        live = live_f > 0.0
        skr, skg, skb = _sky(dx, dy, dz)
        acc_r += jnp.where(live, weight * skr, 0.0)
        acc_g += jnp.where(live, weight * skg, 0.0)
        acc_b += jnp.where(live, weight * skb, 0.0)
        return acc_r, acc_g, acc_b


def _make_kernel(
    ns: int, np_: int, nt: int, nl: int, max_depth: int, bias: float,
    min_weight: float = 0.0,
):
    def kernel(
        sph_ref, pl_ref, tri_ref, taabb_ref, mat_ref, light_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, live_ref,
        r_ref, g_ref, b_ref,
    ):
        r, g, b = _trace_tile(
            sph_ref, pl_ref, tri_ref, mat_ref, light_ref,
            ns, np_, nt, nl, max_depth, bias,
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:], live_ref[:],
            min_weight=min_weight, taabb=taabb_ref,
        )
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = b

    return kernel


def _make_streamed_kernel(
    ns: int, np_: int, nt: int, nl: int, max_depth: int, bias: float,
    min_weight: float = 0.0,
):
    """Chain kernel with HBM-streamed triangle blocks (nt > MAX_PRIMS)."""

    def kernel(
        sph_ref, pl_ref, matsp_ref, light_ref, taabb_ref, stream_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, live_ref,
        r_ref, g_ref, b_ref,
        window, sem,
    ):
        closest_fn = lambda cox, coy, coz, cdx, cdy, cdz, interest: (
            _closest_hit_streamed(
                sph_ref, pl_ref, matsp_ref, stream_ref, taabb_ref,
                window, sem, ns, np_, nt,
                cox, coy, coz, cdx, cdy, cdz, interest=interest,
            )
        )
        any_fn = lambda aox, aoy, aoz, adx, ady, adz, lo, hi, interest: (
            _any_hit_streamed(
                sph_ref, pl_ref, stream_ref, taabb_ref, window, sem,
                ns, np_, nt, aox, aoy, aoz, adx, ady, adz, lo, hi,
                interest=interest,
            )
        )
        r, g, b = _trace_tile(
            sph_ref, pl_ref, None, matsp_ref, light_ref,
            ns, np_, nt, nl, max_depth, bias,
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:], live_ref[:],
            min_weight=min_weight, closest_fn=closest_fn, any_fn=any_fn,
        )
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = b

    return kernel


def chain_trace_streamed_pallas(
    flat: FlatScene, o: jnp.ndarray, d: jnp.ndarray, cfg
) -> jnp.ndarray:
    """Forward fused trace for triangle counts past SMEM residency:
    [R,3] origins/dirs -> [R,3] HDR radiance, triangle data DMA-streamed
    from HBM per non-culled block (the reference's Model is size-
    unbounded, Shape.h:269-300; this lifts the fused path's 8,192 cap)."""
    r = o.shape[0]
    sub = DENSE_SUB  # streaming implies a dense mesh
    tile = sub * LANE
    n_tiles = -(-r // tile)
    pad = n_tiles * tile - r

    def shape_ray(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_tiles * sub, LANE).astype(jnp.float32)

    ox, oy, oz = (shape_ray(o[:, i]) for i in range(3))
    dx, dy = shape_ray(d[:, 0]), shape_ray(d[:, 1])
    dz = shape_ray(d[:, 2], fill=1.0)
    live = shape_ray(jnp.ones((r,), jnp.float32))

    dm = jnp.mean(d, axis=0)
    dm = jax.lax.stop_gradient(
        dm * jax.lax.rsqrt(jnp.maximum(jnp.sum(dm * dm), 1e-20))
    )
    (sph, pl_, mat_sp, light, taabb, stream), _ = pack_streamed_tables(
        flat, dmean=dm
    )
    kernel = _make_streamed_kernel(
        flat.n_spheres, flat.n_planes, flat.n_triangles, flat.n_lights,
        cfg.max_depth, cfg.bias, cfg.min_weight,
    )

    smem = lambda t: pl.BlockSpec(
        t.shape, lambda i, _nz=t.ndim: (0,) * _nz, memory_space=pltpu.SMEM
    )
    ray_spec = pl.BlockSpec(
        (sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem(sph), smem(pl_), smem(mat_sp), smem(light),
                  smem(taabb), pl.BlockSpec(memory_space=pl.ANY)]
        + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * sub, LANE), jnp.float32)
            for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((STREAM_ROWS, TRI_BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(sph, pl_, mat_sp, light, taabb, stream,
      ox, oy, oz, dx, dy, dz, live)

    rgb = jnp.stack([c.reshape(-1)[:r] for c in out], axis=-1)
    return rgb.astype(o.dtype)


def pack_scene_tables(flat: FlatScene):
    """FlatScene -> SMEM tables (degenerate values in padded slots)."""
    dt = jnp.float32
    s_act = flat.sph_active
    sph = jnp.stack(
        [
            jnp.where(s_act, flat.sph_centers[:, 0], 0.0),
            jnp.where(s_act, flat.sph_centers[:, 1], 0.0),
            jnp.where(s_act, flat.sph_centers[:, 2], 0.0),
            jnp.where(s_act, flat.sph_radii**2, -1.0),  # disc<0 => miss
        ]
    ).astype(dt) if flat.n_spheres else jnp.zeros((4, 1), dt)

    p_act = flat.pl_active
    pn = jnp.sum(flat.pl_points * flat.pl_normals, axis=1)
    pl_ = jnp.stack(
        [
            jnp.where(p_act, flat.pl_normals[:, 0], 0.0),  # n=0 => miss
            jnp.where(p_act, flat.pl_normals[:, 1], 0.0),
            jnp.where(p_act, flat.pl_normals[:, 2], 0.0),
            jnp.where(p_act, pn, 0.0),
        ]
    ).astype(dt) if flat.n_planes else jnp.zeros((4, 1), dt)

    t_act = flat.tri_active
    def m(v, col):
        return jnp.where(t_act, v[:, col], 0.0)
    tri = jnp.stack(
        [
            m(flat.tri_v0, 0), m(flat.tri_v0, 1), m(flat.tri_v0, 2),
            m(flat.tri_e1, 0), m(flat.tri_e1, 1), m(flat.tri_e1, 2),  # e1,e2=0 => a=0 => miss
            m(flat.tri_e2, 0), m(flat.tri_e2, 1), m(flat.tri_e2, 2),
            m(flat.tri_nunit, 0), m(flat.tri_nunit, 1), m(flat.tri_nunit, 2),
        ]
    ).astype(dt) if flat.n_triangles else jnp.zeros((12, 1), dt)

    mat = jnp.stack(
        [
            flat.albedo[:, 0], flat.albedo[:, 1], flat.albedo[:, 2],
            flat.specular, flat.shininess, flat.transparency,
            flat.refractive_index,  # row 6: used by the wavefront kernel
        ]
    ).astype(dt) if flat.n_primitives else jnp.zeros((7, 1), dt)

    l_act = flat.light_active
    emit = flat.light_colors * flat.light_intensities[:, None]
    far = 1.0e7
    light = jnp.stack(
        [
            jnp.where(l_act, flat.light_positions[:, 0], far),
            jnp.where(l_act, flat.light_positions[:, 1], far),
            jnp.where(l_act, flat.light_positions[:, 2], far),
            jnp.where(l_act, emit[:, 0], 0.0),
            jnp.where(l_act, emit[:, 1], 0.0),
            jnp.where(l_act, emit[:, 2], 0.0),
            # row 6: active flag — the wavefront kernel's shadow march
            # must not walk 64 steps toward a padded light slot.
            l_act.astype(dt),
        ]
    ).astype(dt) if flat.n_lights else jnp.zeros((7, 1), dt)
    return sph, pl_, tri, mat, light


def chain_trace_pallas(
    flat: FlatScene, o: jnp.ndarray, d: jnp.ndarray, cfg
) -> jnp.ndarray:
    """Forward fused trace: [R,3] origins/dirs -> [R,3] HDR radiance."""
    if flat.n_triangles > MAX_PRIMS:
        return chain_trace_streamed_pallas(flat, o, d, cfg)
    r = o.shape[0]
    sub, _ = tile_layout(flat.n_triangles)
    tile = sub * LANE
    n_tiles = -(-r // tile)
    pad = n_tiles * tile - r

    def shape_ray(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_tiles * sub, LANE).astype(jnp.float32)

    ox, oy, oz = (shape_ray(o[:, i]) for i in range(3))
    # Padding lanes get a benign unit direction: d = 0 would make the
    # sphere quadratic divide by a = d.d = 0 (inf/NaN poisons backward
    # parameter sums even under zero cotangents).
    dx, dy = shape_ray(d[:, 0]), shape_ray(d[:, 1])
    dz = shape_ray(d[:, 2], fill=1.0)
    # Validity mask: padding lanes start dead so they never extend the
    # whole-tile early-exit depth loop (ADVICE r01).
    live = shape_ray(jnp.ones((r,), jnp.float32))

    # Mean primary direction -> front-to-back block order (the per-lane
    # best-t bound then culls a closed mesh's far side). Value-only
    # (stop_gradient): visit order never changes results, only speed.
    dm = jnp.mean(d, axis=0)
    dm = jax.lax.stop_gradient(
        dm * jax.lax.rsqrt(jnp.maximum(jnp.sum(dm * dm), 1e-20))
    )
    (sph, pl_, tri, taabb, mat, light), _ = pack_forward_tables_perm(
        flat, dmean=dm
    )
    kernel = _make_kernel(
        flat.n_spheres, flat.n_planes, flat.n_triangles, flat.n_lights,
        cfg.max_depth, cfg.bias, cfg.min_weight,
    )

    smem = lambda t: pl.BlockSpec(
        t.shape, lambda i: tuple(0 for _ in t.shape), memory_space=pltpu.SMEM
    )
    ray_spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem(sph), smem(pl_), smem(tri), smem(taabb), smem(mat),
                  smem(light)]
        + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * sub, LANE), jnp.float32)
            for _ in range(3)
        ),
    )(sph, pl_, tri, taabb, mat, light, ox, oy, oz, dx, dy, dz, live)

    rgb = jnp.stack([c.reshape(-1)[:r] for c in out], axis=-1)
    return rgb.astype(o.dtype)


#: Primitive-count ceiling for the SMEM-resident scan (beyond this the
#: XLA path takes over). Empirically probed on TPU v5 lite: 19 fp32 rows
#: x 8192 columns (608 KB) of SMEM tables compile and run; 16384 columns
#: do not. The forward kernels scan primitives with fori_loops, so the
#: ceiling is SMEM capacity, not compile time. The fused BACKWARD
#: (chain_grad) covers the same range: the blocked adjoint kernel's
#: compile cost is primitive-count independent, so MAX_PRIMS_GRAD ==
#: MAX_PRIMS.
MAX_PRIMS = 8192


def pallas_applicable(flat: FlatScene, cfg, mode: str) -> bool:
    """True if a fused kernel covers (scene, config, mode).

    chain mode -> this module's reflection-chain kernel (binary shadows;
    for the opaque scenes chain mode is selected for, the reference march
    IS binary, but callers forcing chain on transparent scenes keep march
    semantics on the XLA path); past MAX_PRIMS triangles the chain path
    streams triangle blocks from HBM up to MAX_TRIS_STREAM. wavefront
    mode -> the general kernel (kernels/wavefront_trace.py), which
    implements both the reference transmittance march and binary shadows
    in-kernel."""
    non_tri = flat.n_primitives - flat.n_triangles
    if mode == "chain":
        if non_tri > MAX_PRIMS or flat.n_triangles > MAX_TRIS_STREAM:
            return False
        return cfg.shadow_mode == "binary"
    if flat.n_primitives > MAX_PRIMS:
        return False
    if mode == "wavefront":
        return cfg.shadow_mode in ("binary", "march")
    return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def chain_trace(flat: FlatScene, o: jnp.ndarray, d: jnp.ndarray, cfg):
    """Differentiable fused trace: Pallas kernel for the primal, XLA
    autodiff of the (numerically matching) chain integrator for the
    backward pass — the standard primal-kernel + reference-VJP pattern."""
    return chain_trace_pallas(flat, o, d, cfg)


def _chain_trace_fwd(flat, o, d, cfg):
    return chain_trace_pallas(flat, o, d, cfg), (flat, o, d)


def _chain_trace_bwd(cfg, res, g):
    from raytracingengine_tpu.render.integrator import integrate_chain

    flat, o, d = res
    _, vjp = jax.vjp(lambda fl, oo, dd: integrate_chain(fl, oo, dd, cfg), flat, o, d)
    return vjp(g)


chain_trace.defvjp(_chain_trace_fwd, _chain_trace_bwd)
