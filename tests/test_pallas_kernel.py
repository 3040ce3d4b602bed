"""Fused Pallas chain-trace kernel: parity with the XLA integrator.

Runs in interpreter mode on CPU (tests/conftest.py backend); the real
Mosaic-compiled path is exercised by bench.py on TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import raytracingengine_tpu.kernels.chain_trace as ct
from raytracingengine_tpu.geometry.intersect import flatten_scene
from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.integrator import integrate_chain
from raytracingengine_tpu.scenes.builders import (
    baseline_sphere_scene,
    head_box_scene,
    stress_scene,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(ct.pl, "pallas_call", patched)
    yield


CFG = RenderConfig(shadow_mode="binary")


def _parity(scene, camera, cfg=CFG, atol=1e-4):
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    ref = integrate_chain(flat, o, d, cfg)
    out = ct.chain_trace_pallas(flat, o, d, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_head_box_parity():
    scene, camera = head_box_scene(width=24, height=24, spp=1)
    _parity(scene, camera)


def test_sphere_scene_parity():
    scene, camera = baseline_sphere_scene(width=24, height=24, spp=1, n_lights=3)
    _parity(scene, camera)


def test_stress_slice_parity():
    scene, camera = stress_scene(
        n_spheres=16, n_lights=2, width=16, height=16, pad_multiple=8
    )
    _parity(scene, camera)


def test_depth_variants():
    scene, camera = head_box_scene(width=16, height=16, spp=1)
    for depth in (0, 1, 3):
        cfg = RenderConfig(shadow_mode="binary", max_depth=depth)
        _parity(scene, camera, cfg)


def test_custom_vjp_grads_match_xla():
    scene, camera = baseline_sphere_scene(width=12, height=12, spp=1)
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())

    def loss_k(fl):
        return jnp.sum(ct.chain_trace(fl, o, d, CFG) ** 2)

    def loss_x(fl):
        return jnp.sum(integrate_chain(fl, o, d, CFG) ** 2)

    gk = jax.grad(loss_k, allow_int=True)(flat)
    gx = jax.grad(loss_x, allow_int=True)(flat)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_pipeline_use_pallas_flag():
    from raytracingengine_tpu.render.pipeline import render_hdr

    scene, camera = baseline_sphere_scene(width=16, height=16, spp=1)
    cfg_x = RenderConfig(shadow_mode="binary", chunk_size=256)
    cfg_p = RenderConfig(shadow_mode="binary", chunk_size=256, use_pallas=True)
    a = render_hdr(scene, camera, cfg_x)
    b = render_hdr(scene, camera, cfg_p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dense_mesh_beyond_old_prim_cap():
    # >512 primitives through the fori-loop SMEM scan (the old MAX_PRIMS
    # ceiling): a 1,080-triangle bumpy sphere must match the XLA
    # integrator exactly. (The full 6,016-triangle scene runs on real TPU
    # via bench.py; interpret mode keeps this test's mesh smaller.)
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    flat = flatten_scene(scene)
    assert flat.n_primitives > 512
    assert ct.pallas_applicable(flat, CFG, "chain")
    _parity(scene, camera)


def test_dense_mesh_grads_use_blocked_adjoint_kernel():
    # Differentiating a dense-mesh render must use the BLOCKED adjoint
    # kernel (VERDICT r03 task #1: fused backward past the 512-prim
    # unroll cap) — not the unrolled kernel (whose compile time is
    # linear in primitive count) and not the XLA fallback — and its
    # gradients must match XLA autodiff of the chain integrator.
    from raytracingengine_tpu.kernels import chain_grad as cg
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    flat = flatten_scene(scene)
    assert cg._MAX_PRIMS_UNROLL < flat.n_primitives <= cg.MAX_PRIMS_GRAD
    o, d = camera.rays_for_pixels(*camera.pixel_grid())

    called = {"unrolled": 0, "blocked": 0}
    orig_u, orig_b = cg.chain_grad_pallas, cg.chain_grad_pallas_blocked

    def spy_u(*a, **k):
        called["unrolled"] += 1
        return orig_u(*a, **k)

    def spy_b(*a, **k):
        called["blocked"] += 1
        return orig_b(*a, **k)

    # Gradients are compared at SCENE level (grad w.r.t. the Scene
    # pytree through flatten_scene): FlatScene carries redundant
    # parameterizations of the same geometry (v0/e1/e2 + nunit vs
    # ngeo/k) and the kernel and XLA pull back to different ones; the
    # chain rule through flatten_scene reconciles them (round-2 finding,
    # commit d4a1261).
    cg.chain_grad_pallas = spy_u
    cg.chain_grad_pallas_blocked = spy_b
    try:
        gk = jax.grad(
            lambda s: jnp.sum(
                cg.chain_trace_fused(flatten_scene(s), o, d, CFG) ** 2
            ),
            allow_int=True,
        )(scene)
    finally:
        cg.chain_grad_pallas = orig_u
        cg.chain_grad_pallas_blocked = orig_b
    assert called == {"unrolled": 0, "blocked": 1}, called
    gx = jax.grad(
        lambda s: jnp.sum(integrate_chain(flatten_scene(s), o, d, CFG) ** 2),
        allow_int=True,
    )(scene)
    _assert_scene_grads_close(gk, gx)


def _assert_scene_grads_close(gk, gx, rtol=2e-3, atol=2e-4):
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(gk)[0], jax.tree.leaves(gx)
    ):
        a, b = np.asarray(a), np.asarray(b)
        if not np.issubdtype(a.dtype, np.floating) or b.size == 0:
            continue
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol + 1e-3 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_scrambled_dense_mesh_grads_match_xla():
    # Same gate under a worst-case authoring order: the blocked adjoint
    # accumulates triangle cotangents in SCAN order (spatially reordered
    # tables) and must scatter them back to authoring order exactly.
    from raytracingengine_tpu.kernels import chain_grad as cg
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(
        width=8, height=8, spp=1, ni=16, nj=36, scramble=3
    )
    assert flatten_scene(scene).n_primitives > cg._MAX_PRIMS_UNROLL
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    gk = jax.grad(
        lambda s: jnp.sum(
            cg.chain_trace_fused(flatten_scene(s), o, d, CFG) ** 2
        ),
        allow_int=True,
    )(scene)
    gx = jax.grad(
        lambda s: jnp.sum(integrate_chain(flatten_scene(s), o, d, CFG) ** 2),
        allow_int=True,
    )(scene)
    _assert_scene_grads_close(gk, gx)


def test_aabb_culling_all_blocks_missed():
    # A camera looking AWAY from the mesh: every triangle block is culled,
    # and the kernel must still produce the exact sky/plane-only image.
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene
    from raytracingengine_tpu.core.camera import Camera

    scene, _ = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    # Aim at empty space: camera far beyond the mesh looking further away.
    camera2 = Camera.create(
        (0, 0, 200), focal=8.0, width=8, height=8, near=0.0, far=100.0, spp=1
    )
    flat = flatten_scene(scene)
    o, d = camera2.rays_for_pixels(*camera2.pixel_grid())
    ref = integrate_chain(flat, o, d, CFG)
    out = ct.chain_trace_pallas(flat, o, d, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pack_tri_aabbs_shapes_and_padding():
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene, head_box_scene

    # Small mesh: one block.
    scene, _ = head_box_scene(width=8, height=8, spp=1)
    flat = flatten_scene(scene)
    aabb = ct.pack_tri_aabbs(flat)
    assert aabb.shape == (6, -(-flat.n_triangles // ct.TRI_BLOCK))
    lo, hi = np.asarray(aabb[:3]).T, np.asarray(aabb[3:]).T
    assert (lo <= hi).all()
    # The cube at (0,0,10) size 4: bounds within [-2,2]x[-2,2]x[8,12] (+eps)
    assert lo.min() > -2.1 and hi.max() < 12.1

    # Padded scene: all-padding blocks become far point boxes, not
    # hit-everything boxes.
    scene_p, _ = head_box_scene(width=8, height=8, spp=1, pad_multiple=1024)
    flat_p = flatten_scene(scene_p)
    aabb_p = np.asarray(ct.pack_tri_aabbs(flat_p))
    assert aabb_p.shape == (6, 1024 // ct.TRI_BLOCK)
    # blocks 1.. are all-padding -> far point boxes
    assert (aabb_p[:, 1:] > 1e37).all()

def test_reorder_perms_valid_and_adaptive_choice_never_worse():
    # Both spatial orderings must be true permutations, and the adaptive
    # choice in pack_forward_tables (min summed block surface area over
    # authoring / Morton / median-split) must never produce looser blocks
    # than authoring order.
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, _ = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    flat = flatten_scene(scene)
    nt = flat.n_triangles
    for fn in (ct.triangle_morton_perm, ct.triangle_split_perm):
        perm = np.asarray(fn(flat))
        assert sorted(perm.tolist()) == list(range(nt)), fn.__name__

    sa_auth = float(ct._block_sa_sum(ct.pack_tri_aabbs(flat)))
    _, _, _, taabb, _, _ = ct.pack_forward_tables(flat)
    # taabb's tail columns are treelet-group boxes (pack_group_aabbs);
    # SA comparisons are over the block level only.
    n_blocks = ct.n_culling_blocks(nt)
    assert float(ct._block_sa_sum(taabb[:, :n_blocks])) <= sa_auth * (1 + 1e-6)
    # Group columns bound their blocks.
    groups = np.asarray(taabb[:, n_blocks:])
    blocks = np.asarray(taabb[:, :n_blocks])
    for g in range(groups.shape[1]):
        blk = blocks[:, g * ct.TRI_GROUP : (g + 1) * ct.TRI_GROUP]
        real = blk[0] < 1e37
        if real.any():
            assert (groups[:3, g][:, None] <= blk[:3, real] + 1e-5).all()
            assert (groups[3:, g][:, None] >= blk[3:, real] - 1e-5).all()


def test_scrambled_mesh_reorder_restores_compact_blocks():
    # A mesh whose authoring order was destroyed (random shuffle — the
    # worst case for real OBJ files) must be rescued by the spatial
    # reorder: the chosen blocks must be far tighter than scrambled
    # authoring order. (Result parity under reorder is covered by the
    # dense-mesh parity tests + the tie-break unit test below.)
    import dataclasses

    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    flat = flatten_scene(scene)
    rng = np.random.default_rng(7)
    shuf = rng.permutation(flat.n_triangles)
    flat_s = dataclasses.replace(
        flat,
        tri_v0=flat.tri_v0[shuf],
        tri_e1=flat.tri_e1[shuf],
        tri_e2=flat.tri_e2[shuf],
        tri_nunit=flat.tri_nunit[shuf],
        tri_active=flat.tri_active[shuf],
    )
    sa_scrambled = float(ct._block_sa_sum(ct.pack_tri_aabbs(flat_s)))
    _, _, _, taabb, _, _ = ct.pack_forward_tables(flat_s)
    n_blocks = ct.n_culling_blocks(flat_s.n_triangles)
    sa_chosen = float(ct._block_sa_sum(taabb[:, :n_blocks]))
    assert sa_chosen < 0.5 * sa_scrambled, (sa_chosen, sa_scrambled)


def test_scrambled_dense_mesh_kernel_parity():
    # End-to-end: a dense mesh in worst-case (shuffled) authoring order
    # renders through the fused kernel — spatial reorder + culling +
    # original-index tie-breaks — and must match the XLA integrator,
    # which scans the scrambled table in plain authoring order.
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(
        width=8, height=8, spp=1, ni=16, nj=36, scramble=3
    )
    _parity(scene, camera)


def test_front_to_back_block_order_is_result_identical():
    # The forward kernel sorts treelet groups / blocks front-to-back
    # along the mean ray direction (pack_forward_tables_perm dmean) —
    # visit order must NEVER change the image: the closest-hit update is
    # a lexicographic (t, original-index) min. Compare the kernel
    # (dmean active inside chain_trace_pallas) against the same kernel
    # with the sort forced off, bit for bit.
    from raytracingengine_tpu.kernels import chain_trace as ctm
    from raytracingengine_tpu.scenes.builders import dense_mesh_scene

    scene, camera = dense_mesh_scene(width=8, height=8, spp=1, ni=16, nj=36)
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    with_sort = np.asarray(ctm.chain_trace_pallas(flat, o, d, CFG))
    orig = ctm.pack_forward_tables_perm
    ctm.pack_forward_tables_perm = lambda fl, dmean=None, _o=orig: _o(
        fl, dmean=None
    )
    try:
        without = np.asarray(ctm.chain_trace_pallas(flat, o, d, CFG))
    finally:
        ctm.pack_forward_tables_perm = orig
    np.testing.assert_array_equal(with_sort, without)


def test_morton_perm_puts_inactive_triangles_last():
    scene, _ = head_box_scene(width=8, height=8, spp=1, pad_multiple=64)
    flat = flatten_scene(scene)
    perm = np.asarray(ct.triangle_morton_perm(flat))
    act = np.asarray(flat.tri_active)[perm]
    n_act = int(np.asarray(flat.tri_active).sum())
    assert act[:n_act].all() and not act[n_act:].any()


def test_tie_break_resolves_to_authoring_index_order():
    # Two bitwise-identical triangles (so any hitting ray computes
    # EXACTLY equal t for both) with different materials, scanned in the
    # ADVERSARIALLY reversed order a spatial reorder could produce. The
    # original-index carry row must hand the tie to the lower authoring
    # index — the reference's first-wins strict-< scan (Scene.h:218-257).
    # Padded past TRI_BLOCK with distant dummies: the index carry is only
    # compiled in when a reorder is possible (nt > TRI_BLOCK).
    nt = ct.TRI_BLOCK + 2
    col = np.array(
        [-1.0, -1.0, 5.0, 2.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0, -1.0],
        np.float32,
    )
    far = col.copy()
    far[2] = 900.0  # same shape, far behind: hits at t = 900, never wins
    tri = np.stack([col, col] + [far] * ct.TRI_BLOCK, axis=1)  # [12, nt]
    # scan slot 0 = authoring index 1, scan slot 1 = authoring index 0
    gi_row = np.concatenate(
        [[1.0, 0.0], 2.0 + np.arange(ct.TRI_BLOCK)]
    ).astype(np.float32)
    tri13 = np.concatenate([tri, gi_row[None]], axis=0)
    mat = np.zeros((7, nt), np.float32)
    mat[0:3, 0] = (1.0, 0.0, 0.0)  # authoring idx 0: red -> must win
    mat[0:3, 1] = (0.0, 1.0, 0.0)  # authoring idx 1: green
    sph = np.zeros((4, 1), np.float32)
    sph[3] = -1.0
    pl_ = np.zeros((4, 1), np.float32)
    shape = (1, 8)
    rays = [np.zeros(shape, np.float32) for _ in range(5)]
    rays.append(np.ones(shape, np.float32))  # dz = +1 -> hits at t = 5
    out = ct._closest_hit(
        jnp.asarray(sph), jnp.asarray(pl_), jnp.asarray(tri13),
        jnp.asarray(mat), 0, 0, nt, *(jnp.asarray(a) for a in rays),
    )
    t, ar, ag = (np.asarray(out[i]) for i in (0, 4, 5))
    assert np.allclose(t, 5.0)
    assert (ar == 1.0).all() and (ag == 0.0).all()

def test_swizzle_perm_roundtrip_and_patches():
    from raytracingengine_tpu.render.pipeline import _swizzle_perm

    for w, h in [(512, 512), (1920, 1080), (150, 70), (8, 8)]:
        perm, inv = _swizzle_perm(w, h)
        assert sorted(perm.tolist()) == list(range(w * h))
        assert (perm[inv] == np.arange(w * h)).all()
    # At 512^2 the first kernel-tile's worth of pixels must be the
    # top-left 128x64 rectangle, not a 16-row full-width strip.
    perm, _ = _swizzle_perm(512, 512)
    first = perm[: 128 * 64]
    ys, xs = first // 512, first % 512
    assert ys.max() == 63 and xs.max() == 127


def test_swizzle_round_robin_deals_patches_across_shards():
    # round_robin=n interleaves patches across n contiguous runs so each
    # shard of a contiguous split samples the whole image, not one band
    # (profiling/load_balance.py: banded assignment caps predicted
    # scaling efficiency at 0.49 on the 4K stress scene).
    from raytracingengine_tpu.render.pipeline import _swizzle_perm

    w, h, n = 512, 512, 8
    perm, inv = _swizzle_perm(w, h, round_robin=n)
    assert sorted(perm.tolist()) == list(range(w * h))
    assert (perm[inv] == np.arange(w * h)).all()
    # Patches stay intact (first tile is SOME 128x64 rectangle)...
    first = perm[: 128 * 64]
    ys, xs = first // w, first % w
    assert ys.max() - ys.min() == 63 and xs.max() - xs.min() == 127
    # ...and each 1/n contiguous run (one shard) touches rows from both
    # the top and bottom halves of the image.
    run = w * h // n
    for s in range(n):
        rows = perm[s * run : (s + 1) * run] // w
        assert rows.min() < h // 4 and rows.max() >= 3 * h // 4


def test_swizzled_render_bit_identical_to_rowmajor_kernel():
    # Image size that doesn't divide the 128x64 patch: partial patches on
    # both axes. render_hdr's swizzle + inverse gather must reproduce the
    # SAME kernel run on plain row-major rays BIT-identically (per-ray
    # results don't depend on tile composition; only grouping changes).
    from raytracingengine_tpu.render.pipeline import render_hdr

    scene, camera = head_box_scene(width=160, height=96, spp=1)
    cfg_p = RenderConfig(shadow_mode="binary", use_pallas=True)
    img = np.asarray(render_hdr(scene, camera, cfg_p))
    flat = flatten_scene(scene)
    o, d = camera.rays_for_pixels(*camera.pixel_grid())
    direct = np.asarray(ct.chain_trace_pallas(flat, o, d, CFG)).reshape(
        96, 160, 3
    )
    np.testing.assert_array_equal(img, direct)


def test_spp_jitter_streams_match_across_paths():
    """Same-seed spp>1 renders agree across the swizzled fused-kernel
    path and the plain XLA path (ADVICE r03): jitter is keyed by the
    pixel's row-major flat index, so the patch swizzle and chunking can
    no longer reassign sample streams. Engines differ only in fp op
    order, so agreement is tight-allclose, not sampling-noise-sized."""
    from raytracingengine_tpu.render.pipeline import render_hdr

    scene, camera = head_box_scene(width=40, height=24, spp=3)
    key = jax.random.PRNGKey(7)
    cfg_p = RenderConfig(
        shadow_mode="binary", use_pallas=True, differentiable=True,
        chunk_size=512,
    )
    cfg_x = RenderConfig(shadow_mode="binary", chunk_size=256)
    a = np.asarray(render_hdr(scene, camera, cfg_p, key=key))
    b = np.asarray(render_hdr(scene, camera, cfg_x, key=key))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_transpose_unswizzle_roundtrip(monkeypatch):
    """The padded-grid transpose unswizzle (pipeline.render_hdr) places
    every pixel exactly where the row-major image expects it, including
    ragged patch grids (1080p: 1080 = 16x64 + 56). Rendering is stubbed
    with a pixel-identity payload so the full-size case runs in ms."""
    import raytracingengine_tpu.render.pipeline as pipe
    from raytracingengine_tpu.scenes.builders import head_box_scene

    def fake_chunk(flat, camera, cfg, mode, px, py, chunk_key,
                   prim_axis=None, base_key=None, pids=None):
        # payload encodes the pixel coordinate this ray belongs to
        f = px.astype(jnp.float32) * 4096.0 + py.astype(jnp.float32)
        return jnp.stack([f, f, f], axis=-1)

    monkeypatch.setattr(pipe, "_render_chunk", fake_chunk)

    for w, h in [(1920, 1080), (256, 128), (1000, 1000)]:
        scene, camera = head_box_scene(width=w, height=h, spp=1)
        cfg = RenderConfig(use_pallas=True, chunk_size=w * h)
        img = np.asarray(pipe.render_hdr(scene, camera, cfg))[..., 0]
        yy, xx = np.mgrid[0:h, 0:w]
        expect = xx * 4096.0 + yy
        np.testing.assert_array_equal(img, expect)


def test_transpose_swizzle_render_matches_xla():
    """Exact-patch-fit size (128x128 with the 128x64 tile): the padded-
    grid constant-coordinate path must render identically to the XLA
    integrator."""
    from raytracingengine_tpu.render.pipeline import render_hdr
    from raytracingengine_tpu.scenes.builders import baseline_sphere_scene

    scene, camera = baseline_sphere_scene(width=128, height=128, spp=1)
    cfg_x = RenderConfig(shadow_mode="binary", chunk_size=128 * 128)
    cfg_p = RenderConfig(shadow_mode="binary", chunk_size=128 * 128,
                         use_pallas=True)
    a = np.asarray(render_hdr(scene, camera, cfg_x))
    b = np.asarray(render_hdr(scene, camera, cfg_p))
    diff = np.abs(a - b).max(axis=-1)
    # kernel-vs-XLA fp noise (fused rsqrt/pow) at shadow boundaries: a
    # small pixel fraction sits above 1e-4, none above 1e-3
    assert float(diff.max()) < 1e-3
    assert float((diff > 1e-4).mean()) < 0.01
