"""Fused backward pass for the wavefront (transparency) kernel.

The forward wavefront kernel (wavefront_trace.py) executes the
reference's full TraceRay recursion (/root/reference/RaytracingEngine/
Scene.h:131-198) as a per-lane DFS over the binary (reflect, refract)
tree. Until round 5 its custom_vjp backward was XLA autodiff of the
fixed-trip wavefront integrator — a ~4,000x cliff (BENCH_DETAIL_r04
glass_train: 0.01 Mrays/s). This module runs the adjoint fused on-chip.

Strategy — taped DFS with a mirrored cotangent stack:

  * REPLAY: the kernel re-runs the forward DFS loop (pop one node per
    live lane, push up to two children), writing each iteration's popped
    node state (o, d, weight, depth, live) to an HBM-resident tape via
    async DMA. The replay skips all lighting/shadow work — the node
    SEQUENCE only depends on hit geometry and push predicates.
  * REVERSE: nodes are processed in reverse pop order. The key
    structural fact: the reverse of a stack execution is itself a stack
    execution — at any point, the set of "children processed in reverse
    whose parent is still pending" is exactly the forward ray stack's
    contents at that iteration, in the same order. So a per-lane
    COTANGENT stack (VMEM, same capacity as the forward ray stack)
    carries child state-cotangents to their parents: processing node k
    pops the cotangents of the children it pushed (refraction on top —
    it was pushed last), runs the node's shade + child construction
    under `jax.vjp` with those cotangents plus the rgb cotangent, and
    pushes its own state cotangent. Forward truncation (budget cap)
    falls out for free: never-popped nodes are the final stack contents,
    so the reverse starts with that many ZERO cotangents pre-loaded.
  * Shadow transmittance T enters the vjp'd node function as an INPUT:
    its only nonzero adjoint a.e. is through the transparencies of the
    crossed surfaces (T = prod clamp(tau_i, 0, 1); every geometry /
    position dependency is piecewise constant — the XLA autodiff of the
    march agrees, see shading.transmittance_hard). The march is replayed
    once more per light wherever cot_T != 0, accumulating
    cot_tau_i = cot_T * T / tau_i into the winning primitive's material
    row — the exact product-rule adjoint, without differentiating a
    while loop.

This (unrolled) kernel python-unrolls the primitive scan inside the
vjp'd node function, so scene tables live as whole VMEM loads whose
cotangents fall directly out of `jax.vjp` — compile cost linear in
primitive count, capped at chain_grad._MAX_PRIMS_UNROLL. Denser scenes
(to chain_trace.MAX_PRIMS) use the blocked wavefront adjoint in this
module, whose compile cost is primitive-count independent
(winner-position pullback, as in chain_grad's blocked kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingengine_tpu.geometry.intersect import EPS, FlatScene
from raytracingengine_tpu.kernels.chain_trace import (
    LANE,
    _INF,
    pack_scene_tables,
)
from raytracingengine_tpu.kernels.wavefront_trace import (
    _closest_hit_full,
    _any_hit,
    _march_T,
    _nearest_t_tau,
)

#: Backward tile sublane count: 8 rows = one native fp32 VPU tile and a
#: bounded VMEM footprint for the two per-lane stacks.
WG_SUB = 8


def _closest_hit_full_unrolled(tables, ns, np_, nt, ox, oy, oz, dx, dy, dz):
    """Python-unrolled closest hit -> (t, n, ar, ag, ab, spec, shin,
    tau, eta): the 11-field scan of wavefront_trace._closest_hit_full
    with the autodiff guards of chain_grad._closest_hit_unrolled
    (finite adjoints on masked garbage lanes). Strict-< first-wins in
    authoring table order == the reference scan (Scene.h:218-257)."""
    sph, pl_, tri, mat, _ = tables
    shape = ox.shape
    carry = jnp.concatenate(
        [jnp.full((1,) + shape, _INF), jnp.zeros((10,) + shape)], axis=0
    )
    a_coef = dx * dx + dy * dy + dz * dz

    def upd(carry, t_new, hit, n3, gi):
        t = carry[0]
        closer = hit & (t_new < t)
        nxn, nyn, nzn = n3
        one = jnp.ones(shape)
        new = jnp.stack(
            [
                t_new, nxn, nyn, nzn,
                mat[0, gi] * one, mat[1, gi] * one, mat[2, gi] * one,
                mat[3, gi] * one, mat[4, gi] * one, mat[5, gi] * one,
                mat[6, gi] * one,
            ]
        )
        return jnp.where(closer[None], new, carry)

    for i in range(ns):
        cx, cy, cz, r2 = sph[0, i], sph[1, i], sph[2, i], sph[3, i]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - 4.0 * a_coef * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.where(ok, jnp.maximum(disc, 0.0), 1.0))
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
        g_ok = g2 > 1e-16
        inv = jnp.where(g_ok, jax.lax.rsqrt(jnp.where(g_ok, g2, 1.0)), 0.0)
        carry = upd(carry, t_new, hit, (gx * inv, gy * inv, gz * inv), i)

    for i in range(np_):
        nx_, ny_, nz_, pn = pl_[0, i], pl_[1, i], pl_[2, i], pl_[3, i]
        denom = dx * nx_ + dy * ny_ + dz * nz_
        ok = jnp.abs(denom) > EPS
        on = ox * nx_ + oy * ny_ + oz * nz_
        t_new = (pn - on) / jnp.where(ok, denom, 1.0)
        hit = ok & (t_new >= 0.0)
        one = jnp.ones(shape)
        carry = upd(carry, t_new, hit, (nx_ * one, ny_ * one, nz_ * one), ns + i)

    for i in range(nt):
        v0x, v0y, v0z = tri[0, i], tri[1, i], tri[2, i]
        e1x, e1y, e1z = tri[3, i], tri[4, i], tri[5, i]
        e2x, e2y, e2z = tri[6, i], tri[7, i], tri[8, i]
        nux, nuy, nuz = tri[9, i], tri[10, i], tri[11, i]
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
        one = jnp.ones(shape)
        carry = upd(
            carry, t_new, hit, (nux * one, nuy * one, nuz * one), ns + np_ + i
        )

    return tuple(carry[i] for i in range(11))


def _node_children_rgb(hitf, state, lights, Ts, masks, bias, min_weight,
                       max_depth_unused=None):
    """Shared node math GIVEN the hit fields: shading + the two child
    states, mirroring wavefront_trace._make_wavefront_kernel's body
    exactly (Scene.h:131-198 weighting). Pure function of its inputs —
    both adjoint variants jax.vjp it (the unrolled one with hitf coming
    from the unrolled scan inside the same vjp; the blocked one with
    hitf as direct inputs whose cotangents get pulled back per-winner).

    `Ts[li]` is the light's shadow transmittance (march product or
    binary), a differentiable input; `masks` = (live, at_max) booleans.
    Returns ((refl7), (refr7), (cr, cg, cb), (push_refl, push_refr));
    child states are zero-masked where not pushed, so their cotangents
    vanish for unpushed lanes."""
    ox, oy, oz, dx, dy, dz, weight = state
    (t, nx, ny, nz, ar, ag, ab, spec, shin, tau_raw, eta_t) = hitf
    live, at_max = masks
    shape = ox.shape
    zero = jnp.zeros(shape)

    if_max_sky = live & at_max
    shadeable = live & ~at_max
    hit = t < _INF
    miss = shadeable & ~hit
    shade = shadeable & hit
    sky_lanes = if_max_sky | miss

    t_sky = 0.5 * (dy + 1.0)
    skr = 1.0 - 0.5 * t_sky
    skg = 1.0 - 0.3 * t_sky
    skb = jnp.ones(shape)
    cr = jnp.where(sky_lanes, weight * skr, 0.0)
    cg = jnp.where(sky_lanes, weight * skg, 0.0)
    cb = jnp.where(sky_lanes, weight * skb, 0.0)

    # Front-face flip (Scene.h:145-146)
    ndotd = nx * dx + ny * dy + nz * dz
    front = ndotd < 0.0
    flip = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    t_safe = jnp.where(hit, t, 0.0)
    px = ox + dx * t_safe
    py = oy + dy * t_safe
    pz = oz + dz * t_safe
    tau = jnp.clip(tau_raw, 0.0, 1.0)
    spec_on = (tau_raw <= 0.0) & (spec > 0.0)  # Scene.h:115

    diff_r = zero
    diff_g = zero
    diff_b = zero
    spec_r = zero
    spec_g = zero
    spec_b = zero
    for li, (lx, ly, lz, er, eg, eb, l_act_f) in enumerate(lights):
        l_act = l_act_f > 0.0
        vx, vy, vz = lx - px, ly - py, lz - pz
        dist2 = vx * vx + vy * vy + vz * vz
        d_ok = dist2 > 1e-20
        dist = jnp.sqrt(jnp.where(d_ok, dist2, 1.0))
        inv_d = jnp.where(d_ok, 1.0 / dist, 0.0)
        ldx, ldy, ldz = vx * inv_d, vy * inv_d, vz * inv_d
        ndotl = jnp.maximum(0.0, nx * ldx + ny * ldy + nz * ldz)
        ok = shade & l_act & (dist > bias) & (ndotl > 0.0)
        T = Ts[li]
        vis = ok & (T > bias)
        inv_d2 = inv_d * inv_d
        contrib = inv_d2 * ndotl * T
        diff_r += jnp.where(vis, er * contrib, 0.0)
        diff_g += jnp.where(vis, eg * contrib, 0.0)
        diff_b += jnp.where(vis, eb * contrib, 0.0)
        hx_, hy_, hz_ = ldx - dx, ldy - dy, ldz - dz
        h2 = hx_ * hx_ + hy_ * hy_ + hz_ * hz_
        h_ok = h2 > 1e-16
        invh = jnp.where(h_ok, jax.lax.rsqrt(jnp.where(h_ok, h2, 1.0)), 0.0)
        ndoth = jnp.maximum(0.0, (nx * hx_ + ny * hy_ + nz * hz_) * invh)
        s_ok = vis & spec_on & (ndoth > 0.0)
        ndoth_s = jnp.where(s_ok, ndoth, 1.0)
        sf = jnp.exp(shin * jnp.log(ndoth_s)) * inv_d2 * T
        spec_r += jnp.where(s_ok, er * sf, 0.0)
        spec_g += jnp.where(s_ok, eg * sf, 0.0)
        spec_b += jnp.where(s_ok, eb * sf, 0.0)

    one_m_tau = 1.0 - tau  # Scene.h:171-173
    cr += jnp.where(shade, weight * one_m_tau * (ar * diff_r + spec_r * spec), 0.0)
    cg += jnp.where(shade, weight * one_m_tau * (ag * diff_g + spec_g * spec), 0.0)
    cb += jnp.where(shade, weight * one_m_tau * (ab * diff_b + spec_b * spec), 0.0)

    # ---- Fresnel + children (Scene.h:161-195) ----
    cos_theta = jnp.maximum(0.0, -(nx * dx + ny * dy + nz * dz))
    f0r = (eta_t - 1.0) / (eta_t + 1.0)
    f0 = f0r * f0r
    omc = 1.0 - cos_theta
    omc2 = omc * omc
    fresnel = f0 + (1.0 - f0) * omc2 * omc2 * omc

    eta = jnp.where(front, 1.0 / eta_t, eta_t)
    cosi = jnp.clip(dx * nx + dy * ny + dz * nz, -1.0, 1.0)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir_k = k < 0.0
    k_ok = k > 0.0
    sqk = jnp.where(k_ok, jnp.sqrt(jnp.where(k_ok, k, 1.0)), 0.0)
    coef = eta * cosi + sqk
    rfx = jnp.where(tir_k, 0.0, dx * eta - nx * coef)
    rfy = jnp.where(tir_k, 0.0, dy * eta - ny * coef)
    rfz = jnp.where(tir_k, 0.0, dz * eta - nz * coef)
    rf2 = rfx * rfx + rfy * rfy + rfz * rfz
    rf_ok = rf2 > 1e-24
    rflen = jnp.where(rf_ok, jnp.sqrt(jnp.where(rf_ok, rf2, 1.0)), 0.0)
    wants_refr = shade & (tau > 0.0)
    has_refr = wants_refr & (rflen > bias)
    tir = wants_refr & (rflen <= bias)
    fresnel_eff = jnp.where(tir, 1.0, fresnel)  # Scene.h:185
    inv_rf = jnp.where(rf_ok, jax.lax.rsqrt(jnp.where(rf_ok, rf2, 1.0)), 0.0)
    rfxn, rfyn, rfzn = rfx * inv_rf, rfy * inv_rf, rfz * inv_rf
    refr_w = weight * tau * (1.0 - fresnel)  # pre-TIR F (Scene.h:182)

    reflectiveness = jnp.where(tau > 0.0, fresnel_eff, spec)
    ddn = dx * nx + dy * ny + dz * nz
    rlx = dx - 2.0 * ddn * nx
    rly = dy - 2.0 * ddn * ny
    rlz = dz - 2.0 * ddn * nz
    rl2 = rlx * rlx + rly * rly + rlz * rlz
    rl_ok = rl2 > 1e-24
    inv_rl = jnp.where(rl_ok, jax.lax.rsqrt(jnp.where(rl_ok, rl2, 1.0)), 0.0)
    rlxn, rlyn, rlzn = rlx * inv_rl, rly * inv_rl, rlz * inv_rl
    refl_w = weight * reflectiveness

    push_refl = shade & (reflectiveness > bias) & (refl_w >= min_weight)
    push_refr = has_refr & (refr_w >= min_weight)

    b100 = bias * 1e2  # Scene.h:180
    refl = tuple(
        jnp.where(push_refl, v, 0.0)
        for v in (
            px + rlxn * bias, py + rlyn * bias, pz + rlzn * bias,
            rlxn, rlyn, rlzn, refl_w,
        )
    )
    refr = tuple(
        jnp.where(push_refr, v, 0.0)
        for v in (
            px + rfxn * b100, py + rfyn * b100, pz + rfzn * b100,
            rfxn, rfyn, rfzn, refr_w,
        )
    )
    return refl, refr, (cr, cg, cb), (push_refl, push_refr)


def _make_pop_shade(ns, np_, nt, nl, bias, min_weight):
    """(state7, tables, Ts, masks) -> ((refl7, refr7, rgb3), aux):
    one DFS node's full math with the primitive scan UNROLLED, so
    jax.vjp pulls cotangents straight back to the whole VMEM tables."""

    def pop_shade(state, tables, Ts, masks):
        ox, oy, oz, dx, dy, dz, _w = state
        light = tables[4]
        hitf = _closest_hit_full_unrolled(
            tables, ns, np_, nt, ox, oy, oz, dx, dy, dz
        )
        lights = tuple(
            tuple(light[r, li] for r in range(7)) for li in range(nl)
        )
        refl, refr, rgb, pushes = _node_children_rgb(
            hitf, state, lights, Ts, masks, bias, min_weight
        )
        return (refl, refr, rgb), pushes

    return pop_shade


def _march_tau_row(
    sph, pl_, tri, mat, ns, np_, nt, bias, max_steps, min_t,
    ox, oy, oz, ldx, ldy, ldz, max_dist, active, T_total, cot_T, n_prims,
    taabb=None, scatter=None,
):
    """Replay computeTransmittance (Scene.h:35-77) accumulating the
    transparency adjoint: T = prod_i clamp(tau_i, 0, 1) over crossed
    surfaces, so cot_tau_i = cot_T * T / tau_i (all other dependencies
    of T are piecewise constant — zero adjoint a.e., matching XLA
    autodiff of shading.transmittance_hard). Default scatter python-
    unrolls over primitives (unrolled variant, n_prims static small) ->
    [1, n_prims] row for the material-transparency cotangent; the
    blocked variant passes its own `scatter(pos, val, acc)`."""
    shape = ox.shape
    want = active & (cot_T != 0.0)
    live0 = (want & (max_dist > 0.0)).astype(jnp.float32)

    if scatter is None:
        acc0 = jnp.zeros((1, n_prims), jnp.float32)

        def scatter(pos, val, acc):
            sums = [
                jnp.sum(jnp.where(pos == i, val, 0.0))
                for i in range(n_prims)
            ]
            return acc + jnp.stack(sums)[None, :]
    else:
        acc0 = None  # caller supplies via closure-carried acc below

    state0 = (
        ox, oy, oz,
        jnp.zeros(shape),  # traveled
        jnp.ones(shape),  # running T (for the live-exit conditions)
        live0,
        jnp.int32(0),
        acc0,
    )

    def cond(s):
        return (jnp.max(s[5]) > 0.0) & (s[6] < max_steps)

    def body(s):
        cx, cy, cz, traveled, T, live_f, it, acc = s
        live = live_f > 0.0
        t, tau_raw, pos = _nearest_t_tau(
            sph, pl_, tri, mat, ns, np_, nt, cx, cy, cz, ldx, ldy, ldz,
            taabb=taabb, interest=live, want_pos=True,
        )
        valid = t < _INF
        t = jnp.where(valid, t, 0.0)
        c_zero = valid & (t <= 0.0)
        c_near = valid & (t > 0.0) & (t <= bias)
        c_beyond = valid & (t > bias) & (traveled + t >= max_dist)
        c_pass = valid & (t > bias) & (traveled + t < max_dist)

        step = jnp.where(
            c_zero, bias, jnp.where(c_near | c_pass, t + bias, 0.0)
        )
        tau = jnp.clip(tau_raw, 0.0, 1.0)
        # clip passes gradient on the closed interval (jnp.clip VJP).
        in_clip = (tau_raw >= 0.0) & (tau_raw <= 1.0)
        tau_ok = tau > 1e-12
        val = jnp.where(
            live & c_pass & in_clip & tau_ok,
            cot_T * T_total / jnp.where(tau_ok, tau, 1.0),
            0.0,
        )
        acc = scatter(pos, val, acc)

        ncx = cx + ldx * step
        ncy = cy + ldy * step
        ncz = cz + ldz * step
        n_traveled = traveled + step
        n_T = jnp.where(c_pass, T * tau, T)
        cx = jnp.where(live, ncx, cx)
        cy = jnp.where(live, ncy, cy)
        cz = jnp.where(live, ncz, cz)
        traveled = jnp.where(live, n_traveled, traveled)
        T = jnp.where(live, n_T, T)
        live = (
            live & valid & ~c_beyond & (T > min_t) & (traveled < max_dist)
        )
        return cx, cy, cz, traveled, T, live.astype(jnp.float32), it + 1, acc

    out = jax.lax.while_loop(cond, body, state0)
    return out[7]


def _make_wavefront_grad_kernel(
    ns, np_, nt, nl, max_depth, bias, min_weight, shadow_mode,
    shadow_max_steps, shadow_min_t, budget, table_shapes, sub,
):
    cap = max_depth + 2  # DFS bound (integrator.py:171)
    pop_shade = _make_pop_shade(ns, np_, nt, nl, bias, min_weight)
    n_prims = ns + np_ + nt

    def kernel(
        # SMEM tables for the replay / march fori scans
        sph_s, pl_s, tri13_s, mat_s, light_s,
        # VMEM tables for the vjp'd unrolled node function
        sph_v, pl_v, tri_v, mat_v, light_v,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, live_ref,
        gr_ref, gg_ref, gb_ref,
        # outputs
        gsph_ref, gpl_ref, gtri_ref, gmat_ref, glight_ref,
        gox_ref, goy_ref, goz_ref, gdx_ref, gdy_ref, gdz_ref,
        tape_ref,  # ANY (HBM): [budget, 9, sub, LANE] node tape
        # scratch
        stack_ref,  # VMEM [cap, 8, sub, LANE]: replay ray stack
        cot_ref,    # VMEM [cap, 8, sub, LANE]: cotangent stack (7 used)
        stage_ref,  # VMEM [9, sub, LANE]: DMA staging
        sem,        # DMA semaphore
    ):
        shape = (sub, LANE)
        zero = jnp.zeros(shape)
        one = jnp.ones(shape)
        tables_v = (sph_v[:], pl_v[:], tri_v[:], mat_v[:], light_v[:])

        # ================= phase 1: replay, writing the tape ==========
        stack_ref[0] = jnp.stack(
            [ox_ref[:], oy_ref[:], oz_ref[:],
             dx_ref[:], dy_ref[:], dz_ref[:], one, zero]
        )
        sp0 = live_ref[:]

        def pop(sp_top):
            node = jnp.zeros((8,) + shape)
            for s in range(cap):
                node = jnp.where((sp_top == s)[None], stack_ref[s], node)
            return node

        def push(sp, mask, fields):
            new = jnp.stack(fields)
            for s in range(cap):
                m = mask & (sp == s)
                stack_ref[s] = jnp.where(m[None], new, stack_ref[s])
            return sp + mask.astype(jnp.float32)

        def fwd_cond(c):
            sp, it = c
            return (jnp.max(sp) > 0.0) & (it < budget)

        def fwd_body(c):
            sp, it = c
            live = sp > 0.0
            top = sp - 1.0
            node = pop(top)
            ox, oy, oz = node[0], node[1], node[2]
            dx, dy, dz = node[3], node[4], node[5]
            weight, depth = node[6], node[7]
            sp = jnp.where(live, sp - 1.0, sp)

            # tape the popped node (dead lanes record live = 0)
            stage_ref[...] = jnp.stack(
                [ox, oy, oz, dx, dy, dz, weight, depth,
                 live.astype(jnp.float32)]
            )
            cp = pltpu.make_async_copy(stage_ref, tape_ref.at[it], sem)
            cp.start()
            cp.wait()

            at_max = depth >= max_depth
            shadeable = live & ~at_max
            (t, nx, ny, nz, _ar, _ag, _ab, spec, _sh, tau_raw, eta_t) = (
                _closest_hit_full(
                    sph_s, pl_s, tri13_s, mat_s, ns, np_, nt,
                    ox, oy, oz, dx, dy, dz, interest=shadeable,
                )
            )
            hit = t < _INF
            shade = shadeable & hit
            # children — identical math to the forward kernel body
            ndotd = nx * dx + ny * dy + nz * dz
            front = ndotd < 0.0
            flip = jnp.where(front, 1.0, -1.0)
            nx, ny, nz = nx * flip, ny * flip, nz * flip
            t_safe = jnp.where(hit, t, 0.0)
            px = ox + dx * t_safe
            py = oy + dy * t_safe
            pz = oz + dz * t_safe
            tau = jnp.clip(tau_raw, 0.0, 1.0)

            cos_theta = jnp.maximum(0.0, -(nx * dx + ny * dy + nz * dz))
            f0r = (eta_t - 1.0) / (eta_t + 1.0)
            f0 = f0r * f0r
            omc = 1.0 - cos_theta
            omc2 = omc * omc
            fresnel = f0 + (1.0 - f0) * omc2 * omc2 * omc
            eta = jnp.where(front, 1.0 / eta_t, eta_t)
            cosi = jnp.clip(dx * nx + dy * ny + dz * nz, -1.0, 1.0)
            k = 1.0 - eta * eta * (1.0 - cosi * cosi)
            tir_k = k < 0.0
            sqk = jnp.sqrt(jnp.maximum(k, 0.0))
            coef = eta * cosi + sqk
            rfx = jnp.where(tir_k, 0.0, dx * eta - nx * coef)
            rfy = jnp.where(tir_k, 0.0, dy * eta - ny * coef)
            rfz = jnp.where(tir_k, 0.0, dz * eta - nz * coef)
            rf2 = rfx * rfx + rfy * rfy + rfz * rfz
            rflen = jnp.sqrt(rf2)
            wants_refr = shade & (tau > 0.0)
            has_refr = wants_refr & (rflen > bias)
            tir = wants_refr & (rflen <= bias)
            fresnel_eff = jnp.where(tir, 1.0, fresnel)
            inv_rf = jax.lax.rsqrt(jnp.maximum(rf2, 1e-24))
            rfx, rfy, rfz = rfx * inv_rf, rfy * inv_rf, rfz * inv_rf
            refr_w = weight * tau * (1.0 - fresnel)

            reflectiveness = jnp.where(tau > 0.0, fresnel_eff, spec)
            ddn = dx * nx + dy * ny + dz * nz
            rlx = dx - 2.0 * ddn * nx
            rly = dy - 2.0 * ddn * ny
            rlz = dz - 2.0 * ddn * nz
            rl2 = rlx * rlx + rly * rly + rlz * rlz
            inv_rl = jax.lax.rsqrt(jnp.maximum(rl2, 1e-24))
            rlx, rly, rlz = rlx * inv_rl, rly * inv_rl, rlz * inv_rl
            refl_w = weight * reflectiveness

            push_refl = shade & (reflectiveness > bias) & (refl_w >= min_weight)
            push_refr = has_refr & (refr_w >= min_weight)
            sp = push(
                sp, push_refl,
                (px + rlx * bias, py + rly * bias, pz + rlz * bias,
                 rlx, rly, rlz, refl_w, depth + 1.0),
            )
            b100 = bias * 1e2
            sp = push(
                sp, push_refr,
                (px + rfx * b100, py + rfy * b100, pz + rfz * b100,
                 rfx, rfy, rfz, refr_w, depth + 1.0),
            )
            return sp, it + 1

        sp_fin, n_it = jax.lax.while_loop(
            fwd_cond, fwd_body, (sp0, jnp.int32(0))
        )

        # ================= phase 2: reverse sweep =====================
        for s in range(cap):
            cot_ref[s] = jnp.zeros((8,) + shape)
        gbar = (gr_ref[:], gg_ref[:], gb_ref[:])
        gt0 = tuple(jnp.zeros(s, jnp.float32) for s in table_shapes)

        def cot_gather(idx):
            node = jnp.zeros((8,) + shape)
            for s in range(cap):
                node = jnp.where((idx == s)[None], cot_ref[s], node)
            return node

        def cot_push(rsp, mask, fields7):
            new = jnp.stack(fields7 + (zero,))
            for s in range(cap):
                m = mask & (rsp == s)
                cot_ref[s] = jnp.where(m[None], new, cot_ref[s])
            return rsp + mask.astype(jnp.float32)

        def rbody(k2, carry):
            rsp, gt = carry
            k = n_it - 1 - k2
            cp = pltpu.make_async_copy(tape_ref.at[k], stage_ref, sem)
            cp.start()
            cp.wait()
            st = stage_ref[...]
            live = st[8] > 0.0
            # Dead lanes taped all-zero states (the one-hot pop gather's
            # miss value); a zero direction makes the sphere quadratic's
            # 1/(d.d) infinite and the masked vjp NaN (0 * inf), so give
            # them a benign unit direction — every cotangent they touch
            # is where()-masked to zero anyway.
            ox, oy, oz = st[0], st[1], st[2]
            dx, dy = st[3], st[4]
            dz = jnp.where(live, st[5], 1.0)
            weight, depth = st[6], st[7]
            at_max = depth >= max_depth
            shadeable = live & ~at_max
            state = (ox, oy, oz, dx, dy, dz, weight)
            masks = (live, at_max)

            # Forward-only hit for shadow-ray origins + march inputs.
            (t, nxr, nyr, nzr, _a1, _a2, _a3, _sp4, _sh5, tau_raw, _et) = (
                _closest_hit_full(
                    sph_s, pl_s, tri13_s, mat_s, ns, np_, nt,
                    ox, oy, oz, dx, dy, dz, interest=shadeable,
                )
            )
            hit = t < _INF
            shade_m = shadeable & hit
            ndotd = nxr * dx + nyr * dy + nzr * dz
            flip = jnp.where(ndotd < 0.0, 1.0, -1.0)
            fnx, fny, fnz = nxr * flip, nyr * flip, nzr * flip
            t_safe = jnp.where(hit, t, 0.0)
            px = ox + dx * t_safe
            py = oy + dy * t_safe
            pz = oz + dz * t_safe
            sox = px + fnx * bias
            soy = py + fny * bias
            soz = pz + fnz * bias

            Ts = []
            lgeo = []
            for li in range(nl):
                lx, ly, lz = (
                    light_s[0, li], light_s[1, li], light_s[2, li]
                )
                l_act = light_s[6, li] > 0.0
                vx, vy, vz = lx - px, ly - py, lz - pz
                dist2 = vx * vx + vy * vy + vz * vz
                dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
                inv_d = 1.0 / dist
                ldx, ldy, ldz = vx * inv_d, vy * inv_d, vz * inv_d
                ndotl = jnp.maximum(0.0, fnx * ldx + fny * ldy + fnz * ldz)
                ok = shade_m & l_act & (dist > bias) & (ndotl > 0.0)
                if shadow_mode == "binary":
                    def do_scan(ldx=ldx, ldy=ldy, ldz=ldz, ok=ok, dist=dist):
                        return _any_hit(
                            sph_s, pl_s, tri13_s, ns, np_, nt,
                            sox, soy, soz, ldx, ldy, ldz,
                            jnp.full(shape, bias), dist - bias,
                            interest=ok,
                        ).astype(jnp.float32)

                    occ_f = jax.lax.cond(
                        jnp.any(ok), do_scan, lambda: jnp.ones(shape)
                    )
                    T = jnp.where(occ_f > 0.0, 0.0, 1.0)
                else:
                    T = _march_T(
                        sph_s, pl_s, tri13_s, mat_s, ns, np_, nt,
                        bias, shadow_max_steps, shadow_min_t,
                        sox, soy, soz, ldx, ldy, ldz, dist - bias, ok,
                    )
                Ts.append(T)
                lgeo.append((ldx, ldy, ldz, dist, ok))
            Ts = tuple(Ts)

            out, pvjp, pushes = jax.vjp(
                pop_shade, state, tables_v, Ts, masks, has_aux=True
            )
            push_refl, push_refr = pushes

            # pop child cotangents: refraction was pushed last -> on top
            top1 = rsp - 1.0
            top2 = rsp - 2.0
            c1 = cot_gather(top1)
            c2 = cot_gather(top2)
            both = push_refl & push_refr
            only_refl = push_refl & ~push_refr

            def sel(i):
                refr_c = jnp.where(push_refr, c1[i], 0.0)
                refl_c = jnp.where(
                    both, c2[i], jnp.where(only_refl, c1[i], 0.0)
                )
                return refl_c, refr_c

            refl_cot = tuple(sel(i)[0] for i in range(7))
            refr_cot = tuple(sel(i)[1] for i in range(7))
            npop = push_refl.astype(jnp.float32) + push_refr.astype(
                jnp.float32
            )
            rsp = rsp - npop

            s_cot, t_cot, Ts_cot, _m = pvjp((refl_cot, refr_cot, gbar))
            gt = tuple(a + b for a, b in zip(gt, t_cot))

            # march transparency adjoint (T = prod tau over crossings)
            if shadow_mode == "march" and n_prims:
                tau_row = jnp.zeros((1, n_prims), jnp.float32)
                for li in range(nl):
                    cot_T = Ts_cot[li]
                    ldx, ldy, ldz, dist, ok = lgeo[li]

                    def do_replay(ldx=ldx, ldy=ldy, ldz=ldz, dist=dist,
                                  ok=ok, T_total=Ts[li], cot_T=cot_T):
                        return _march_tau_row(
                            sph_s, pl_s, tri13_s, mat_s, ns, np_, nt,
                            bias, shadow_max_steps, shadow_min_t,
                            sox, soy, soz, ldx, ldy, ldz, dist - bias,
                            ok, T_total, cot_T, n_prims,
                        )

                    tau_row = tau_row + jax.lax.cond(
                        jnp.any(cot_T != 0.0),
                        do_replay,
                        lambda: jnp.zeros((1, n_prims), jnp.float32),
                    )
                gmat_upd = jnp.concatenate(
                    [
                        jnp.zeros((5, n_prims), jnp.float32),
                        tau_row,
                        jnp.zeros((1, n_prims), jnp.float32),
                    ],
                    axis=0,
                )
                gt = gt[:3] + (gt[3] + gmat_upd,) + gt[4:]

            rsp = cot_push(rsp, live, s_cot)
            return rsp, gt

        _rsp_fin, gt = jax.lax.fori_loop(0, n_it, rbody, (sp0 * 0.0 + sp_fin, gt0))

        # primary-ray cotangents live in cot-stack slot 0
        prim = cot_ref[0]
        live0 = live_ref[:] > 0.0
        gox_ref[:] = jnp.where(live0, prim[0], 0.0)
        goy_ref[:] = jnp.where(live0, prim[1], 0.0)
        goz_ref[:] = jnp.where(live0, prim[2], 0.0)
        gdx_ref[:] = jnp.where(live0, prim[3], 0.0)
        gdy_ref[:] = jnp.where(live0, prim[4], 0.0)
        gdz_ref[:] = jnp.where(live0, prim[5], 0.0)

        # table cotangents accumulate across the sequential ray-tile grid
        first = pl.program_id(0) == 0
        table_refs = (gsph_ref, gpl_ref, gtri_ref, gmat_ref, glight_ref)

        @pl.when(first)
        def _():
            for ref, g in zip(table_refs, gt):
                ref[...] = g

        @pl.when(jnp.logical_not(first))
        def _():
            for ref, g in zip(table_refs, gt):
                ref[...] += g

    return kernel


def wavefront_grad_pallas(flat: FlatScene, o, d, gbar, cfg):
    """Fused wavefront backward (unrolled variant, scenes up to
    chain_grad._MAX_PRIMS_UNROLL primitives): cotangent of rendered rgb
    [R,3] -> (table cotangents in pack_scene_tables shapes, d_origins,
    d_dirs)."""
    r = o.shape[0]
    sub = WG_SUB
    tile = sub * LANE
    n_tiles = -(-r // tile)
    pad = n_tiles * tile - r

    def shape_ray(x, fill=0.0):
        return (
            jnp.pad(x, (0, pad), constant_values=fill)
            .reshape(n_tiles * sub, LANE)
            .astype(jnp.float32)
        )

    ox, oy, oz = (shape_ray(o[:, i]) for i in range(3))
    dx, dy = shape_ray(d[:, 0]), shape_ray(d[:, 1])
    dz = shape_ray(d[:, 2], fill=1.0)
    live = shape_ray(jnp.ones((r,), jnp.float32))
    gr, gg, gb = (shape_ray(gbar[:, i]) for i in range(3))

    # Authoring-order tables: strict-< scan order == the reference's
    # first-wins; the fori scans get a 13th original-index row (ascending
    # — the tie compare is then a no-op but keeps one code path).
    tables = pack_scene_tables(flat)
    sph, pl_, tri, mat, light = tables
    nt = flat.n_triangles
    gi_row = (
        (flat.n_spheres + flat.n_planes + jnp.arange(tri.shape[1]))
        .astype(jnp.float32)[None, :]
    )
    tri13 = jnp.concatenate([tri, gi_row], axis=0)
    table_shapes = tuple(t.shape for t in tables)

    budget = cfg.budget()
    kernel = _make_wavefront_grad_kernel(
        flat.n_spheres, flat.n_planes, nt, flat.n_lights,
        cfg.max_depth, cfg.bias, cfg.min_weight, cfg.shadow_mode,
        cfg.shadow_max_steps, cfg.shadow_min_t, budget,
        table_shapes, sub,
    )

    smem = lambda t: pl.BlockSpec(
        t.shape, lambda i, _nz=t.ndim: (0,) * _nz, memory_space=pltpu.SMEM
    )
    vmem_full = lambda t: pl.BlockSpec(
        t.shape, lambda i, _nz=t.ndim: (0,) * _nz, memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec(
        (sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    cot_specs = tuple(
        pl.BlockSpec(s, lambda i, _nz=len(s): (0,) * _nz,
                     memory_space=pltpu.VMEM)
        for s in table_shapes
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem(t) for t in (sph, pl_, tri13, mat, light)]
        + [vmem_full(t) for t in tables]
        + [ray_spec] * 10,
        out_specs=cot_specs
        + (ray_spec,) * 6
        + (pl.BlockSpec(memory_space=pl.ANY),),
        out_shape=tuple(
            jax.ShapeDtypeStruct(s, jnp.float32) for s in table_shapes
        )
        + tuple(
            jax.ShapeDtypeStruct((n_tiles * sub, LANE), jnp.float32)
            for _ in range(6)
        )
        + (jax.ShapeDtypeStruct((budget, 9, sub, LANE), jnp.float32),),
        scratch_shapes=[
            pltpu.VMEM((cfg.max_depth + 2, 8, sub, LANE), jnp.float32),
            pltpu.VMEM((cfg.max_depth + 2, 8, sub, LANE), jnp.float32),
            pltpu.VMEM((9, sub, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(sph, pl_, tri13, mat, light, sph, pl_, tri, mat, light,
      ox, oy, oz, dx, dy, dz, live, gr, gg, gb)

    table_grads = tuple(outs[:5])
    ray_grads = outs[5:11]

    def unshape(x):
        return x.reshape(-1)[:r]

    go = jnp.stack([unshape(ray_grads[i]) for i in range(3)], axis=-1)
    gd = jnp.stack([unshape(ray_grads[i + 3]) for i in range(3)], axis=-1)
    return table_grads, go.astype(o.dtype), gd.astype(d.dtype)
