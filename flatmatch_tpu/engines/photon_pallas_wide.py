"""Wide-layout axis-aligned photon megakernel (the fast path).

Second-generation Pallas kernel (see photon_pallas.py for the general
narrow-layout kernel). Two structural changes, both aimed at VPU utilization:

1. WIDE photon state. The narrow kernel keeps per-photon scalars as [TB, 1]
   columns — every elementwise op wastes 127/128 lanes. Here a block of
   TB = S*128 photons lives as [S, 128] tiles per component, so the ~200
   per-photon ops per bounce (samplers, frames, color updates) run at full
   VPU width.

2. AXIS-ALIGNED rect loop. The scene compiler only emits axis-aligned rects
   (ops/aa_scene.py); grouped by normal axis, the ray-rect test per rect is
   a handful of [S, 128] ops with all rect fields read as SMEM scalars:

       fac = (o - p_a) * inv_d_a            (inv_d hoisted per bounce)
       du  = (p_u + d_u*fac - c_u) * ws     in [0, wlen]
       dv  = (p_v + d_v*fac - c_v) * hs     in [0, hlen]
       front-face: sn * d_a < 0

   The nearest hit is a running (dist, texel, axis, sign) minimum across the
   scalar rect loop — no cross-lane reductions, no [TB, N] tiles, and the
   loop runs over the REAL rect count (no lane padding).

Physics is identical to engines/photon.trace_batch (photonmap.cl:161-265)
with the same per-photon uniform draws; parity is gated in interpret mode.
On real hardware the engines decorrelate chaotically through transcendental
differences (see README "Engine parity model").
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PhotonConfig
from ..ops.aa_scene import (
    A_BASE, A_CU, A_CV, A_HLEN, A_HS, A_HT, A_KTU, A_KTV, A_O, A_SN,
    A_WLEN, A_WS, A_WT, AARectsDev, F_AA, GROUP_UV,
)
from ..ops.device_scene import EmittersDev, RectsDev
from ..ops.sampling import TWO_PI_REF
from ..ops.splat_pallas import _fmix32
from .photon import uniforms_per_photon
from .photon_pallas import _build_base_cols, emitter_vector

_MISS = 1e30
LANES = 128


# platform-resolved rect-loop unroll, shared with the AA query kernels
from ..ops.aa_query import resolve_unroll  # noqa: E402


def check_i8_accumulator(cfg: PhotonConfig, batch_size: int):
    """The in-kernel i8 splat accumulates int32 per texel; per-batch worst
    case is batch * max_depth * 127 per texel, which would WRAP silently
    past 2^31 (possible from batch ~2^21 at depth 8 — the defaults sit at
    2^17-2^18)."""
    worst = int(batch_size) * int(cfg.max_depth) * 127
    if worst >= 2**31:
        raise ValueError(
            f"photons_per_batch={batch_size} x max_depth={cfg.max_depth} "
            f"can overflow the int32 i8-splat accumulator "
            f"({worst} >= 2^31); lower the batch or use splat='inkernel'"
        )


def splat_color_scale(cfg: PhotonConfig) -> float:
    """7-bit quantization grid for the int8 splat variants: deposit colors
    only attenuate from the emission color (photonmap.cl:236-254), so the
    brightest emitter channel / 127 bounds every deposit."""
    return max(*cfg.window_color, *cfg.light_color) / 127.0


def batch_seed(seed: int, global_batch):
    """int32 device-PRNG seed per (run seed, global batch index); the
    kernel additionally folds in its block id (pltpu.prng_seed varargs)."""
    return (
        jnp.int32(seed) * jnp.int32(1000003)
        + jnp.asarray(global_batch, jnp.int32)
    )


def device_seed(seed, ax):
    """Decorrelate a batch seed per mesh device with a full avalanche
    (murmur3 fmix32). An ADDITIVE offset is NOT safe here: the kernel's
    counter hash starts from `rgid * C + seed`, so any `seed + ax*C`
    scheme makes device ax's photon g draw the exact uniforms of device
    0's photon g+ax (the streams overlap almost entirely). Mixing ax
    through the finalizer destroys that additive structure; residual
    overlap probability is ~b_local/2^32 per device pair."""
    return _fmix32(
        jnp.asarray(seed, jnp.int32)
        + (jnp.asarray(ax, jnp.int32) + jnp.int32(1))
        * jnp.int32(-2048144789)
    )


def _make_kernel(cfg: PhotonConfig, S: int, group_counts, U: int,
                 unroll: int = 1, diff: bool = False, rng: bool = False,
                 chains: int = 1, fuse_h: int = 0, i8: bool = False,
                 fold: bool = False, d0_counts=None, no_texel: bool = False):
    """`diff=True` builds the differentiable-path variant: per-rect albedo
    read from an extra SMEM row (replacing the scalar cfg.albedo,
    diff/render.py parameterization), plus a third output recording the
    rect slot of each DIFFUSE hit (-1 otherwise) — everything the backward
    replay needs to accumulate albedo cotangents (photonmap.cl:236-258
    deposit chain: each deposit is linear in power and in every albedo
    factor picked up at diffuse bounces before it).

    `rng=True` builds the device-RNG variant: uniforms come from the TPU
    hardware PRNG (pltpu.prng_random_bits) seeded per (batch, block)
    instead of a precomputed [B, U] tensor — the TPU analog of the
    reference kernel's in-register LCG (photonmap.cl:21-25, per-item seed
    :272-275). Removes U*4 bytes/photon of HBM traffic and the host-side
    re-tile. Stream differs from threefry, so parity vs the XLA engine is
    statistical, not bitwise (like the reference CL-vs-native pair).

    `fuse_h > 0` builds the FUSED trace+splat variant: instead of streaming
    the per-bounce deposits to HBM for a separate splat pass, the kernel
    bins them into a VMEM-resident [fuse_h, 3*128] accumulator (texel t,
    channel ch at acc[t//128, ch*128 + t%128]) revisited across the whole
    grid. The binning is the same exact-one-hot MXU contraction as
    ops/splat_pallas.fused_splat, but built entirely from the kernel's
    native row layout (both one-hot operands keep the deposit axis on
    LANES; the dot contracts lane-dim against lane-dim), so no transposes
    and no deposit round-trip — and the MXU splat work of bounce d overlaps
    the VPU trace work of bounce d+1 inside one instruction stream. This
    is the TPU answer to the reference folding its racy `+=` deposit into
    the trace kernel (photonmap.cl:256-258): same fusion, deterministic.

    `fold=True` (requires diff) builds the BACKWARD kernel of the replay
    VJP: instead of streaming deposits to HBM for an XLA-side cotangent
    fold (the round-3 design — a [B*D] gather + segment_sum that ran the
    backward at 13% of the forward rate), the kernel REPLAYS the trace and
    folds the lightmap cotangent g in-kernel:

        w(p, d)  = <g[texel(p, d)], deposit_color(p, d)>   (MXU gather)
        S(p, k)  = sum_{d>=k} w(p, d)                      (in-register)
        da[slot] += one-hot slot splat of S(p, k) by the diffuse-hit slot
        dw       += sum_d w(p, d)                          (for d_power)

    The g gather is the one-hot MXU contraction TRANSPOSED: per 128-deposit
    row, tmp = g_t[3*128, Hg] @ onehot(texel_row)[Hg, 128] selects each
    deposit's 384-wide g row exactly (one nonzero per output — g is
    bf16-rounded once, with NO accumulation error), then a lane one-hot +
    sublane reduce picks the deposit's lane and dots against the replayed
    color. Anchor: the deposit chain photonmap.cl:236-258 — every deposit
    is linear in power and in each albedo factor picked up at diffuse
    bounces at or before it, so d_albedo[r] = sum of the suffix sums S at
    r's diffuse hits / albedo[r] (divided outside the kernel)."""
    D = cfg.max_depth
    TB = S * LANES
    eps = np.float32(cfg.self_intersect_eps)
    two_pi = np.float32(TWO_PI_REF)
    rr = np.float32(cfg.rr_mirror_prob)
    mirror_z = np.float32(cfg.mirror_z_threshold)
    tint_z = np.float32(cfg.floor_tint_z_threshold)
    tint = tuple(np.float32(t) for t in cfg.floor_tint)
    albedo = np.float32(cfg.albedo)
    g0, g1, g2 = group_counts
    starts = (0, g0, g0 + g1)

    def body(em_ref, nvalid_ref, scene_ref, albedo_ref, u_ref, idx_ref,
             col_ref, ridx_ref, g_ref=None, da_ref=None, dw_ref=None,
             scale_ref=None):
        if rng:
            # counter-hash RNG per (photon, draw): murmur3's fmix32
            # finalizer over (global photon id, draw column, batch seed) —
            # the TPU analog of the reference kernel's per-item counter LCG
            # (photonmap.cl:21-25, :272-275), but order-independent and
            # identical in interpret mode and on hardware (the pltpu
            # hardware PRNG returns zeros under interpretation). ~10 VPU
            # ops per [S, L] draw tile.
            seed = u_ref[0, 0]
            rgid = (
                pl.program_id(0) * TB
                + jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
            )

            def draw(c):
                x = _fmix32(
                    rgid * jnp.int32(-1640531527)
                    + (seed + jnp.int32(c) * jnp.int32(97929))
                )
                # top 24 bits -> [0, 1) exactly representable in f32
                return (
                    jax.lax.shift_right_logical(x, 8).astype(jnp.float32)
                    * jnp.float32(1.0 / (1 << 24))
                )
        else:
            # uniforms arrive transposed: u_ref[c*S:(c+1)*S, :] is draw
            # column c
            def draw(c):
                return u_ref[pl.ds(c * S, S), :]

        epx, epy, epz = em_ref[0, 0], em_ref[0, 1], em_ref[0, 2]
        ewx, ewy, ewz = em_ref[0, 3], em_ref[0, 4], em_ref[0, 5]
        ehx, ehy, ehz = em_ref[0, 6], em_ref[0, 7], em_ref[0, 8]
        enx, eny, enz = em_ref[0, 9], em_ref[0, 10], em_ref[0, 11]
        ecr, ecg, ecb = em_ref[0, 12], em_ref[0, 13], em_ref[0, 14]
        is_window = em_ref[0, 15]

        # --- emission (photonmap.cl:173-181) ------------------------------
        dxe = draw(0)
        dye = draw(1)
        r = jnp.sqrt(draw(2))
        phi = two_pi * draw(3)
        uu = r * jnp.cos(phi)
        vv = r * jnp.sin(phi)
        nn = jnp.sqrt(1.0 - r * r)
        uu = jnp.where(is_window > 0, jnp.abs(uu), uu)

        ones = jnp.ones((S, LANES), jnp.float32)
        (ux, uy, uz), (vx, vy, vz) = _build_base_cols(
            enx * ones, eny * ones, enz * ones
        )
        dirx = ux * uu + vx * vv + enx * nn
        diry = uy * uu + vy * vv + eny * nn
        dirz = uz * uu + vz * vv + enz * nn
        px = epx + ewx * dxe + ehx * dye + dirx * eps
        py = epy + ewy * dxe + ehy * dye + diry * eps
        pz = epz + ewz * dxe + ehz * dye + dirz * eps

        cr = ecr * ones
        cg = ecg * ones
        cb = ecb * ones

        gid = (
            pl.program_id(0) * TB
            + jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
        )
        alive = (gid < nvalid_ref[0, 0]).astype(jnp.float32)

        if fuse_h:
            # idx_ref IS the [fuse_h, 3*LANES] accumulator, revisited
            # across the grid; one zero-init, read once, written once.
            @pl.when(pl.program_id(0) == 0)
            def _():
                idx_ref[:] = jnp.zeros_like(idx_ref)

            acc = idx_ref[:]
            iota_h = jax.lax.broadcasted_iota(
                jnp.int32, (fuse_h, LANES), 0
            )
            iota_j = jax.lax.broadcasted_iota(
                jnp.int32, (LANES, LANES), 0
            )

        if fold:
            # da_ref [Hn, 128] (slot r at [r>>7, r&127]) and dw_ref
            # [S, 128] are revisited accumulators like the fused splat's.
            @pl.when(pl.program_id(0) == 0)
            def _():
                da_ref[:] = jnp.zeros_like(da_ref)
                dw_ref[:] = jnp.zeros_like(dw_ref)

            gt_bf = g_ref[:]                      # [3*LANES, Hg] bf16
            Hg = gt_bf.shape[1]
            Hn = da_ref.shape[0]
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (Hg, LANES), 0)
            iota_slot = jax.lax.broadcasted_iota(jnp.int32, (Hn, LANES), 0)
            iota_lane = jax.lax.broadcasted_iota(
                jnp.int32, (LANES, LANES), 0
            )
            w_steps = []     # per depth: w(p, d)        [S, LANES] f32
            slot_steps = []  # per depth: diffuse slot   [S, LANES] f32

        for d in range(D):
            inv = (
                1.0 / dirx,  # div-by-zero -> inf; rejected by sign/bounds
                1.0 / diry,
                1.0 / dirz,
            )
            p = (px, py, pz)
            dr = (dirx, diry, dirz)

            best = jnp.full((S, LANES), _MISS, jnp.float32)
            btex = jnp.zeros((S, LANES), jnp.float32)
            baxis = jnp.zeros((S, LANES), jnp.float32)
            bsign = jnp.zeros((S, LANES), jnp.float32)
            # diff extras: albedo and slot index of the best hit
            balb = jnp.full((S, LANES), albedo, jnp.float32)
            bidx = jnp.full((S, LANES), -1.0, jnp.float32)

            for a in range(3):
                # d0_counts: MEASUREMENT-ONLY hook for the exact-culling
                # experiment (round-4 VERDICT #3) — bounce 0 tests only
                # the first d0_counts[a] rects of each axis group. NOT
                # semantics-preserving (the timing twin of a per-emitter
                # bounce-0 halfspace cull, whose reachable win is bounded
                # by cull_fraction/max_depth); production callers leave it
                # None. See tools/cull_experiment.py for the numbers.
                count = group_counts[a]
                if d == 0 and d0_counts is not None:
                    count = d0_counts[a]
                if count == 0:
                    continue
                au, av = GROUP_UV[a]
                pa, ia = p[a], inv[a]
                pu, du_ = p[au], dr[au]
                pv, dv_ = p[av], dr[av]
                da_neg = dr[a] < 0

                def one_rect(j, carry, a=a, pa=pa, ia=ia, pu=pu, du_=du_,
                             pv=pv, dv_=dv_, da_neg=da_neg):
                    if diff:
                        best, btex, baxis, bsign, balb, bidx = carry
                    else:
                        best, btex, baxis, bsign = carry
                        balb = bidx = None
                    o = scene_ref[A_O, j]
                    sn = scene_ref[A_SN, j]
                    fac = (o - pa) * ia
                    # front face: sign(sn * d_a) < 0 (Mosaic cannot select
                    # between i1 vectors, so keep it arithmetic)
                    front = jnp.logical_xor(da_neg, sn < 0)
                    u = (pu + du_ * fac - scene_ref[A_CU, j]) * scene_ref[A_WS, j]
                    v = (pv + dv_ * fac - scene_ref[A_CV, j]) * scene_ref[A_HS, j]
                    # min-tree form of fac>=0 & 0<=u<=wlen & 0<=v<=hlen:
                    # IEEE-exact equivalent of the compare-and chain at 8
                    # VPU ops instead of 10 (wlen-u >= 0 <=> u <= wlen for
                    # f32 — subtraction is exactly rounded, so the sign is
                    # exact; NaN propagates through minimum and fails >= 0,
                    # matching the failed compares)
                    valid = front & (
                        jnp.minimum(
                            jnp.minimum(fac, u),
                            jnp.minimum(
                                scene_ref[A_WLEN, j] - u,
                                jnp.minimum(v, scene_ref[A_HLEN, j] - v),
                            ),
                        )
                        >= 0
                    )
                    dist = jnp.where(valid, fac, _MISS)
                    upd = dist < best
                    if no_texel:
                        # MEASUREMENT-ONLY twin
                        # (tools/texel_deferral_experiment.py): drops the
                        # 9 texel-addressing ops per rect to bound what
                        # deferring the address compute to a post-loop
                        # epilogue could win. The constant-0 id is IN
                        # RANGE for every splat tier (everything bins to
                        # texel 0) but the results are wrong; never set
                        # on production paths.
                        texel = jnp.zeros_like(fac)
                    else:
                        wt = scene_ref[A_WT, j]
                        # lower clip dropped: winning lanes (upd) are
                        # valid, so u, v >= 0 there; losing lanes' texel
                        # is discarded by the select below
                        tx = jnp.minimum(
                            jnp.floor(u * scene_ref[A_KTU, j]), wt - 1.0
                        )
                        ty = jnp.minimum(
                            jnp.floor(v * scene_ref[A_KTV, j]),
                            scene_ref[A_HT, j] - 1.0,
                        )
                        texel = scene_ref[A_BASE, j] + ty * wt + tx
                    best = jnp.where(upd, dist, best)
                    btex = jnp.where(upd, texel, btex)
                    baxis = jnp.where(upd, jnp.float32(a), baxis)
                    bsign = jnp.where(upd, sn, bsign)
                    if diff:
                        balb = jnp.where(upd, albedo_ref[0, j], balb)
                        jf = (
                            jnp.float32(j) if isinstance(j, int)
                            else j.astype(jnp.float32)
                        )
                        bidx = jnp.where(upd, jf, bidx)
                        return best, btex, baxis, bsign, balb, bidx
                    return best, btex, baxis, bsign

                start = starts[a]
                if chains == 1:
                    # unrolled main loop + static tail; in-order updates
                    # keep the first-min tie break identical to a
                    # rect-at-a-time loop
                    n_main = count // unroll

                    def loop_body(rr_, carry):
                        j0 = start + rr_ * unroll
                        for uu in range(unroll):
                            carry = one_rect(j0 + uu, carry)
                        return carry

                    init = (
                        (best, btex, baxis, bsign, balb, bidx) if diff
                        else (best, btex, baxis, bsign)
                    )
                    carry = jax.lax.fori_loop(0, n_main, loop_body, init)
                    for j in range(start + n_main * unroll, start + count):
                        carry = one_rect(j, carry)
                    if diff:
                        best, btex, baxis, bsign, balb, bidx = carry
                    else:
                        best, btex, baxis, bsign = carry
                else:
                    # `chains` independent running minimums over contiguous
                    # rect blocks — breaks the serial select-chain so the
                    # VPU can overlap independent rect tests. Bit-identical
                    # to the single chain: the padded tail clamps j to the
                    # group's last rect (a duplicate never wins a strict-<
                    # compare) and the in-order merge keeps first-min
                    # tie-break semantics across blocks.
                    part = (count + chains - 1) // chains

                    def mk_fresh():
                        base4 = (
                            jnp.full((S, LANES), _MISS, jnp.float32),
                            jnp.zeros((S, LANES), jnp.float32),
                            jnp.zeros((S, LANES), jnp.float32),
                            jnp.zeros((S, LANES), jnp.float32),
                        )
                        if diff:
                            return base4 + (
                                jnp.full((S, LANES), albedo, jnp.float32),
                                jnp.full((S, LANES), -1.0, jnp.float32),
                            )
                        return base4

                    last = jnp.int32(start + count - 1)

                    def multi_body(r, chs):
                        out = []
                        for ch in range(chains):
                            j = jnp.minimum(
                                jnp.int32(start + ch * part) + r, last
                            )
                            out.append(one_rect(j, chs[ch]))
                        return tuple(out)

                    chs = jax.lax.fori_loop(
                        0, part, multi_body,
                        tuple(mk_fresh() for _ in range(chains)),
                    )
                    for ch in range(chains):
                        cand = chs[ch]
                        upd = cand[0] < best
                        best = jnp.where(upd, cand[0], best)
                        btex = jnp.where(upd, cand[1], btex)
                        baxis = jnp.where(upd, cand[2], baxis)
                        bsign = jnp.where(upd, cand[3], bsign)
                        if diff:
                            balb = jnp.where(upd, cand[4], balb)
                            bidx = jnp.where(upd, cand[5], bidx)

            hitmask = best < (_MISS * 0.5)
            alive = alive * hitmask.astype(jnp.float32)
            dist_safe = jnp.where(hitmask, best, 0.0)
            px = px + dirx * dist_safe
            py = py + diry * dist_safe
            pz = pz + dirz * dist_safe

            # hit normal from (axis, sign)
            hnx = jnp.where(baxis == 0, bsign, 0.0)
            hny = jnp.where(baxis == 1, bsign, 0.0)
            hnz = jnp.where(baxis == 2, bsign, 0.0)

            # --- Russian roulette + bounce (photonmap.cl:236-254) ----------
            u_rr = draw(4 + 3 * d)
            u1 = draw(5 + 3 * d)
            u2 = draw(6 + 3 * d)
            diffuse = (pz > mirror_z) | (u_rr > rr)

            rd = jnp.sqrt(u1)
            phid = two_pi * u2
            duu = rd * jnp.cos(phid)
            dvv = rd * jnp.sin(phid)
            dnn = jnp.sqrt(1.0 - rd * rd)
            (bux, buy, buz), (bvx, bvy, bvz) = _build_base_cols(hnx, hny, hnz)
            ddx = bux * duu + bvx * dvv + hnx * dnn
            ddy = buy * duu + bvy * dvv + hny * dnn
            ddz = buz * duu + bvz * dvv + hnz * dnn

            ndotd = hnx * dirx + hny * diry + hnz * dirz
            mdx = dirx - 2.0 * ndotd * hnx
            mdy = diry - 2.0 * ndotd * hny
            mdz = dirz - 2.0 * ndotd * hnz

            on_floor = pz < tint_z
            tr = jnp.where(on_floor, tint[0], 1.0)
            tg = jnp.where(on_floor, tint[1], 1.0)
            tb = jnp.where(on_floor, tint[2], 1.0)
            alb = balb if diff else albedo
            cr = jnp.where(diffuse, cr * tr * alb, cr)
            cg = jnp.where(diffuse, cg * tg * alb, cg)
            cb = jnp.where(diffuse, cb * tb * alb, cb)
            dirx = jnp.where(diffuse, ddx, mdx)
            diry = jnp.where(diffuse, ddy, mdy)
            dirz = jnp.where(diffuse, ddz, mdz)

            # --- deposit --------------------------------------------------
            if fuse_h:
                # in-kernel exact one-hot splat: per 128-deposit row, the
                # one-hot of the texel's VMEM row (hi) contracts against
                # the color-weighted one-hot of its lane (lo). Colors
                # quantize to bf16 once (as in ops/splat_pallas); the
                # one-hots are exact; accumulation is f32 on the MXU.
                # With i8, colors instead quantize to the 7-bit emitter
                # grid with deterministic unbiased dithering (keyed by the
                # unique per-batch deposit id gid*D+d, like
                # ops/splat_pallas.dither01) and the contraction runs at
                # int8 MXU rate (2x) with an exact int32 accumulator.
                texi = jnp.where(alive > 0, btex, 0.0).astype(jnp.int32)
                if i8:
                    # diff tier: the quantization grid depends on the free
                    # `power`/`albedo` parameters, so the inverse scale
                    # arrives as an SMEM scalar (trace_splat_wide_diff*);
                    # production keeps the compile-time constant
                    if scale_ref is not None:
                        inv_s = scale_ref[0, 0]
                    else:
                        inv_s = np.float32(1.0 / splat_color_scale(cfg))
                    depkey = gid * jnp.int32(3 * D) + jnp.int32(3 * d)

                    def dith(key):
                        # same fmix32 finalizer as ops/splat_pallas.dither01
                        # but keyed per in-kernel deposit id (gid*3D + 3d +
                        # ch), NOT per stream row — the two i8 paths are
                        # statistically, not bit, equivalent (see _splat)
                        x = _fmix32(key * jnp.int32(-1640531527))
                        return (
                            jax.lax.shift_right_logical(x, 8)
                            .astype(jnp.float32)
                            * jnp.float32(1.0 / (1 << 24))
                        )

                    def q(c, ch):
                        return jnp.clip(
                            jnp.floor(
                                c * alive * inv_s
                                + dith(depkey + jnp.int32(ch))
                            ),
                            0.0, 127.0,
                        ).astype(jnp.int32)

                    car, cag, cab = q(cr, 0), q(cg, 1), q(cb, 2)
                else:
                    car = (cr * alive).astype(jnp.bfloat16)
                    cag = (cg * alive).astype(jnp.bfloat16)
                    cab = (cb * alive).astype(jnp.bfloat16)
                for s in range(S):
                    row = texi[s:s + 1, :]                      # [1, K]
                    hi = jax.lax.shift_right_logical(row, 7)
                    lo = jnp.bitwise_and(row, LANES - 1)
                    if i8:
                        ohT = (iota_h == hi).astype(jnp.int8)   # [H, K]
                        ohlo = iota_j == lo                     # [K, K]
                        x2 = jnp.concatenate(
                            [
                                jnp.where(ohlo, car[s:s + 1, :], 0),
                                jnp.where(ohlo, cag[s:s + 1, :], 0),
                                jnp.where(ohlo, cab[s:s + 1, :], 0),
                            ],
                            axis=0,
                        ).astype(jnp.int8)                      # [3*K, K]
                        acc = acc + jax.lax.dot_general(
                            ohT, x2,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                    else:
                        ohT = (iota_h == hi).astype(jnp.bfloat16)
                        ohlo = (iota_j == lo).astype(jnp.bfloat16)
                        x2 = jnp.concatenate(
                            [
                                ohlo * car[s:s + 1, :],
                                ohlo * cag[s:s + 1, :],
                                ohlo * cab[s:s + 1, :],
                            ],
                            axis=0,
                        )                                       # [3*K, K]
                        acc = acc + jax.lax.dot_general(
                            ohT, x2,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
            elif fold:
                # replay-backward: gather g at this bounce's texels on the
                # MXU and dot against the replayed deposit colors; stash
                # w(p, d) and the diffuse slot for the post-loop suffix
                # sums (the suffix needs every later bounce's w first)
                texi = jnp.where(alive > 0, btex, 0.0).astype(jnp.int32)
                car = cr * alive
                cag = cg * alive
                cab = cb * alive
                ws = []
                for s in range(S):
                    row = texi[s:s + 1, :]
                    hi = jax.lax.shift_right_logical(row, 7)
                    lo = jnp.bitwise_and(row, LANES - 1)
                    ohT = (iota_g == hi).astype(jnp.bfloat16)   # [Hg, K]
                    # exact gather: one nonzero per output column
                    tmp = jax.lax.dot_general(
                        gt_bf, ohT,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                           # [3K, K]
                    ohlo = iota_lane == lo                      # [K, K]
                    zero = jnp.float32(0.0)
                    sel = [
                        jnp.sum(
                            jnp.where(
                                ohlo,
                                tmp[ch * LANES:(ch + 1) * LANES, :],
                                zero,
                            ),
                            axis=0, keepdims=True,
                        )
                        for ch in range(3)
                    ]
                    ws.append(
                        sel[0] * car[s:s + 1, :]
                        + sel[1] * cag[s:s + 1, :]
                        + sel[2] * cab[s:s + 1, :]
                    )
                w_steps.append(jnp.concatenate(ws, axis=0))     # [S, K]
                dm = diffuse.astype(jnp.float32) * alive
                slot_steps.append(jnp.where(dm > 0, bidx, -1.0))
            else:
                idx_ref[pl.ds(d * S, S), :] = jnp.where(
                    alive > 0, btex, 0.0
                ).astype(jnp.int32)
                col_ref[pl.ds((3 * d) * S, S), :] = cr * alive
                col_ref[pl.ds((3 * d + 1) * S, S), :] = cg * alive
                col_ref[pl.ds((3 * d + 2) * S, S), :] = cb * alive
            if diff and ridx_ref is not None:
                # slot whose albedo multiplied into this (and all later)
                # deposits; -1 at mirror bounces / dead photons
                dm = diffuse.astype(jnp.float32) * alive
                ridx_ref[pl.ds(d * S, S), :] = jnp.where(
                    dm > 0, bidx, -1.0
                ).astype(jnp.int32)

            px = px + dirx * eps
            py = py + diry * eps
            pz = pz + dirz * eps

        if fuse_h:
            idx_ref[:] = acc

        if fold:
            # inclusive suffix sums S(p, k) = sum_{d>=k} w(p, d) — the
            # deposit at bounce k already carries albedo_k (deposit is
            # post-attenuation, photonmap.cl:236-258)
            suf = [None] * D
            run = jnp.zeros((S, LANES), jnp.float32)
            for d in reversed(range(D)):
                run = run + w_steps[d]
                suf[d] = run
            dw_ref[:] = dw_ref[:] + suf[0]
            # slot splat: da[slot] += S(p, k) via the same exact one-hot
            # MXU contraction as the fused texel splat (Hn is tiny)
            da = da_ref[:]
            for d in range(D):
                sl = slot_steps[d].astype(jnp.int32)
                for s in range(S):
                    row = sl[s:s + 1, :]
                    # arithmetic shift: slot -1 (mirror/dead) -> row -1,
                    # matched by no iota_slot row -> contributes nothing
                    hi = jax.lax.shift_right_arithmetic(row, 7)
                    lo = jnp.bitwise_and(row, LANES - 1)
                    # f32 dot: Hn is ~8 rows, the pass is free — keeps the
                    # suffix sums un-quantized (the only rounding in the
                    # whole fold is g's one bf16 cast)
                    ohT = (iota_slot == hi).astype(jnp.float32)
                    x = jnp.where(
                        iota_lane == lo, suf[d][s:s + 1, :], 0.0
                    )                                           # [K, K]
                    da = da + jax.lax.dot_general(
                        ohT, x,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                           # [Hn, K]
            da_ref[:] = da

    if fold:
        assert diff, "fold is a diff-tier mode"

        def kernel_fold(em_ref, nvalid_ref, scene_ref, albedo_ref, g_ref,
                        u_ref, da_ref, dw_ref):
            body(em_ref, nvalid_ref, scene_ref, albedo_ref, u_ref,
                 None, None, None, g_ref=g_ref, da_ref=da_ref,
                 dw_ref=dw_ref)

        return kernel_fold

    if diff and fuse_h and i8:
        def kernel_diff_fused_i8(em_ref, nvalid_ref, scene_ref, albedo_ref,
                                 scale_ref, u_ref, acc_ref):
            body(em_ref, nvalid_ref, scene_ref, albedo_ref, u_ref,
                 acc_ref, None, None, scale_ref=scale_ref)

        return kernel_diff_fused_i8

    if diff and fuse_h:
        def kernel_diff_fused(em_ref, nvalid_ref, scene_ref, albedo_ref,
                              u_ref, acc_ref):
            body(em_ref, nvalid_ref, scene_ref, albedo_ref, u_ref,
                 acc_ref, None, None)

        return kernel_diff_fused

    if diff:
        def kernel_diff(em_ref, nvalid_ref, scene_ref, albedo_ref, u_ref,
                        idx_ref, col_ref, ridx_ref):
            body(em_ref, nvalid_ref, scene_ref, albedo_ref, u_ref,
                 idx_ref, col_ref, ridx_ref)

        return kernel_diff

    if fuse_h:
        def kernel_fused(em_ref, nvalid_ref, scene_ref, u_ref, acc_ref):
            body(em_ref, nvalid_ref, scene_ref, None, u_ref, acc_ref, None,
                 None)

        return kernel_fused

    def kernel(em_ref, nvalid_ref, scene_ref, u_ref, idx_ref, col_ref):
        body(em_ref, nvalid_ref, scene_ref, None, u_ref, idx_ref, col_ref,
             None)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "sublanes", "unroll",
                     "batch_size", "chains"),
)
def trace_deposits_wide_rng(
    aa_fields: jnp.ndarray,
    em_vec: jnp.ndarray,
    seed,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    batch_size: int,
    sublanes: int = 8,
    unroll: "int | None" = None,
    chains: int = 1,
):
    """trace_deposits_wide with the device PRNG: no uniforms tensor at all.

    `seed` is an int32 scalar unique per (emitter, batch[, device]);
    deterministic for a fixed seed schedule."""
    B = int(batch_size)
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    D = cfg.max_depth
    U = uniforms_per_photon(D)

    unroll = resolve_unroll(unroll)
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll, rng=True,
                          chains=chains)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    seed_arr = jnp.full((1, 1), seed, jnp.int32)
    N = aa_fields.shape[1]
    idx, col = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((D * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * D * S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * 3 * D * S, LANES), jnp.float32),
        ),
    )(em_vec, nvalid_arr, aa_fields, seed_arr)
    idx_flat = idx.reshape(-1)
    col_flat = (
        col.reshape(n_blocks, D, 3, S, LANES)
        .transpose(0, 1, 3, 4, 2)
        .reshape(-1, 3)
    )
    return idx_flat, col_flat


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "sublanes", "unroll", "chains"),
)
def trace_deposits_wide(
    aa_fields: jnp.ndarray,
    em_vec: jnp.ndarray,
    uniforms: jnp.ndarray,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    sublanes: int = 8,
    unroll: int = 4,
    chains: int = 1,
):
    """Returns (texel ids [B*D] int32, colors [B*D, 3] f32) for one batch.

    `uniforms` is the standard [B, U] layout shared with the other engines;
    it is re-tiled to the kernel's wide layout here.
    """
    B, U = uniforms.shape
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    D = cfg.max_depth

    # [B, U] -> per block: [U, S, L] so draw c is an [S, L] tile
    u_wide = (
        uniforms.reshape(n_blocks, S, LANES, U)
        .transpose(0, 3, 1, 2)
        .reshape(n_blocks * U * S, LANES)
    )
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll,
                          chains=chains)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    N = aa_fields.shape[1]
    idx, col = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((U * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((D * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * D * S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * 3 * D * S, LANES), jnp.float32),
        ),
    )(em_vec, nvalid_arr, aa_fields, u_wide)
    # [nb, D, S, L] -> flat photon-major is unnecessary; any order works for
    # the scatter. colors: [nb, D, 3, S, L] -> [nb*D*S*L, 3]
    idx_flat = idx.reshape(-1)
    col_flat = (
        col.reshape(n_blocks, D, 3, S, LANES)
        .transpose(0, 1, 3, 4, 2)
        .reshape(-1, 3)
    )
    return idx_flat, col_flat


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _acc_h(num_texels: int) -> int:
    """Fused-splat accumulator height: texel rows of 128, sublane-padded."""
    return _round_up(_round_up(num_texels, LANES) // LANES, 8)


# Scene-scale capacity ceiling of the fused in-kernel splat, measured on
# v5e with k x k flagship tilings (tools/stress_scale.py, round 5): the
# revisited [H, 3*128] VMEM accumulator compiles and runs at 6.13 MB
# (3x2 tiling, 1032 rects / 510k compact texels) and fails Mosaic
# compilation at 9.19 MB (3x3, 1548 rects / 766k texels) — the
# accumulator plus the kernel's working blocks exhausts the ~16 MB VMEM.
# The trace kernel itself is NOT the ceiling: the deposit-stream
# ('scatter') tier compiles and stays exact at 3x3 (78.6 KB SMEM scene
# block), so past this limit the engine degrades to that tier instead of
# failing opaquely. Threshold = EXACTLY the largest measured-good
# footprint (the 3x2 tiling's _acc_h(510336) * 384 * 4 bytes); the
# unmeasured band up to the 9.19 MB failure stays behind the gate.
FUSED_ACC_VMEM_LIMIT_BYTES = 6_131_712


def maybe_degrade_splat(cfg: PhotonConfig, total_c: int) -> PhotonConfig:
    """cfg with the fused in-kernel splat degraded to the exact
    deposit-stream tier when the accumulator exceeds the measured VMEM
    ceiling (see FUSED_ACC_VMEM_LIMIT_BYTES); WARNS itself, so a wide
    entry point can never degrade silently. The scatter tier is the
    EXACT f32 splat; on the production engines it keeps cfg.device_rng's
    draw source (trace_deposits_wide_rng), so degradation changes only
    the splat mechanism. CAVEAT (diff renderers): their deposit-stream
    tier is threefry-only (no trace_deposits_wide_diff_rng variant), so
    a degraded device_rng diff render draws a DIFFERENT photon
    realization than the production engine — statistically equivalent
    (same estimator) and gradient-exact, but not draw-identical."""
    if cfg.splat not in ("inkernel", "fused", "inkernel_i8", "fused_i8"):
        return cfg
    acc = _acc_h(total_c) * 3 * LANES * 4
    if acc <= FUSED_ACC_VMEM_LIMIT_BYTES:
        return cfg
    import dataclasses

    from ..utils.progress import warn

    warn(
        f"fused in-kernel splat accumulator needs {acc / 1e6:.1f} MB VMEM "
        f"(measured v5e ceiling {FUSED_ACC_VMEM_LIMIT_BYTES / 1e6:.1f} MB "
        f"at {total_c} compact texels); using the exact deposit-stream "
        f"splat tier"
    )
    return dataclasses.replace(cfg, splat="scatter")


def acc_to_lightmap(acc: jnp.ndarray, num_texels: int) -> jnp.ndarray:
    """[H, 3*128] fused accumulator -> [num_texels, 3] lightmap
    (acc[h, ch*128 + j] is texel h*128+j, channel ch — the
    ops/splat_pallas layout)."""
    H = acc.shape[0]
    out = acc.reshape(H, 3, LANES).transpose(0, 2, 1).reshape(H * LANES, 3)
    return out[:num_texels]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "num_texels", "sublanes",
                     "unroll", "chains", "i8"),
)
def trace_splat_wide(
    aa_fields: jnp.ndarray,
    em_vec: jnp.ndarray,
    uniforms: jnp.ndarray,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    num_texels: int,
    sublanes: int = 8,
    unroll: int = 4,
    chains: int = 1,
    i8: bool = False,
):
    """Fused trace+splat batch (cfg.splat == "inkernel"): returns the
    [num_texels, 3] lightmap increment directly — the deposit stream never
    leaves VMEM. Same draws and physics as trace_deposits_wide +
    ops/splat_pallas.fused_splat; per-texel sums differ only by f32
    accumulation order. With `i8` (cfg.splat == "inkernel_i8") the in-kernel
    binning runs at int8 MXU rate over dither-quantized 7-bit colors with an
    exact int32 accumulator, de-scaled once here."""
    B, U = uniforms.shape
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    H = _acc_h(num_texels)

    if i8:
        check_i8_accumulator(cfg, B)
    u_wide = (
        uniforms.reshape(n_blocks, S, LANES, U)
        .transpose(0, 3, 1, 2)
        .reshape(n_blocks * U * S, LANES)
    )
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll,
                          chains=chains, fuse_h=H, i8=i8)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    N = aa_fields.shape[1]
    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((U * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, 3 * LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (H, 3 * LANES), jnp.int32 if i8 else jnp.float32
        ),
    )(em_vec, nvalid_arr, aa_fields, u_wide)
    if i8:
        acc = acc.astype(jnp.float32) * jnp.float32(splat_color_scale(cfg))
    return acc_to_lightmap(acc, num_texels)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "num_texels", "sublanes",
                     "unroll", "batch_size", "chains", "i8", "d0_counts",
                     "no_texel"),
)
def trace_splat_wide_rng(
    aa_fields: jnp.ndarray,
    em_vec: jnp.ndarray,
    seed,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    num_texels: int,
    batch_size: int,
    sublanes: int = 8,
    unroll: "int | None" = None,
    chains: int = 1,
    i8: bool = False,
    d0_counts=None,
    no_texel: bool = False,
):
    """trace_splat_wide with the in-kernel counter-hash PRNG (cfg.device_rng):
    neither uniforms nor deposits touch HBM — the only per-batch HBM traffic
    is the final accumulator writeback.

    unroll on the device-RNG (production) wrappers resolves by platform:
    8 on hardware (+2% photons/s measured, 44.6M at the bench budget;
    sweep 4/8/16 — 16 blew the compile budget), 4 under interpret mode
    where the 8-wide bodies roughly double XLA-CPU compile time. The
    threefry wrappers stay at 4. Bit-identical in all cases (the
    unrolled loop tests rects in the same order)."""
    B = int(batch_size)
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    D = cfg.max_depth
    U = uniforms_per_photon(D)
    H = _acc_h(num_texels)

    if i8:
        check_i8_accumulator(cfg, B)
    unroll = resolve_unroll(unroll)
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll, rng=True,
                          chains=chains, fuse_h=H, i8=i8,
                          d0_counts=d0_counts, no_texel=no_texel)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    seed_arr = jnp.full((1, 1), seed, jnp.int32)
    N = aa_fields.shape[1]
    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((H, 3 * LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (H, 3 * LANES), jnp.int32 if i8 else jnp.float32
        ),
    )(em_vec, nvalid_arr, aa_fields, seed_arr)
    if i8:
        acc = acc.astype(jnp.float32) * jnp.float32(splat_color_scale(cfg))
    return acc_to_lightmap(acc, num_texels)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "sublanes", "unroll", "chains"),
)
def trace_deposits_wide_diff(
    aa_fields: jnp.ndarray,
    albedo_aa: jnp.ndarray,
    em_vec: jnp.ndarray,
    uniforms: jnp.ndarray,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    sublanes: int = 8,
    unroll: int = 4,
    chains: int = 1,
):
    """Differentiable-path trace: per-rect albedo applied in-kernel.

    `albedo_aa` is [N] f32 in KERNEL SLOT order (aa.perm maps slots back to
    input rect indices). Returns (texel ids [B*D] int32, colors [B*D, 3]
    f32, diffuse-hit slots [B*D] int32 with -1 at mirror/dead bounces) —
    the full deposit stream plus what the backward replay needs
    (diff/render.py)."""
    B, U = uniforms.shape
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    D = cfg.max_depth

    u_wide = (
        uniforms.reshape(n_blocks, S, LANES, U)
        .transpose(0, 3, 1, 2)
        .reshape(n_blocks * U * S, LANES)
    )
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll, diff=True,
                          chains=chains)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    N = aa_fields.shape[1]
    idx, col, ridx = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((U * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((D * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * D * S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * 3 * D * S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * D * S, LANES), jnp.int32),
        ),
    )(em_vec, nvalid_arr, aa_fields, albedo_aa.reshape(1, N), u_wide)
    idx_flat = idx.reshape(-1)
    ridx_flat = ridx.reshape(-1)
    col_flat = (
        col.reshape(n_blocks, D, 3, S, LANES)
        .transpose(0, 1, 3, 4, 2)
        .reshape(-1, 3)
    )
    return idx_flat, col_flat, ridx_flat


def _fold_hn(n_slots: int) -> int:
    """Slot-accumulator height for the fold kernel: slot rows of 128,
    sublane-padded (scenes have O(100) rect slots, so this is ~8 rows)."""
    return _round_up(_round_up(n_slots, LANES) // LANES, 8)


def cotangent_t(g: jnp.ndarray, num_texels: int) -> jnp.ndarray:
    """[T, 3] lightmap cotangent -> [3*128, Hg] bf16 fold-kernel operand
    with g_t[ch*128 + t%128, t//128] = g[t, ch]. Hg (the texel-row count)
    is the LANE dim of the operand, so it pads to a multiple of 128. bf16
    is the fold's single rounding: the MXU gather is one-hot (one nonzero
    per output), so each gathered value is exactly bf16(g[t, ch])."""
    Hg = _round_up(_round_up(num_texels, LANES) // LANES, LANES)
    pad = Hg * LANES - num_texels
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    return (
        gp.reshape(Hg, LANES, 3)
        .transpose(2, 1, 0)
        .reshape(3 * LANES, Hg)
        .astype(jnp.bfloat16)
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "num_texels", "sublanes",
                     "unroll", "chains", "i8"),
)
def trace_splat_wide_diff(
    aa_fields: jnp.ndarray,
    albedo_aa: jnp.ndarray,
    em_vec: jnp.ndarray,
    uniforms: jnp.ndarray,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    num_texels: int,
    sublanes: int = 8,
    unroll: int = 4,
    chains: int = 1,
    i8: bool = False,
    scale=None,
    inv_scale=None,
):
    """Differentiable-path FUSED trace+splat: per-rect albedo in-kernel AND
    the in-kernel exact one-hot splat — the diff forward at the production
    forward's speed (no deposit stream to HBM, no standalone splat pass;
    the round-3 diff forward paid ~60% of its wall clock for those two).

    With `i8` the binning runs at int8 MXU rate like the production
    inkernel_i8 splat, but over a DYNAMIC quantization grid: deposit colors
    carry the free `power`/`albedo` parameters, so the caller supplies
    (scale, inv_scale) — traced f32 scalars covering the parameter-scaled
    deposit bound (diff/render.py computes them so they reduce bit-exactly
    to the production constants at power<=1, albedo<=1). The backward is
    untouched either way (the fold kernel replays exact f32 colors)."""
    B, U = uniforms.shape
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    H = _acc_h(num_texels)

    if i8:
        check_i8_accumulator(cfg, B)
        assert scale is not None and inv_scale is not None
    u_wide = (
        uniforms.reshape(n_blocks, S, LANES, U)
        .transpose(0, 3, 1, 2)
        .reshape(n_blocks * U * S, LANES)
    )
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll, diff=True,
                          chains=chains, fuse_h=H, i8=i8)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    N = aa_fields.shape[1]
    specs = [
        pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [em_vec, nvalid_arr, aa_fields, albedo_aa.reshape(1, N)]
    if i8:
        specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(jnp.full((1, 1), inv_scale, jnp.float32))
    specs.append(
        pl.BlockSpec((U * S, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(u_wide)
    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=specs,
        out_specs=pl.BlockSpec((H, 3 * LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (H, 3 * LANES), jnp.int32 if i8 else jnp.float32
        ),
    )(*args)
    if i8:
        acc = acc.astype(jnp.float32) * jnp.asarray(scale, jnp.float32)
    return acc_to_lightmap(acc, num_texels)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "num_texels", "batch_size",
                     "sublanes", "unroll", "chains", "i8"),
)
def trace_splat_wide_diff_rng(
    aa_fields: jnp.ndarray,
    albedo_aa: jnp.ndarray,
    em_vec: jnp.ndarray,
    seed,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    num_texels: int,
    batch_size: int,
    sublanes: int = 8,
    unroll: "int | None" = None,
    chains: int = 1,
    i8: bool = False,
    scale=None,
    inv_scale=None,
):
    """trace_splat_wide_diff with the in-kernel counter-hash PRNG: the
    production diff forward — neither uniforms nor deposits touch HBM.
    `i8` + (scale, inv_scale) as in trace_splat_wide_diff."""
    B = int(batch_size)
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    D = cfg.max_depth
    U = uniforms_per_photon(D)
    H = _acc_h(num_texels)

    if i8:
        check_i8_accumulator(cfg, B)
        assert scale is not None and inv_scale is not None
    unroll = resolve_unroll(unroll)
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll, diff=True,
                          rng=True, chains=chains, fuse_h=H, i8=i8)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    seed_arr = jnp.full((1, 1), seed, jnp.int32)
    N = aa_fields.shape[1]
    specs = [
        pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [em_vec, nvalid_arr, aa_fields, albedo_aa.reshape(1, N)]
    if i8:
        specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(jnp.full((1, 1), inv_scale, jnp.float32))
    specs.append(
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    )
    args.append(seed_arr)
    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=specs,
        out_specs=pl.BlockSpec((H, 3 * LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (H, 3 * LANES), jnp.int32 if i8 else jnp.float32
        ),
    )(*args)
    if i8:
        acc = acc.astype(jnp.float32) * jnp.asarray(scale, jnp.float32)
    return acc_to_lightmap(acc, num_texels)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "n_slots", "sublanes", "unroll",
                     "chains"),
)
def trace_fold_wide(
    aa_fields: jnp.ndarray,
    albedo_aa: jnp.ndarray,
    em_vec: jnp.ndarray,
    g_t: jnp.ndarray,
    uniforms: jnp.ndarray,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    n_slots: int,
    sublanes: int = 8,
    unroll: int = 4,
    chains: int = 1,
):
    """Replay-backward batch: re-traces the forward trajectories from the
    same draws and folds the lightmap cotangent in-kernel (_make_kernel
    fold docs). Returns (da_slots [n_slots] — suffix-sum totals per rect
    slot, NOT yet divided by albedo — and w_sum, the <g, batch lightmap>
    total for d_power). `g_t` is cotangent_t(g_compact)."""
    B, U = uniforms.shape
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    Hn = _fold_hn(n_slots)

    u_wide = (
        uniforms.reshape(n_blocks, S, LANES, U)
        .transpose(0, 3, 1, 2)
        .reshape(n_blocks * U * S, LANES)
    )
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll, diff=True,
                          chains=chains, fold=True)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    N = aa_fields.shape[1]
    Hg = g_t.shape[1]
    da, dw = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * LANES, Hg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U * S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Hn, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hn, LANES), jnp.float32),
            jax.ShapeDtypeStruct((S, LANES), jnp.float32),
        ),
    )(em_vec, nvalid_arr, aa_fields, albedo_aa.reshape(1, N), g_t, u_wide)
    return da.reshape(-1)[:n_slots], dw.sum()


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "group_counts", "n_slots", "batch_size",
                     "sublanes", "unroll", "chains"),
)
def trace_fold_wide_rng(
    aa_fields: jnp.ndarray,
    albedo_aa: jnp.ndarray,
    em_vec: jnp.ndarray,
    g_t: jnp.ndarray,
    seed,
    n_valid,
    cfg: PhotonConfig,
    group_counts,
    n_slots: int,
    batch_size: int,
    sublanes: int = 8,
    unroll: "int | None" = None,
    chains: int = 1,
):
    """trace_fold_wide with the in-kernel counter-hash PRNG — the
    production backward (replays trace_splat_wide_diff_rng's trajectories
    from the same seed)."""
    B = int(batch_size)
    S = int(sublanes)
    TB = S * LANES
    assert B % TB == 0, (B, TB)
    n_blocks = B // TB
    D = cfg.max_depth
    U = uniforms_per_photon(D)
    Hn = _fold_hn(n_slots)

    unroll = resolve_unroll(unroll)
    kernel = _make_kernel(cfg, S, tuple(group_counts), U, unroll, diff=True,
                          rng=True, chains=chains, fold=True)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    seed_arr = jnp.full((1, 1), seed, jnp.int32)
    N = aa_fields.shape[1]
    Hg = g_t.shape[1]
    da, dw = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F_AA, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * LANES, Hg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((Hn, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hn, LANES), jnp.float32),
            jax.ShapeDtypeStruct((S, LANES), jnp.float32),
        ),
    )(em_vec, nvalid_arr, aa_fields, albedo_aa.reshape(1, N), g_t, seed_arr)
    return da.reshape(-1)[:n_slots], dw.sum()


def compact_aa(aa: AARectsDev, num_texels: int):
    """Re-base the AA scene so deposits land in a COMPACT level-0-only
    arena (mipmap slots excluded), shrinking the splat accumulator height
    ~25% — the fused one-hot splat's cost is linear in it (measured 12.4
    -> 9.5 ms per 2M deposits on v5e). Returns (aa_compact, compact_total,
    expand) where expand(compact_lightmap) -> arena lightmap. Per-texel
    sums are unchanged (same deposits, same order), so results are
    bit-identical to splatting into the full arena."""
    fields = np.asarray(aa.fields)
    wt = fields[A_WT].astype(np.int64)
    ht = fields[A_HT].astype(np.int64)
    arena_base = fields[A_BASE].astype(np.int64)
    counts = wt * ht
    cbase = np.zeros_like(counts)
    cbase[1:] = np.cumsum(counts)[:-1]
    total = int(counts.sum())
    fields_c = fields.copy()
    fields_c[A_BASE] = cbase.astype(np.float32)
    aa_c = AARectsDev(
        fields=jnp.asarray(fields_c),
        group_counts=aa.group_counts,
        perm=aa.perm,
    )
    gather = np.zeros(num_texels, np.int64)
    mask = np.zeros(num_texels, bool)
    for j in range(len(counts)):
        a0, c0, n = int(arena_base[j]), int(cbase[j]), int(counts[j])
        gather[a0 : a0 + n] = np.arange(c0, c0 + n)
        mask[a0 : a0 + n] = True
    gather_j = jnp.asarray(gather, jnp.int32)
    mask_j = jnp.asarray(mask)

    @jax.jit
    def expand(compact_lm):
        return jnp.where(
            mask_j[:, None], compact_lm[gather_j], jnp.float32(0.0)
        )

    return aa_c, total, expand


def compact_arena_positions(aa: AARectsDev) -> np.ndarray:
    """compact texel index -> arena texel index (the inverse of
    compact_aa's gather; injective, so g_compact = g_arena[positions] is
    the exact transpose of compact_aa's expand)."""
    fields = np.asarray(aa.fields)
    wt = fields[A_WT].astype(np.int64)
    ht = fields[A_HT].astype(np.int64)
    arena_base = fields[A_BASE].astype(np.int64)
    counts = wt * ht
    out = np.empty(int(counts.sum()), np.int64)
    c0 = 0
    for j in range(len(counts)):
        n = int(counts[j])
        out[c0:c0 + n] = np.arange(arena_base[j], arena_base[j] + n)
        c0 += n
    return out


def exact_splat_cfg(cfg: PhotonConfig) -> PhotonConfig:
    """cfg with any int8 splat demoted to its bf16 (f32-grade) twin.

    Round-3 history: the diff renderers used this to avoid clipping the
    FIXED 7-bit emitter grid when deposit colors carry a free `power` > 1.
    Since round 4 they instead run i8 on a DYNAMIC grid (the production
    constants times a parameter bound, diff/render.py scale_pair), so this
    helper remains only for callers that want to force the exact tier."""
    m = {"fused_i8": "fused", "inkernel_i8": "inkernel"}
    if cfg.splat in m:
        return dataclasses.replace(cfg, splat=m[cfg.splat])
    return cfg


def _splat(lightmap, idx, col, cfg: PhotonConfig):
    """Splat a deposit stream per cfg.splat. Callers that materialize the
    stream (diff renderers, sharded deposit paths) land here even when
    cfg.splat names an IN-KERNEL mode, so the inkernel* names map to their
    standalone twins: same binning and same 7-bit quantization GRID, but
    the i8 pair is only statistically equivalent — the in-kernel dither is
    keyed per (photon, bounce, channel) while dither01 keys per stream row
    (test_pallas_wide.test_wide_splat_i8_matches_fused_statistically)."""
    splat = {"inkernel": "fused", "inkernel_i8": "fused_i8"}.get(
        cfg.splat, cfg.splat
    )
    cfg = cfg if splat == cfg.splat else dataclasses.replace(
        cfg, splat=splat
    )
    if cfg.splat == "scatter":
        return lightmap.at[idx].add(col)
    if cfg.splat in ("fused", "fused_i8"):
        from ..ops.splat_pallas import fused_splat, fused_splat_i8

        # K per MXU pass: deep passes amortize the [H,384] accumulator add
        # (profiled: the splat is ~70% of photon-loop device time and ~40%
        # of it is VPU overhead; depth 512 measured ~3 ms faster per 2M-row
        # splat on v5e than the original 128). MUST be derived from static
        # config, not idx.shape: the peeled tail batches (and checkpoint
        # segment replays) splat fewer rows and bit-identity with the
        # full-batch path needs identical K windows.
        depth = 512 if int(cfg.photons_per_batch) * cfg.max_depth >= (
            512 * 128
        ) else 128
        if cfg.splat == "fused_i8":
            return lightmap + fused_splat_i8(
                idx, col, lightmap.shape[0],
                scale=splat_color_scale(cfg), depth=depth,
            )
        return lightmap + fused_splat(
            idx, col, lightmap.shape[0], depth=depth
        )
    from ..ops.splat import bucket_splat

    return lightmap + bucket_splat(
        idx, col, lightmap.shape[0], exact=(cfg.splat == "bucket_exact")
    )


def trace_batch_wide(
    lightmap, aa: AARectsDev, em_vec, uniforms, n_valid, cfg: PhotonConfig,
    sublanes: int = 8,
):
    if cfg.splat in ("inkernel", "inkernel_i8"):
        return lightmap + trace_splat_wide(
            aa.fields, em_vec, uniforms, n_valid, cfg, aa.group_counts,
            lightmap.shape[0], sublanes, i8=(cfg.splat == "inkernel_i8"),
        )
    idx, col = trace_deposits_wide(
        aa.fields, em_vec, uniforms, n_valid, cfg, aa.group_counts, sublanes
    )
    return _splat(lightmap, idx, col, cfg)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "batch_size", "group_counts", "sublanes",
                     "chains"),
)
def _trace_emitter_wide(
    lightmap, aa_fields, em_vec, key, base_batch, batch_offset, seg_len,
    emitter_n_batches, last_batch_valid, cfg: PhotonConfig, batch_size: int,
    group_counts, sublanes: int, chains: int = 1,
):
    """Trace batches [batch_offset, batch_offset+seg_len) of one emitter's
    schedule (segmenting serves the checkpoint loop, engines/schedule.py;
    draws depend only on the absolute batch index so segmentation never
    changes a photon)."""
    U = uniforms_per_photon(cfg.max_depth)

    def body(i, lm):
        abs_i = batch_offset + i
        n_valid = jnp.where(
            abs_i == emitter_n_batches - 1,
            last_batch_valid,
            jnp.int32(batch_size),
        )
        if cfg.splat in ("inkernel", "inkernel_i8"):
            i8 = cfg.splat == "inkernel_i8"
            if cfg.device_rng:
                return lm + trace_splat_wide_rng(
                    aa_fields, em_vec,
                    batch_seed(cfg.seed, base_batch + abs_i), n_valid, cfg,
                    group_counts, lm.shape[0], batch_size, sublanes,
                    chains=chains, i8=i8,
                )
            k = jax.random.fold_in(key, base_batch + abs_i)
            uniforms = jax.random.uniform(
                k, (batch_size, U), dtype=jnp.float32
            )
            return lm + trace_splat_wide(
                aa_fields, em_vec, uniforms, n_valid, cfg, group_counts,
                lm.shape[0], sublanes, chains=chains, i8=i8,
            )
        if cfg.device_rng:
            idx, col = trace_deposits_wide_rng(
                aa_fields, em_vec, batch_seed(cfg.seed, base_batch + abs_i),
                n_valid, cfg, group_counts, batch_size, sublanes,
                chains=chains,
            )
        else:
            k = jax.random.fold_in(key, base_batch + abs_i)
            uniforms = jax.random.uniform(
                k, (batch_size, U), dtype=jnp.float32
            )
            idx, col = trace_deposits_wide(
                aa_fields, em_vec, uniforms, n_valid, cfg, group_counts,
                sublanes, chains=chains,
            )
        return _splat(lm, idx, col, cfg)

    return jax.lax.fori_loop(0, seg_len, body, lightmap)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "batch_size", "group_counts", "sublanes",
                     "schedule", "num_texels", "chains"),
)
def _render_all_wide(
    aa_fields, emitters: EmittersDev, key, cfg: PhotonConfig,
    batch_size: int, group_counts, sublanes: int, schedule, num_texels: int,
    chains: int = 1,
):
    """The WHOLE emitter schedule as one device program (one dispatch).

    The per-emitter python loop costs ~80 ms of host/interconnect latency
    per jit call here; at bench budgets that was ~40% of wall clock.
    `schedule` is a static tuple of (emitter, base_batch, n_batches,
    last_valid). Bit-identical to the segmented path (same keying, same
    splat order)."""
    from .schedule import emitter_slice

    U = uniforms_per_photon(cfg.max_depth)
    TB = sublanes * LANES
    lightmap = jnp.zeros((num_texels, 3), jnp.float32)

    def one_batch(lm, ev, i, n_valid, bsz):
        """Trace+splat batch `i` (absolute index) at physical size `bsz`."""
        if cfg.splat in ("inkernel", "inkernel_i8"):
            i8 = cfg.splat == "inkernel_i8"
            if cfg.device_rng:
                return lm + trace_splat_wide_rng(
                    aa_fields, ev, batch_seed(cfg.seed, i),
                    n_valid, cfg, group_counts, num_texels, bsz,
                    sublanes, chains=chains, i8=i8,
                )
            k = jax.random.fold_in(key, i)
            u = jax.random.uniform(k, (bsz, U), dtype=jnp.float32)
            return lm + trace_splat_wide(
                aa_fields, ev, u, n_valid, cfg, group_counts,
                num_texels, sublanes, chains=chains, i8=i8,
            )
        if cfg.device_rng:
            idx, col = trace_deposits_wide_rng(
                aa_fields, ev, batch_seed(cfg.seed, i),
                n_valid, cfg, group_counts, bsz, sublanes,
                chains=chains,
            )
        else:
            k = jax.random.fold_in(key, i)
            u = jax.random.uniform(k, (bsz, U), dtype=jnp.float32)
            idx, col = trace_deposits_wide(
                aa_fields, ev, u, n_valid, cfg, group_counts, sublanes,
                chains=chains,
            )
        return _splat(lm, idx, col, cfg)

    for e, base_batch, n_batches, last_valid in schedule:
        ev = emitter_vector(emitter_slice(emitters, e))

        def body(i, lm, ev=ev, base_batch=base_batch):
            return one_batch(lm, ev, base_batch + i, jnp.int32(batch_size),
                             batch_size)

        # all-but-last batches are full; the tail batch is peeled out of
        # the loop and, on the device-RNG path, launched on a SHRUNK grid:
        # the kernel's counters depend only on (seed, batch index, block
        # id), so dropping the all-masked trailing blocks is bit-identical
        # (dead rows deposit exact +0.0) while skipping their trace AND
        # splat cost — on average half a batch per emitter. Power-of-two
        # block counts bound the number of extra kernel variants compiled
        # to log2(batch/TB). The threefry path keeps the full batch: its
        # uniforms tensor shape feeds the draws, so shrinking would change
        # the photons.
        lightmap = jax.lax.fori_loop(0, n_batches - 1, body, lightmap)
        b_tail = batch_size
        if cfg.device_rng and last_valid < batch_size:
            blocks = -(-last_valid // TB)
            p2 = 1
            while p2 < blocks:
                p2 *= 2
            b_tail = min(batch_size, p2 * TB)
        lightmap = one_batch(
            lightmap, ev, base_batch + n_batches - 1,
            jnp.int32(last_valid), b_tail,
        )
    return lightmap


def render_photons(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    aa: AARectsDev,
    sublanes: int = None,
    checkpoint_path: str = None,
    every_batches: "int | None" = None,
    chains: int = 1,
    on_segment=None,
) -> jnp.ndarray:
    """Full photon pass on the wide AA path (same per-emitter schedule and
    RNG keying as the other engines).

    `sublanes` sets the photon-block height (TB = sublanes*128); measured
    best on v5e is 64 at the default batch size (bench sweeps 2026-08-17),
    auto-clamped so a block never exceeds the batch. With
    `checkpoint_path`, a production run checkpoints/resumes bit-identically
    (engines/schedule.py)."""
    from .schedule import run_schedule

    B = int(cfg.photons_per_batch)
    if B % LANES:
        raise ValueError(
            f"photons_per_batch must be a multiple of {LANES} for the wide "
            f"Pallas engine (got {B}); use the XLA engine otherwise"
        )
    if sublanes is None:
        sublanes = 64
    # the photon-block height must divide the batch
    while sublanes > 1 and B % (sublanes * LANES):
        sublanes //= 2
    key = jax.random.PRNGKey(cfg.seed)
    aa_c, total_c, expand = compact_aa(aa, num_texels)
    cfg = maybe_degrade_splat(cfg, total_c)

    if checkpoint_path is None and on_segment is None:
        # fast path: one device program for the whole schedule
        counts = np.asarray(emitters.counts)
        schedule = []
        base_batch = 0
        for e in range(len(counts)):
            n = int(counts[e])
            if n == 0:
                continue
            n_batches = (n + B - 1) // B
            schedule.append(
                (e, base_batch, n_batches, n - (n_batches - 1) * B)
            )
            base_batch += n_batches
        compact_lm = _render_all_wide(
            aa_c.fields, emitters, key, cfg, B, aa_c.group_counts,
            sublanes, tuple(schedule), total_c, chains,
        )
        return expand(compact_lm)

    def trace_seg(lm, em, base_batch, off, seg, n_batches, last_valid):
        return _trace_emitter_wide(
            lm, aa_c.fields, emitter_vector(em), key, base_batch, off, seg,
            n_batches, last_valid, cfg, B, aa_c.group_counts, sublanes,
            chains,
        )

    seg_cb = None
    if on_segment is not None:
        def seg_cb(lm, done, total):
            on_segment(expand(lm), done, total)

    compact_lm = run_schedule(
        trace_seg,
        emitters,
        total_c,
        cfg,
        B,
        checkpoint_path=checkpoint_path,
        every_batches=every_batches,
        fingerprint_extra=("wide", "compact"),
        on_segment=seg_cb,
    )
    return expand(compact_lm)
