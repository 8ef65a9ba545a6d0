"""Photon megakernel (Pallas/TPU): the fused production hot path.

The XLA engine (engines/photon.py) is correct but HBM-bound: every bounce
materializes several [B, N_rects] f32 intermediates in HBM (~10 GB of
traffic per 131k-photon batch). This kernel fuses emission + the full
8-bounce loop into one Pallas program so all per-(photon, rect) work stays
in VMEM:

  - grid over photon blocks (TB photons per program)
  - the rect SoA rides along as a [F, N] "broadcast" matrix (one row per
    field)
  - nearest-hit = broadcasted VPU arithmetic on [TB, N] tiles + row min
  - hit-rect field gather = exact one-hot masked row reductions on the VPU
    (an MXU matmul would run bf16 and corrupt exact fields like base ids)
  - per-bounce deposits (texel id + color) stream out to HBM; the splat is
    one XLA scatter-add outside the kernel (deterministic, cheap)

Physics identical to photonmap.cl:161-265 and engines/photon.trace_batch:
same uniforms layout, same samplers, RR, floor tint, deposit-after-
attenuation. Parity vs the XLA engine is gated in tests.

The kernel is forward-only; the differentiable path stays on the XLA engine
(diff/render.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PhotonConfig
from ..ops.device_scene import EmittersDev, RectsDev
from ..ops.sampling import TWO_PI_REF
from .photon import EmitterSlice, uniforms_per_photon

# scene_fT row layout ([F, N]; transpose used for the gather matmul)
_F_POS = 0      # 0-2   pos xyz
_F_N = 3        # 3-5   normal xyz
_F_WU = 6       # 6-8   w_unit xyz
_F_HU = 9       # 9-11  h_unit xyz
_F_WLEN = 12
_F_HLEN = 13
_F_NOFF = 14
_F_BASE = 15
_F_WT = 16
_F_HT = 17
_NUM_F = 18

_MISS = 1e30  # sentinel distance for "no hit" (avoids inf arithmetic)


def scene_matrix(rects: RectsDev) -> jnp.ndarray:
    """Pack the rect SoA into the [F, N] field matrix.

    Texel ids are computed in f32 inside the kernels, exact only up to 2^24;
    larger arenas must use the XLA engine (int32 ids throughout).
    """
    max_id = int(np.max(np.asarray(rects.base))) + int(
        np.max(np.asarray(rects.wtiles) * np.asarray(rects.htiles))
    )
    if max_id >= (1 << 24):
        raise ValueError(
            f"texel arena too large for f32-exact Pallas texel ids "
            f"({max_id} >= 2^24); use the XLA photon engine"
        )
    rows = [
        rects.pos[:, 0], rects.pos[:, 1], rects.pos[:, 2],
        rects.n[:, 0], rects.n[:, 1], rects.n[:, 2],
        rects.w_unit[:, 0], rects.w_unit[:, 1], rects.w_unit[:, 2],
        rects.h_unit[:, 0], rects.h_unit[:, 1], rects.h_unit[:, 2],
        rects.wlen,
        rects.hlen,
        rects.n_off,
        rects.base.astype(jnp.float32),
        rects.wtiles.astype(jnp.float32),
        rects.htiles.astype(jnp.float32),
    ]
    return jnp.stack(rows, axis=0)


def _normalize_cols(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _build_base_cols(nx, ny, nz):
    """build_base (photonmap.cl:43-48) on per-photon component columns."""
    colinear = jnp.abs(nz) >= 0.999999
    u0x = jnp.zeros_like(nx)
    u0y = jnp.where(colinear, 1.0, 0.0)
    u0z = jnp.where(colinear, 0.0, 1.0)
    # vdir = normalize(cross(u0, n))
    vx = u0y * nz - u0z * ny
    vy = u0z * nx - u0x * nz
    vz = u0x * ny - u0y * nx
    vx, vy, vz = _normalize_cols(vx, vy, vz)
    # udir = normalize(cross(vdir, n))
    ux = vy * nz - vz * ny
    uy = vz * nx - vx * nz
    uz = vx * ny - vy * nx
    ux, uy, uz = _normalize_cols(ux, uy, uz)
    return (ux, uy, uz), (vx, vy, vz)


def _make_kernel(cfg: PhotonConfig, TB: int, N: int):
    D = cfg.max_depth
    eps = np.float32(cfg.self_intersect_eps)
    two_pi = np.float32(TWO_PI_REF)
    rr = np.float32(cfg.rr_mirror_prob)
    mirror_z = np.float32(cfg.mirror_z_threshold)
    tint_z = np.float32(cfg.floor_tint_z_threshold)
    tint = tuple(np.float32(t) for t in cfg.floor_tint)
    albedo = np.float32(cfg.albedo)

    def kernel(em_ref, nvalid_ref, sceneT_ref, u_ref, idx_ref, col_ref):
        # --- emitter scalars -------------------------------------------------
        epx, epy, epz = em_ref[0, 0], em_ref[0, 1], em_ref[0, 2]
        ewx, ewy, ewz = em_ref[0, 3], em_ref[0, 4], em_ref[0, 5]
        ehx, ehy, ehz = em_ref[0, 6], em_ref[0, 7], em_ref[0, 8]
        enx, eny, enz = em_ref[0, 9], em_ref[0, 10], em_ref[0, 11]
        ecr, ecg, ecb = em_ref[0, 12], em_ref[0, 13], em_ref[0, 14]
        is_window = em_ref[0, 15]

        # --- emission (photonmap.cl:173-181) ---------------------------------
        dx = u_ref[:, 0:1]
        dy = u_ref[:, 1:2]
        r = jnp.sqrt(u_ref[:, 2:3])
        phi = two_pi * u_ref[:, 3:4]
        uu = r * jnp.cos(phi)
        vv = r * jnp.sin(phi)
        nn = jnp.sqrt(1.0 - r * r)
        uu = jnp.where(is_window > 0, jnp.abs(uu), uu)  # sky fold

        onesTB = jnp.ones((TB, 1), jnp.float32)
        (ux, uy, uz), (vx, vy, vz) = _build_base_cols(
            enx * onesTB, eny * onesTB, enz * onesTB
        )
        dirx = ux * uu + vx * vv + enx * nn
        diry = uy * uu + vy * vv + eny * nn
        dirz = uz * uu + vz * vv + enz * nn
        px = epx + ewx * dx + ehx * dy + dirx * eps
        py = epy + ewy * dx + ehy * dy + diry * eps
        pz = epz + ewz * dx + ehz * dy + dirz * eps

        cr = ecr * onesTB
        cg = ecg * onesTB
        cb = ecb * onesTB

        gid = (
            pl.program_id(0) * TB
            + jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0)
        )
        alive = (gid < nvalid_ref[0, 0]).astype(jnp.float32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, N), 1)

        # broadcast rows of the scene matrix: [1, N]
        def row(f):
            return sceneT_ref[f, :][None, :]

        rpx, rpy, rpz = row(_F_POS), row(_F_POS + 1), row(_F_POS + 2)
        rnx, rny, rnz = row(_F_N), row(_F_N + 1), row(_F_N + 2)
        n_off = row(_F_NOFF)

        for d in range(D):
            # --- nearest hit over all rects (rectangle.c:67-95) --------------
            denom = dirx * rnx + diry * rny + dirz * rnz        # [TB, N]
            pn = px * rnx + py * rny + pz * rnz
            fac = (n_off - pn) / denom
            # hit-point projections, expanded (no [TB,N,3] temps)
            hx = px + dirx * fac
            hy = py + diry * fac
            hz = pz + dirz * fac
            pdx = (
                (hx - rpx) * row(_F_WU)
                + (hy - rpy) * row(_F_WU + 1)
                + (hz - rpz) * row(_F_WU + 2)
            )
            pdy = (
                (hx - rpx) * row(_F_HU)
                + (hy - rpy) * row(_F_HU + 1)
                + (hz - rpz) * row(_F_HU + 2)
            )
            # min-tree form of the bounds chain: IEEE-exact equivalent
            # (subtraction is exactly rounded so wlen-pdx >= 0 <=> pdx <=
            # wlen; NaN propagates through minimum and fails >= 0) — same
            # rewrite as the wide kernel, ~2 fewer VPU ops per pair
            valid = (denom < 0) & (
                jnp.minimum(
                    jnp.minimum(fac, pdx),
                    jnp.minimum(
                        row(_F_WLEN) - pdx,
                        jnp.minimum(pdy, row(_F_HLEN) - pdy),
                    ),
                )
                >= 0
            )
            dist = jnp.where(valid, fac, _MISS)
            mind = jnp.min(dist, axis=1, keepdims=True)          # [TB, 1]
            hitmask = mind < (_MISS * 0.5)
            alive = alive * hitmask.astype(jnp.float32)
            # first-min tie break, exact one-hot
            cand = jnp.where(dist == mind, lane, N)
            hit_idx = jnp.min(cand, axis=1, keepdims=True)
            onehot = lane == hit_idx                             # [TB, N] bool

            # --- texel id computed IN LANE SPACE, then gathered --------------
            # (rectangle.c:205-230; floor == trunc once clamped >= 0). pdx/pdy
            # at fac are exactly the hit-point projections, so the per-lane
            # tile math matches the post-advance computation of the XLA
            # engine; computing it per (photon, rect) costs ~10 VPU ops but
            # shrinks the exact one-hot gather from 18 masked reductions to 4.
            wt_l = row(_F_WT)
            ht_l = row(_F_HT)
            # lower clip dropped: the one-hot winner is valid (pdx/pdy >=
            # 0 there); losing lanes are zeroed by the masked gather
            tx_l = jnp.minimum(
                jnp.floor(pdx * wt_l / row(_F_WLEN)), wt_l - 1.0
            )
            ty_l = jnp.minimum(
                jnp.floor(pdy * ht_l / row(_F_HLEN)), ht_l - 1.0
            )
            texel_l = row(_F_BASE) + ty_l * wt_l + tx_l          # [TB, N]

            # exact one-hot gather via masked row reductions (an MXU matmul
            # would run bf16 and corrupt exact ids; one live lane per row)
            def pick_arr(a):
                return jnp.sum(
                    jnp.where(onehot, a, 0.0), axis=1, keepdims=True
                )

            texel = pick_arr(texel_l)                            # [TB, 1] f32
            hnx = pick_arr(jnp.broadcast_to(rnx, (TB, N)))
            hny = pick_arr(jnp.broadcast_to(rny, (TB, N)))
            hnz = pick_arr(jnp.broadcast_to(rnz, (TB, N)))

            dist_safe = jnp.where(hitmask, mind, 0.0)
            px = px + dirx * dist_safe
            py = py + diry * dist_safe
            pz = pz + dirz * dist_safe

            # --- Russian roulette + bounce (photonmap.cl:236-254) ------------
            u_rr = u_ref[:, 4 + 3 * d:5 + 3 * d]
            u1 = u_ref[:, 5 + 3 * d:6 + 3 * d]
            u2 = u_ref[:, 6 + 3 * d:7 + 3 * d]
            diffuse = (pz > mirror_z) | (u_rr > rr)

            rd = jnp.sqrt(u1)
            phid = two_pi * u2
            du = rd * jnp.cos(phid)
            dv = rd * jnp.sin(phid)
            dn = jnp.sqrt(1.0 - rd * rd)
            (bux, buy, buz), (bvx, bvy, bvz) = _build_base_cols(hnx, hny, hnz)
            ddx = bux * du + bvx * dv + hnx * dn
            ddy = buy * du + bvy * dv + hny * dn
            ddz = buz * du + bvz * dv + hnz * dn

            ndotd = hnx * dirx + hny * diry + hnz * dirz
            mdx = dirx - 2.0 * ndotd * hnx
            mdy = diry - 2.0 * ndotd * hny
            mdz = dirz - 2.0 * ndotd * hnz

            on_floor = pz < tint_z
            tr = jnp.where(on_floor, tint[0], 1.0)
            tg = jnp.where(on_floor, tint[1], 1.0)
            tb = jnp.where(on_floor, tint[2], 1.0)
            cr = jnp.where(diffuse, cr * tr * albedo, cr)
            cg = jnp.where(diffuse, cg * tg * albedo, cg)
            cb = jnp.where(diffuse, cb * tb * albedo, cb)
            dirx = jnp.where(diffuse, ddx, mdx)
            diry = jnp.where(diffuse, ddy, mdy)
            dirz = jnp.where(diffuse, ddz, mdz)

            # --- deposit (photonmap.cl:256-258) -------------------------------
            # NaN guard: when a row has no hit, the picked texel can be NaN
            # (projections of an escaped ray); the color is 0 either way but
            # the stored id must stay in-bounds.
            idx_ref[:, d:d + 1] = jnp.where(alive > 0, texel, 0.0).astype(
                jnp.int32
            )
            col_ref[:, 3 * d:3 * d + 1] = cr * alive
            col_ref[:, 3 * d + 1:3 * d + 2] = cg * alive
            col_ref[:, 3 * d + 2:3 * d + 3] = cb * alive

            px = px + dirx * eps
            py = py + diry * eps
            pz = pz + dirz * eps

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_photons")
)
def trace_deposits_pallas(
    sceneT: jnp.ndarray,
    em_vec: jnp.ndarray,
    uniforms: jnp.ndarray,
    n_valid,
    cfg: PhotonConfig,
    block_photons: int = 512,
):
    """Run the megakernel: returns (texel ids [B, D] int32, colors [B, D*3]).

    Dead/missed deposits have color 0 (and id 0), so a plain scatter-add of
    the outputs reproduces trace_batch exactly.
    """
    B, U = uniforms.shape
    F, N = sceneT.shape
    TB = int(block_photons)
    assert B % TB == 0, (B, TB)
    D = cfg.max_depth
    kernel = _make_kernel(cfg, TB, N)
    grid = (B // TB,)
    nvalid_arr = jnp.full((1, 1), n_valid, jnp.int32)
    idx, col = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3 * D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.int32),
            jax.ShapeDtypeStruct((B, 3 * D), jnp.float32),
        ),
    )(em_vec, nvalid_arr, sceneT, uniforms)
    return idx, col


def emitter_vector(em: EmitterSlice) -> jnp.ndarray:
    """[1, 16] f32: pos, wvec, hvec, n, color, is_window flag."""
    return jnp.concatenate(
        [
            em.pos,
            em.wvec,
            em.hvec,
            em.n,
            em.color,
            jnp.where(em.is_window, 1.0, 0.0)[None].astype(jnp.float32),
        ]
    ).reshape(1, 16)


def trace_batch_pallas(
    lightmap, sceneT, em_vec, uniforms, n_valid, cfg: PhotonConfig,
    block_photons: int = 512,
):
    idx, col = trace_deposits_pallas(
        sceneT, em_vec, uniforms, n_valid, cfg, block_photons
    )
    B, D = idx.shape
    return lightmap.at[idx.reshape(-1)].add(col.reshape(B * D, 3))


@functools.partial(
    jax.jit, static_argnames=("cfg", "batch_size", "block_photons")
)
def _trace_emitter_pallas(
    lightmap, sceneT, em_vec, key, base_batch, batch_offset, seg_len,
    n_batches, last_batch_valid, cfg: PhotonConfig, batch_size: int,
    block_photons: int,
):
    U = uniforms_per_photon(cfg.max_depth)

    def body(i, lm):
        k = jax.random.fold_in(key, base_batch + i)
        uniforms = jax.random.uniform(k, (batch_size, U), dtype=jnp.float32)
        n_valid = jnp.where(
            i == n_batches - 1, last_batch_valid, jnp.int32(batch_size)
        )
        return trace_batch_pallas(
            lm, sceneT, em_vec, uniforms, n_valid, cfg, block_photons,
        )

    return jax.lax.fori_loop(batch_offset, batch_offset + seg_len, body,
                             lightmap)


def render_photons(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    block_photons: int = 512,
    checkpoint_path=None,
    on_segment=None,
) -> jnp.ndarray:
    """Full photon pass on the Pallas path (same RNG schedule as the XLA
    engine: fold_in(seed, global_batch_index)). Driven by the shared
    emitter schedule, so --checkpoint / --preview work identically to the
    XLA and wide engines (engines/schedule.py)."""
    from .schedule import run_schedule

    sceneT = scene_matrix(rects)
    key = jax.random.PRNGKey(cfg.seed)
    B = int(cfg.photons_per_batch)

    def trace_seg(lm, em, base_batch, off, seg, n_batches, last_valid):
        return _trace_emitter_pallas(
            lm, sceneT, emitter_vector(em), key, base_batch, off, seg,
            n_batches, last_valid, cfg, B, block_photons,
        )

    return run_schedule(
        trace_seg, emitters, num_texels, cfg, B,
        checkpoint_path=checkpoint_path,
        fingerprint_extra=("pallas_narrow",),
        on_segment=on_segment,
    )
