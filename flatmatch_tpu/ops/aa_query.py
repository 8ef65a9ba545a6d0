"""Shared axis-aligned nearest-hit query kernel (Pallas).

One ray -> (nearest front-face distance, hit texel id). The same AA scalar
rect loop as the wide photon megakernel (engines/photon_pallas_wide.py),
packaged as a standalone query for the engines that need a single cast per
ray: ambient occlusion (distance only) and the radiosity form-factor pass
(texel ids). Misses report the _MISS sentinel distance and texel -1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .aa_scene import (
    A_BASE, A_CU, A_CV, A_HLEN, A_HS, A_HT, A_KTU, A_KTV, A_O, A_SN,
    A_WLEN, A_WS, A_WT, F_AA, GROUP_UV,
)

LANES = 128
MISS = 1e30


def resolve_unroll(unroll):
    """Platform-resolved rect-loop unroll: 8 on hardware (+2% photons/s
    measured on the wide photon kernel; 16 blew the compile budget), 4
    elsewhere (interpret-mode compile time roughly doubles at 8).
    Bit-identical either way — the unrolled loop tests rects in the same
    order. Shared by every AA rect-loop kernel (this query, the AO
    distance query, the wide photon megakernel)."""
    if unroll is None:
        return 8 if jax.default_backend() == "tpu" else 4
    return int(unroll)


def _make_kernel(group_counts, S: int, unroll: int):
    g0, g1, _ = group_counts
    starts = (0, g0, g0 + g1)

    def kernel(scene_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               dist_ref, tex_ref):
        p = (ox_ref[:], oy_ref[:], oz_ref[:])
        dr = (dx_ref[:], dy_ref[:], dz_ref[:])
        inv = (1.0 / dr[0], 1.0 / dr[1], 1.0 / dr[2])
        best = jnp.full((S, LANES), MISS, jnp.float32)
        btex = jnp.zeros((S, LANES), jnp.float32)

        for a in range(3):
            count = group_counts[a]
            if count == 0:
                continue
            au, av = GROUP_UV[a]
            pa, ia = p[a], inv[a]
            pu, du_ = p[au], dr[au]
            pv, dv_ = p[av], dr[av]
            da_neg = dr[a] < 0

            def one_rect(j, carry, pa=pa, ia=ia, pu=pu, du_=du_, pv=pv,
                         dv_=dv_, da_neg=da_neg):
                best, btex = carry
                o = scene_ref[A_O, j]
                sn = scene_ref[A_SN, j]
                fac = (o - pa) * ia
                front = jnp.logical_xor(da_neg, sn < 0)
                u = (pu + du_ * fac - scene_ref[A_CU, j]) * scene_ref[A_WS, j]
                v = (pv + dv_ * fac - scene_ref[A_CV, j]) * scene_ref[A_HS, j]
                # min-tree bounds test + dropped lower texel clips: the
                # IEEE-exact rewrite shared with the wide photon kernel
                # (photon_pallas_wide.py) — bit-identical, ~10% fewer VPU
                # ops per rect test
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
                dist = jnp.where(valid, fac, MISS)
                upd = dist < best
                wt = scene_ref[A_WT, j]
                tx = jnp.minimum(
                    jnp.floor(u * scene_ref[A_KTU, j]), wt - 1.0
                )
                ty = jnp.minimum(
                    jnp.floor(v * scene_ref[A_KTV, j]),
                    scene_ref[A_HT, j] - 1.0,
                )
                texel = scene_ref[A_BASE, j] + ty * wt + tx
                return (
                    jnp.where(upd, dist, best),
                    jnp.where(upd, texel, btex),
                )

            # unrolled main loop + static tail (in-order: first-min tie
            # break identical to a rect-at-a-time loop) — same structure
            # as the wide photon kernel's production rect loop
            start = starts[a]
            n_main = count // unroll

            def loop_body(rr_, carry, start=start, one_rect=one_rect):
                j0 = start + rr_ * unroll
                for uu in range(unroll):
                    carry = one_rect(j0 + uu, carry)
                return carry

            best, btex = jax.lax.fori_loop(0, n_main, loop_body,
                                           (best, btex))
            for j in range(start + n_main * unroll, start + count):
                best, btex = one_rect(j, (best, btex))

        hit = best < (MISS * 0.5)
        dist_ref[:] = best
        tex_ref[:] = jnp.where(hit, btex, -1.0).astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("group_counts", "sublanes", "unroll")
)
def aa_nearest(
    aa_fields: jnp.ndarray,
    origins: jnp.ndarray,   # [R, 3]; R % (sublanes*128) == 0
    dirs: jnp.ndarray,      # [R, 3]
    group_counts,
    sublanes: int = 8,
    unroll: "int | None" = None,
):
    """Returns (dist [R] f32 with MISS sentinel, texel [R] int32, -1 on
    miss)."""
    R = origins.shape[0]
    S = int(sublanes)
    TB = S * LANES
    assert R % TB == 0, (R, TB)
    n_blocks = R // TB

    def comp(x, c):
        return x[:, c].reshape(n_blocks * S, LANES)

    N = aa_fields.shape[1]
    kernel = _make_kernel(tuple(group_counts), S, resolve_unroll(unroll))
    ray_spec = pl.BlockSpec((S, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dist, tex = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((F_AA, N), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * S, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * S, LANES), jnp.int32),
        ),
    )(
        aa_fields,
        comp(origins, 0), comp(origins, 1), comp(origins, 2),
        comp(dirs, 0), comp(dirs, 1), comp(dirs, 2),
    )
    return dist.reshape(R), tex.reshape(R)
