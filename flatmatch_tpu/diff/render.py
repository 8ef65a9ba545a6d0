"""Differentiable photon rendering: gradients w.r.t. per-surface albedo and
per-emitter power.

The reference renderer is not differentiable — this is new capability
demanded by the TPU re-design (BASELINE.md north-star: "albedo-gradient
allclose vs an autodiff oracle"). Parameterization:

  - `albedo` [N_rects]: per-rect diffuse reflectance, replacing the global
    0.9 constant (photonmap.cl:249)
  - `power`  [N_emitters]: scalar multiplier on each emitter's flux color
    (photonmap.cl:167-169)

Key physics fact exploited by the backward pass: photon TRAJECTORIES depend
only on the RNG draws and the geometry — never on albedo or power (the
Russian-roulette branch compares a uniform against the fixed 0.75, and
directions are resampled geometrically). Only deposited magnitudes are
parameter-dependent, and each deposit is

    deposit(d) = power[e] * base_color * prod_{diffuse hits k<=d} albedo[r_k] * tint_k

so the whole lightmap is linear in power and polynomial in albedo. The
custom VJPs below therefore save only the PARAMETERS as residuals and
REPLAY the forward trajectories from the same threefry counters per batch
in the backward (SURVEY.md §7 step 6). Within one replayed batch,
`make_diff_renderer`'s backward uses jax.vjp over trace_batch (standard
per-batch autodiff residuals, bounded by the batch size);
`make_diff_renderer_wide`'s backward is fully analytic over the deposit
stream — no autodiff residuals at all, just the [B*D] ids/colors it
recomputes and consumes per batch.
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

from ..config import PhotonConfig
from ..ops.device_scene import EmittersDev, RectsDev
from ..engines import schedule as schedule_mod
from ..engines.photon import trace_batch, uniforms_per_photon


def _emitter_batches(counts, batch_size):
    out = []
    base_batch = 0
    for e in range(len(counts)):
        n = int(counts[e])
        if n == 0:
            continue
        n_batches = (n + batch_size - 1) // batch_size
        last_valid = n - (n_batches - 1) * batch_size
        out.append((e, base_batch, n_batches, last_valid))
        base_batch += n_batches
    return out


def make_diff_renderer(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
):
    """Returns a differentiable fn(albedo [N], power [E]) -> lightmap [T,3].

    Deterministic for fixed cfg.seed; gradients via trajectory replay.
    """
    B = int(cfg.photons_per_batch)
    U = uniforms_per_photon(cfg.max_depth)
    schedule = _emitter_batches(np.asarray(emitters.counts), B)
    key = jax.random.PRNGKey(cfg.seed)

    def emitter_slice(e):
        return schedule_mod.emitter_slice(emitters, e)

    def batch_uniforms(batch_idx):
        k = jax.random.fold_in(key, batch_idx)
        return jax.random.uniform(k, (B, U), dtype=jnp.float32)

    def n_valid(i, n_batches, last_valid):
        return jnp.where(
            i == n_batches - 1, jnp.int32(last_valid), jnp.int32(B)
        )

    def forward_loop(albedo, power):
        """Plain forward accumulation over every emitter's batches."""
        lm = jnp.zeros((num_texels, 3), jnp.float32)
        for e, base_batch, n_batches, last_valid in schedule:
            em = emitter_slice(e)

            def body(i, lm, em=em, e=e, base_batch=base_batch,
                     n_batches=n_batches, last_valid=last_valid):
                u = batch_uniforms(base_batch + i)
                return trace_batch(
                    lm, rects, em, u, n_valid(i, n_batches, last_valid), cfg,
                    albedo=albedo, power=power[e],
                )

            lm = jax.lax.fori_loop(0, n_batches, body, lm)
        return lm

    @jax.custom_vjp
    def render(albedo, power):
        return forward_loop(albedo, power)

    def render_fwd(albedo, power):
        # residuals: just the parameters — trajectories replay from RNG
        return forward_loop(albedo, power), (albedo, power)

    def render_bwd(res, g):
        albedo, power = res
        d_albedo = jnp.zeros_like(albedo)
        d_power = jnp.zeros_like(power)
        for e, base_batch, n_batches, last_valid in schedule:
            em = emitter_slice(e)

            def body(i, carry, em=em, e=e, base_batch=base_batch,
                     n_batches=n_batches, last_valid=last_valid):
                da, dp = carry
                u = batch_uniforms(base_batch + i)

                def delta(a, p):
                    return trace_batch(
                        jnp.zeros((num_texels, 3), jnp.float32),
                        rects, em, u,
                        n_valid(i, n_batches, last_valid), cfg,
                        albedo=a, power=p,
                    )

                _, vjp_fn = jax.vjp(delta, albedo, power[e])
                da_b, dp_b = vjp_fn(g)
                return da + da_b, dp.at[e].add(dp_b)

            d_albedo, d_power = jax.lax.fori_loop(
                0, n_batches, body, (d_albedo, d_power)
            )
        return d_albedo, d_power

    render.defvjp(render_fwd, render_bwd)
    return jax.jit(render)


def make_diff_renderer_sharded(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    mesh,
):
    """Multi-chip differentiable renderer: photon DP over the `photons` mesh
    axis with psum-reduced lightmaps AND psum-reduced parameter cotangents.

    On overlap (amending SURVEY §7 step 6's "overlap gradient psum with
    backward replay"): the parameter cotangents here are O(N_rects +
    N_emitters) ~ 1 KB, one psum per backward — there is no transfer worth
    hiding behind compute. That design note applies to frameworks with
    large gradients; this workload's only meaningful collective is the
    forward lightmap psum ([T, 3] per emitter), which XLA's async
    collective scheduler already overlaps where profitable.

    Deterministic for fixed (seed, device count). Forward and backward use
    the same per-(batch, device) threefry keys, so the backward replays the
    exact forward trajectories shard-locally; only the [N]+[E] cotangent
    psum crosses chips.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map
    n_dev = mesh.shape["photons"]
    B = int(cfg.photons_per_batch)
    if B % n_dev:
        B = ((B + n_dev - 1) // n_dev) * n_dev
    b_local = B // n_dev
    U = uniforms_per_photon(cfg.max_depth)
    schedule = _emitter_batches(np.asarray(emitters.counts), B)
    key = jax.random.PRNGKey(cfg.seed)
    repl = P()

    def emitter_slice(e):
        return schedule_mod.emitter_slice(emitters, e)

    def local_uniforms(batch_idx, ax):
        k = jax.random.fold_in(key, batch_idx)
        k = jax.random.fold_in(k, ax)
        return jax.random.uniform(k, (b_local, U), dtype=jnp.float32)

    def local_n_valid(i, ax, n_batches, last_valid):
        n_valid_global = jnp.where(
            i == n_batches - 1, jnp.int32(last_valid), jnp.int32(B)
        )
        return jnp.clip(n_valid_global - ax * b_local, 0, b_local).astype(
            jnp.int32
        )

    def forward_loop(albedo, power):
        @functools.partial(
            shard_map, mesh=mesh, in_specs=(repl, repl),
            out_specs=repl, check_vma=False,
        )
        def run(albedo, power):
            ax = jax.lax.axis_index("photons")
            lm = jnp.zeros((num_texels, 3), jnp.float32)
            for e, base_batch, n_batches, last_valid in schedule:
                em = emitter_slice(e)

                def body(i, lm, em=em, e=e, base_batch=base_batch,
                         n_batches=n_batches, last_valid=last_valid):
                    u = local_uniforms(base_batch + i, ax)
                    return trace_batch(
                        lm, rects, em, u,
                        local_n_valid(i, ax, n_batches, last_valid), cfg,
                        albedo=albedo, power=power[e],
                    )

                lm = jax.lax.fori_loop(0, n_batches, body, lm)
            return jax.lax.psum(lm, "photons")

        return run(albedo, power)

    @jax.custom_vjp
    def render(albedo, power):
        return forward_loop(albedo, power)

    def render_fwd(albedo, power):
        return forward_loop(albedo, power), (albedo, power)

    def render_bwd(res, g):
        albedo, power = res

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(repl, repl, repl),
            out_specs=(repl, repl), check_vma=False,
        )
        def run(albedo, power, g):
            ax = jax.lax.axis_index("photons")
            d_albedo = jnp.zeros_like(albedo)
            d_power = jnp.zeros_like(power)
            for e, base_batch, n_batches, last_valid in schedule:
                em = emitter_slice(e)

                def body(i, carry, em=em, e=e, base_batch=base_batch,
                         n_batches=n_batches, last_valid=last_valid):
                    da, dp = carry
                    u = local_uniforms(base_batch + i, ax)
                    nv = local_n_valid(i, ax, n_batches, last_valid)

                    def delta(a, p):
                        return trace_batch(
                            jnp.zeros((num_texels, 3), jnp.float32),
                            rects, em, u, nv, cfg, albedo=a, power=p,
                        )

                    _, vjp_fn = jax.vjp(delta, albedo, power[e])
                    da_b, dp_b = vjp_fn(g)
                    return da + da_b, dp.at[e].add(dp_b)

                d_albedo, d_power = jax.lax.fori_loop(
                    0, n_batches, body, (d_albedo, d_power)
                )
            # gradient all-reduce over the same photon axis
            return (
                jax.lax.psum(d_albedo, "photons"),
                jax.lax.psum(d_power, "photons"),
            )

        return run(albedo, power, g)

    render.defvjp(render_fwd, render_bwd)
    return jax.jit(render)


def _make_scale_pair(cfg: PhotonConfig, D: int):
    """Dynamic i8 quantization grid, shared by the single-chip and sharded
    wide diff renderers (their grids must be bit-equal for the sharded
    forward to reduce to the single-chip one): covers the parameter-scaled
    deposit bound max emitter channel * max(1,|power[e]|) *
    max(1, max albedo)^D. The albedo bound is taken over the PERMUTED slot
    vector albedo_aa — the albedos actually reachable by deposits — not
    the raw (possibly padded) parameter vector, so unused entries cannot
    inflate the grid. corr multiplies the PRODUCTION host constants, so at
    power<=1, albedo<=1 it is exactly 1.0 and both scale and inv_scale are
    bit-equal to the production i8 splat's."""
    from ..engines.photon_pallas_wide import splat_color_scale

    base_s = np.float32(splat_color_scale(cfg))
    base_inv = np.float32(1.0 / splat_color_scale(cfg))

    def scale_pair(e, albedo_aa, power):
        corr = jnp.maximum(
            jnp.float32(1.0), jnp.abs(power[e])
        ) * jnp.maximum(jnp.float32(1.0), jnp.max(albedo_aa)) ** D
        return base_s * corr, base_inv / corr

    return scale_pair


def make_diff_renderer_wide(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    aa,
    sublanes: int = 32,
    tail_shrink: bool = True,
):
    """Differentiable renderer on the PRODUCTION wide Pallas kernel.

    Forward: the wide AA megakernel with per-rect albedo applied in-kernel.
    Backward: REPLAYS the same kernel from the same counters — trajectories
    are parameter-independent, so the replay reproduces the exact forward
    deposit stream — then folds the lightmap cotangent analytically:

        deposit(p, d) = power[e] * base * prod_{diffuse k<=d} albedo[r_k] * tint_k
        w(p, d)   = <g[texel(p, d)], deposit(p, d)>
        S(p, k)   = sum_{d>=k} w(p, d)                  (suffix sum, D=8)
        d_albedo[r] = sum_{p, k: diffuse hit on r} S(p, k) / albedo[r]
        d_power[e]  = sum_{p in e} sum_d w(p, d) / power[e]

    Residual memory is O(params): only (albedo, power) are saved.

    Speed tiers by cfg.splat (round-4 redesign — the round-3 diff tier
    ran at 13% of the production forward because the forward streamed
    [B*D] deposits to HBM for a standalone splat and the backward folded
    them in XLA with a [B*D] gather + segment_sum):

    - in-kernel family ('inkernel*'/'fused*', incl. the production
      config 'inkernel_i8'): forward = trace_splat_wide_diff[_rng]
      (in-kernel splat, no deposit stream at all), backward =
      trace_fold_wide[_rng] (the fold runs IN-KERNEL on the MXU; only
      [N]+[1] cotangents leave the kernel per batch). Honors
      cfg.device_rng. The *_i8 names run the forward splat at int8 MXU
      rate over a DYNAMIC quantization grid: the production constant
      grid (splat_color_scale) times corr(e) = max(1,|power[e]|) *
      max(1, max(albedo))^D, a traced scalar that covers the
      parameter-scaled deposit bound — at power<=1, albedo<=1 corr is
      exactly 1.0 and the grid (and the lightmap, under device RNG)
      is BIT-identical to production inkernel_i8. Gradients are
      i8-independent: the fold kernel replays exact f32 colors.
    - 'scatter'/'bucket*': the exact-f32 deposit-stream path (XLA fold),
      kept as the oracle-parity tier (bit-identical to the plain engines).

    `tail_shrink` (device-RNG in-kernel tiers only): each emitter's last
    batch launches on a power-of-two-reduced grid exactly like the
    production _render_all_wide tail peel — bit-identical (masked photons
    deposit +0.0 and fold 0 cotangent) while skipping the dead blocks'
    trace, splat AND replay cost in both passes.

    Both tiers render in the COMPACT level-0 arena (compact_aa) and expand
    once. Anchor: the deposit chain of photonmap.cl:236-258 — every deposit
    is linear in power and in each picked-up albedo factor.
    """
    from ..engines.photon_pallas import emitter_vector
    from ..engines.photon_pallas_wide import (
        LANES, _splat, batch_seed, compact_aa, compact_arena_positions,
        cotangent_t, maybe_degrade_splat, trace_deposits_wide_diff,
        trace_fold_wide, trace_fold_wide_rng, trace_splat_wide_diff,
        trace_splat_wide_diff_rng,
    )

    aa_c, total_c, expand = compact_aa(aa, num_texels)
    cfg = maybe_degrade_splat(cfg, total_c)
    fused = cfg.splat in ("inkernel", "fused", "inkernel_i8", "fused_i8")
    i8 = fused and cfg.splat.endswith("_i8")
    device_rng = bool(cfg.device_rng) and fused

    D = cfg.max_depth
    S = int(sublanes)
    B = int(cfg.photons_per_batch)
    # prefer shrinking the block height over growing the batch (growing
    # would change the draw schedule vs the configured budget)
    while S > 1 and B % (S * LANES):
        S //= 2
    TB = S * LANES
    if B % TB:
        B = ((B + TB - 1) // TB) * TB
    n_blocks = B // TB
    U = uniforms_per_photon(cfg.max_depth)
    schedule = _emitter_batches(np.asarray(emitters.counts), B)
    key = jax.random.PRNGKey(cfg.seed)
    perm = jnp.asarray(np.asarray(aa.perm), jnp.int32)  # slot -> rect index
    N = int(perm.shape[0])
    arena_pos = jnp.asarray(compact_arena_positions(aa), jnp.int32)

    def emitter_slice(e):
        return schedule_mod.emitter_slice(emitters, e)

    def em_vec_scaled(e, power):
        v = emitter_vector(emitter_slice(e))
        return v.at[:, 12:15].mul(power[e])

    def batch_uniforms(batch_idx):
        k = jax.random.fold_in(key, batch_idx)
        return jax.random.uniform(k, (B, U), dtype=jnp.float32)

    def n_valid(i, n_batches, last_valid):
        return jnp.where(
            i == n_batches - 1, jnp.int32(last_valid), jnp.int32(B)
        )

    scale_pair = _make_scale_pair(cfg, D)

    def tail_batch_size(last_valid):
        """Power-of-two-reduced tail grid (photon_pallas_wide
        _render_all_wide tail peel); full batch unless shrinking applies."""
        if not (tail_shrink and device_rng) or last_valid >= B:
            return B
        blocks = -(-last_valid // TB)
        p2 = 1
        while p2 < blocks:
            p2 *= 2
        return min(B, p2 * TB)

    def forward_loop(albedo, power):
        albedo_aa = albedo[perm]
        lm = jnp.zeros((total_c, 3), jnp.float32)
        for e, base_batch, n_batches, last_valid in schedule:
            ev = em_vec_scaled(e, power)
            sc = scale_pair(e, albedo_aa, power) if i8 else (None, None)

            def one(lm, abs_i, nv, bsz, ev=ev, sc=sc):
                if fused:
                    if device_rng:
                        return lm + trace_splat_wide_diff_rng(
                            aa_c.fields, albedo_aa, ev,
                            batch_seed(cfg.seed, abs_i), nv, cfg,
                            aa_c.group_counts, total_c, bsz, S,
                            i8=i8, scale=sc[0], inv_scale=sc[1],
                        )
                    return lm + trace_splat_wide_diff(
                        aa_c.fields, albedo_aa, ev,
                        batch_uniforms(abs_i), nv, cfg,
                        aa_c.group_counts, total_c, S,
                        i8=i8, scale=sc[0], inv_scale=sc[1],
                    )
                idx, col, _ = trace_deposits_wide_diff(
                    aa_c.fields, albedo_aa, ev,
                    batch_uniforms(abs_i), nv, cfg,
                    aa_c.group_counts, S,
                )
                return _splat(lm, idx, col, cfg)

            def body(i, lm, base_batch=base_batch):
                return one(lm, base_batch + i, jnp.int32(B), B)

            lm = jax.lax.fori_loop(0, n_batches - 1, body, lm)
            lm = one(
                lm, base_batch + n_batches - 1, jnp.int32(last_valid),
                tail_batch_size(last_valid),
            )
        return expand(lm)

    @jax.custom_vjp
    def render(albedo, power):
        return forward_loop(albedo, power)

    def render_fwd(albedo, power):
        # residuals: parameters only — the backward replays trajectories
        return forward_loop(albedo, power), (albedo, power)

    def render_bwd(res, g):
        albedo, power = res
        albedo_aa = albedo[perm]
        g_c = g[arena_pos]                 # exact transpose of expand()
        g_t = cotangent_t(g_c, total_c) if fused else None
        da_slots = jnp.zeros((N,), jnp.float32)
        d_power = jnp.zeros_like(power)
        for e, base_batch, n_batches, last_valid in schedule:
            ev = em_vec_scaled(e, power)

            def one(carry, abs_i, nv, bsz, ev=ev):
                da, dpe = carry
                if fused:
                    if device_rng:
                        da_b, w_sum = trace_fold_wide_rng(
                            aa_c.fields, albedo_aa, ev, g_t,
                            batch_seed(cfg.seed, abs_i), nv, cfg,
                            aa_c.group_counts, N, bsz, S,
                        )
                    else:
                        da_b, w_sum = trace_fold_wide(
                            aa_c.fields, albedo_aa, ev, g_t,
                            batch_uniforms(abs_i), nv, cfg,
                            aa_c.group_counts, N, S,
                        )
                    return da + da_b, dpe + w_sum
                idx, col, ridx = trace_deposits_wide_diff(
                    aa_c.fields, albedo_aa, ev,
                    batch_uniforms(abs_i), nv, cfg,
                    aa_c.group_counts, S,
                )
                w = jnp.sum(g_c[idx] * col, axis=-1)         # [B*D]
                w3 = w.reshape(n_blocks, D, S * LANES)
                suf = jnp.cumsum(w3[:, ::-1, :], axis=1)[:, ::-1, :]
                contrib = jnp.where(ridx >= 0, suf.reshape(-1), 0.0)
                da = da + jax.ops.segment_sum(
                    contrib, jnp.clip(ridx, 0, N - 1), num_segments=N
                )
                return da, dpe + w.sum()

            def body(i, carry, base_batch=base_batch):
                return one(carry, base_batch + i, jnp.int32(B), B)

            da_slots, dpe = jax.lax.fori_loop(
                0, n_batches - 1, body, (da_slots, jnp.float32(0.0))
            )
            da_slots, dpe = one(
                (da_slots, dpe), base_batch + n_batches - 1,
                jnp.int32(last_valid), tail_batch_size(last_valid),
            )
            d_power = d_power.at[e].add(
                jnp.where(power[e] != 0, dpe / power[e], 0.0)
            )
        safe = jnp.where(albedo_aa > 1e-12, albedo_aa, 1.0)
        da_slots = jnp.where(albedo_aa > 1e-12, da_slots / safe, 0.0)
        d_albedo = jnp.zeros_like(albedo).at[perm].add(da_slots)
        return d_albedo, d_power

    render.defvjp(render_fwd, render_bwd)
    return jax.jit(render)


def make_diff_renderer_sharded_wide(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    aa,
    mesh,
    sublanes: int = 32,
):
    """make_diff_renderer_wide with photon DP over the `photons` mesh:
    the production wide kernel forward AND its replay backward run
    shard-locally on each chip's photon slice; one lightmap psum per
    forward, one [N]+[E] cotangent psum per backward. Same (batch, device)
    keying as every other sharded engine. Like the single-chip version,
    the in-kernel splat/fold tier serves cfg.splat in-kernel modes (with
    cfg.device_rng honored; *_i8 runs the forward splat on the dynamic
    quantization grid, see make_diff_renderer_wide) and the deposit-stream
    XLA fold remains the exact-f32 tier for 'scatter'/'bucket*'."""
    from jax.sharding import PartitionSpec as P

    from ..engines.photon_pallas import emitter_vector
    from ..engines.photon_pallas_wide import (
        LANES, _splat, batch_seed, compact_aa, compact_arena_positions,
        cotangent_t, device_seed, maybe_degrade_splat,
        trace_deposits_wide_diff, trace_fold_wide, trace_fold_wide_rng,
        trace_splat_wide_diff, trace_splat_wide_diff_rng,
    )

    aa_c, total_c, expand = compact_aa(aa, num_texels)
    cfg = maybe_degrade_splat(cfg, total_c)
    fused = cfg.splat in ("inkernel", "fused", "inkernel_i8", "fused_i8")
    i8 = fused and cfg.splat.endswith("_i8")
    device_rng = bool(cfg.device_rng) and fused

    shard_map = jax.shard_map
    n_dev = mesh.shape["photons"]
    D = cfg.max_depth
    B = int(cfg.photons_per_batch)
    quantum = LANES * n_dev
    if B % quantum:
        B = ((B + quantum - 1) // quantum) * quantum
    b_local = B // n_dev
    S = int(sublanes)
    while S > 1 and b_local % (S * LANES):
        S //= 2
    TB = S * LANES
    nb_local = b_local // TB
    U = uniforms_per_photon(cfg.max_depth)
    schedule = _emitter_batches(np.asarray(emitters.counts), B)
    key = jax.random.PRNGKey(cfg.seed)
    perm = jnp.asarray(np.asarray(aa.perm), jnp.int32)
    N = int(perm.shape[0])
    arena_pos = jnp.asarray(compact_arena_positions(aa), jnp.int32)
    repl = P()

    def emitter_slice(e):
        return schedule_mod.emitter_slice(emitters, e)

    def em_vec_scaled(e, power):
        return emitter_vector(emitter_slice(e)).at[:, 12:15].mul(power[e])

    scale_pair = _make_scale_pair(cfg, cfg.max_depth)

    def local_batch(i, ax, base_batch):
        k = jax.random.fold_in(key, base_batch + i)
        k = jax.random.fold_in(k, ax)
        return jax.random.uniform(k, (b_local, U), dtype=jnp.float32)

    def local_seed(i, ax, base_batch):
        return device_seed(batch_seed(cfg.seed, base_batch + i), ax)

    def local_n_valid(i, ax, n_batches, last_valid):
        nv = jnp.where(
            i == n_batches - 1, jnp.int32(last_valid), jnp.int32(B)
        )
        return jnp.clip(nv - ax * b_local, 0, b_local).astype(jnp.int32)

    def forward_loop(albedo, power):
        albedo_aa = albedo[perm]

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(repl, repl),
            out_specs=repl, check_vma=False,
        )
        def run(albedo_aa, power):
            ax = jax.lax.axis_index("photons")
            lm = jnp.zeros((total_c, 3), jnp.float32)
            for e, base_batch, n_batches, last_valid in schedule:
                ev = em_vec_scaled(e, power)
                sc = scale_pair(e, albedo_aa, power) if i8 else (None, None)

                def body(i, lm, ev=ev, sc=sc, base_batch=base_batch,
                         n_batches=n_batches, last_valid=last_valid):
                    nv = local_n_valid(i, ax, n_batches, last_valid)
                    if fused:
                        if device_rng:
                            return lm + trace_splat_wide_diff_rng(
                                aa_c.fields, albedo_aa, ev,
                                local_seed(i, ax, base_batch), nv, cfg,
                                aa_c.group_counts, total_c, b_local, S,
                                i8=i8, scale=sc[0], inv_scale=sc[1],
                            )
                        return lm + trace_splat_wide_diff(
                            aa_c.fields, albedo_aa, ev,
                            local_batch(i, ax, base_batch), nv, cfg,
                            aa_c.group_counts, total_c, S,
                            i8=i8, scale=sc[0], inv_scale=sc[1],
                        )
                    idx, col, _ = trace_deposits_wide_diff(
                        aa_c.fields, albedo_aa, ev,
                        local_batch(i, ax, base_batch), nv, cfg,
                        aa_c.group_counts, S,
                    )
                    return _splat(lm, idx, col, cfg)

                lm = jax.lax.fori_loop(0, n_batches, body, lm)
            return jax.lax.psum(lm, "photons")

        return expand(run(albedo_aa, power))

    @jax.custom_vjp
    def render(albedo, power):
        return forward_loop(albedo, power)

    def render_fwd(albedo, power):
        return forward_loop(albedo, power), (albedo, power)

    def render_bwd(res, g):
        albedo, power = res
        albedo_aa = albedo[perm]
        safe = jnp.where(albedo_aa > 1e-12, albedo_aa, 1.0)
        g_c = g[arena_pos]                 # exact transpose of expand()
        g_t = cotangent_t(g_c, total_c) if fused else jnp.zeros(
            (), jnp.float32
        )

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(repl, repl, repl, repl),
            out_specs=(repl, repl), check_vma=False,
        )
        def run(albedo_aa, power, g_c, g_t):
            ax = jax.lax.axis_index("photons")
            da_slots = jnp.zeros((N,), jnp.float32)
            d_power = jnp.zeros_like(power)
            for e, base_batch, n_batches, last_valid in schedule:
                ev = em_vec_scaled(e, power)

                def body(i, carry, ev=ev, base_batch=base_batch,
                         n_batches=n_batches, last_valid=last_valid):
                    da, dpe = carry
                    nv = local_n_valid(i, ax, n_batches, last_valid)
                    if fused:
                        if device_rng:
                            da_b, w_sum = trace_fold_wide_rng(
                                aa_c.fields, albedo_aa, ev, g_t,
                                local_seed(i, ax, base_batch), nv, cfg,
                                aa_c.group_counts, N, b_local, S,
                            )
                        else:
                            da_b, w_sum = trace_fold_wide(
                                aa_c.fields, albedo_aa, ev, g_t,
                                local_batch(i, ax, base_batch), nv, cfg,
                                aa_c.group_counts, N, S,
                            )
                        return da + da_b, dpe + w_sum
                    idx, col, ridx = trace_deposits_wide_diff(
                        aa_c.fields, albedo_aa, ev,
                        local_batch(i, ax, base_batch), nv, cfg,
                        aa_c.group_counts, S,
                    )
                    w = jnp.sum(g_c[idx] * col, axis=-1)
                    w3 = w.reshape(nb_local, D, S * LANES)
                    suf = jnp.cumsum(w3[:, ::-1, :], axis=1)[:, ::-1, :]
                    contrib = jnp.where(ridx >= 0, suf.reshape(-1), 0.0)
                    da = da + jax.ops.segment_sum(
                        contrib, jnp.clip(ridx, 0, N - 1), num_segments=N
                    )
                    return da, dpe + w.sum()

                da_slots, dpe = jax.lax.fori_loop(
                    0, n_batches, body, (da_slots, jnp.float32(0.0))
                )
                d_power = d_power.at[e].add(
                    jnp.where(power[e] != 0, dpe / power[e], 0.0)
                )
            # one tiny cotangent all-reduce per backward
            return (
                jax.lax.psum(da_slots, "photons"),
                jax.lax.psum(d_power, "photons"),
            )

        da_slots, d_power = run(albedo_aa, power, g_c, g_t)
        da_slots = jnp.where(albedo_aa > 1e-12, da_slots / safe, 0.0)
        d_albedo = jnp.zeros_like(albedo).at[perm].add(da_slots)
        return d_albedo, d_power

    render.defvjp(render_fwd, render_bwd)
    return jax.jit(render)


def make_autodiff_oracle(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
):
    """Plain-autodiff twin (scan-based, stores per-batch carries): the
    gradient ORACLE for the replay VJP. Memory-bound — small budgets only."""
    B = int(cfg.photons_per_batch)
    U = uniforms_per_photon(cfg.max_depth)
    schedule = _emitter_batches(np.asarray(emitters.counts), B)
    key = jax.random.PRNGKey(cfg.seed)

    def render(albedo, power):
        lm = jnp.zeros((num_texels, 3), jnp.float32)
        for e, base_batch, n_batches, last_valid in schedule:
            em = schedule_mod.emitter_slice(emitters, e)

            def step(lm, i, em=em, e=e, n_batches=n_batches,
                     last_valid=last_valid, base_batch=base_batch):
                k = jax.random.fold_in(key, base_batch + i)
                u = jax.random.uniform(k, (B, U), dtype=jnp.float32)
                nv = jnp.where(
                    i == n_batches - 1, jnp.int32(last_valid), jnp.int32(B)
                )
                return (
                    trace_batch(lm, rects, em, u, nv, cfg,
                                albedo=albedo, power=power[e]),
                    None,
                )

            lm, _ = jax.lax.scan(step, lm, jnp.arange(n_batches))
        return lm

    return render
