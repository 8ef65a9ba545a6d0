"""Multi-chip photon data parallelism.

The reference's only parallelism is photon-level DP on one OpenCL device
(/root/reference/photonmap.cl:269-281, global_illumination_cl.c:246-267;
SURVEY.md §2 "Parallelism & communication"). The TPU-native equivalent:

  - a 1-D `photons` mesh axis over all chips (ICI within a slice, DCN across
    hosts — the JAX runtime picks the transport, no custom backend)
  - the scene SoA and the lightmap arena are REPLICATED (they are tiny:
    O(100) rects, O(1e5-1e6) texels)
  - each chip traces its slice of every photon batch with a decorrelated
    threefry key and splats into a shard-local accumulator
  - shard accumulators are combined with one `jax.lax.psum` per emitter —
    replacing the reference's single shared racy buffer with a deterministic
    collective reduction

Results are bit-deterministic for a fixed (seed, device count).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..config import PhotonConfig
from ..ops.aa_scene import AARectsDev
from ..ops.device_scene import EmittersDev, RectsDev
from ..engines.photon import EmitterSlice, trace_batch, uniforms_per_photon

LANES = 128


def photon_mesh(devices=None) -> Mesh:
    """1-D device mesh over the photon axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("photons",))


@functools.partial(
    jax.jit, static_argnames=("cfg", "batch_size", "mesh")
)
def _trace_emitter_sharded(
    lightmap,
    rects: RectsDev,
    em: EmitterSlice,
    key,
    base_batch,
    batch_offset,
    seg_len,
    emitter_n_batches,
    last_batch_valid,
    cfg: PhotonConfig,
    batch_size: int,
    mesh: Mesh,
):
    """Batches [batch_offset, batch_offset+seg_len) of one emitter's photon
    budget, sharded over the `photons` mesh axis.

    `batch_size` is the GLOBAL batch; each chip traces batch_size/n_dev.
    """
    n_dev = mesh.shape["photons"]
    assert batch_size % n_dev == 0, "photons_per_batch must divide the mesh"
    b_local = batch_size // n_dev
    U = uniforms_per_photon(cfg.max_depth)

    replicated = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(replicated,) * 2,
        out_specs=replicated,
        check_vma=False,
    )
    def shard_fn(lightmap, key):
        ax = jax.lax.axis_index("photons")

        def body(i, lm):
            abs_i = batch_offset + i
            k = jax.random.fold_in(key, base_batch + abs_i)
            k = jax.random.fold_in(k, ax)
            uniforms = jax.random.uniform(k, (b_local, U), dtype=jnp.float32)
            n_valid_global = jnp.where(
                abs_i == emitter_n_batches - 1,
                last_batch_valid,
                jnp.int32(batch_size),
            )
            # photons [ax*b_local, (ax+1)*b_local) of the global batch
            n_valid_local = jnp.clip(
                n_valid_global - ax * b_local, 0, b_local
            ).astype(jnp.int32)
            return trace_batch(lm, rects, em, uniforms, n_valid_local, cfg)

        delta = jax.lax.fori_loop(0, seg_len, body, jnp.zeros_like(lightmap))
        # one collective per emitter segment: deterministic replacement for
        # the reference's racy shared accumulator (photonmap.cl:256-258)
        return lightmap + jax.lax.psum(delta, "photons")

    return shard_fn(lightmap, key)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "batch_size", "group_counts", "sublanes", "mesh"),
)
def _trace_emitter_sharded_wide(
    lightmap,
    aa_fields,
    em_vec,
    key,
    base_batch,
    batch_offset,
    seg_len,
    emitter_n_batches,
    last_batch_valid,
    cfg: PhotonConfig,
    batch_size: int,
    group_counts,
    sublanes: int,
    mesh: Mesh,
):
    """Batches [batch_offset, batch_offset+seg_len) of one emitter's budget
    on the wide AA Pallas kernel, sharded over the `photons` mesh axis.
    Same (batch, device) threefry keying as the sharded XLA path, so both
    sharded engines trace identical photons."""
    n_dev = mesh.shape["photons"]
    assert batch_size % n_dev == 0
    b_local = batch_size // n_dev
    U = uniforms_per_photon(cfg.max_depth)

    from ..engines.photon_pallas_wide import _splat, trace_deposits_wide

    replicated = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(replicated,) * 3,
        out_specs=replicated,
        check_vma=False,
    )
    def shard_fn(lightmap, aa_fields, key):
        ax = jax.lax.axis_index("photons")

        def body(i, lm):
            abs_i = batch_offset + i
            n_valid_global = jnp.where(
                abs_i == emitter_n_batches - 1,
                last_batch_valid,
                jnp.int32(batch_size),
            )
            n_valid_local = jnp.clip(
                n_valid_global - ax * b_local, 0, b_local
            ).astype(jnp.int32)
            if cfg.device_rng:
                from ..engines.photon_pallas_wide import (
                    batch_seed, device_seed, trace_deposits_wide_rng,
                    trace_splat_wide_rng,
                )

                # avalanche-mixed per-device seed: an additive offset would
                # cancel against the kernel's rgid*C counter term and make
                # the device streams shifted copies (see device_seed)
                seed = device_seed(batch_seed(cfg.seed, base_batch + abs_i), ax)
                if cfg.splat in ("inkernel", "inkernel_i8"):
                    return lm + trace_splat_wide_rng(
                        aa_fields, em_vec, seed, n_valid_local, cfg,
                        group_counts, lm.shape[0], b_local, sublanes,
                        i8=(cfg.splat == "inkernel_i8"),
                    )
                idx, col = trace_deposits_wide_rng(
                    aa_fields, em_vec, seed, n_valid_local, cfg,
                    group_counts, b_local, sublanes,
                )
            elif cfg.splat in ("inkernel", "inkernel_i8"):
                from ..engines.photon_pallas_wide import trace_splat_wide

                k = jax.random.fold_in(key, base_batch + abs_i)
                k = jax.random.fold_in(k, ax)
                uniforms = jax.random.uniform(
                    k, (b_local, U), dtype=jnp.float32
                )
                return lm + trace_splat_wide(
                    aa_fields, em_vec, uniforms, n_valid_local, cfg,
                    group_counts, lm.shape[0], sublanes,
                    i8=(cfg.splat == "inkernel_i8"),
                )
            else:
                k = jax.random.fold_in(key, base_batch + abs_i)
                k = jax.random.fold_in(k, ax)
                uniforms = jax.random.uniform(
                    k, (b_local, U), dtype=jnp.float32
                )
                idx, col = trace_deposits_wide(
                    aa_fields, em_vec, uniforms, n_valid_local, cfg,
                    group_counts, sublanes,
                )
            return _splat(lm, idx, col, cfg)

        delta = jax.lax.fori_loop(0, seg_len, body, jnp.zeros_like(lightmap))
        return lightmap + jax.lax.psum(delta, "photons")

    return shard_fn(lightmap, aa_fields, key)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "batch_size", "group_counts", "sublanes",
                     "schedule", "total_c", "mesh"),
)
def _render_all_sharded_wide(
    aa_fields, emitters: EmittersDev, key, cfg: PhotonConfig,
    batch_size: int, group_counts, sublanes: int, schedule, total_c: int,
    mesh: Mesh,
):
    """The WHOLE emitter schedule as ONE sharded device program — the
    shard_map analog of photon_pallas_wide._render_all_wide.

    The per-segment path (_trace_emitter_sharded_wide via run_schedule)
    pays a host dispatch plus a psum per segment; at bench budgets that
    cost the sharded single-chip datum ~40% vs the non-sharded program
    (SCALING_r04 note2). Here every device runs its local slice of every
    batch of every emitter inside one program and ONE psum combines the
    local lightmaps at the end. Same (seed, batch, device) keying as the
    segmented path; device-RNG tail batches launch on the production
    shrunk grid (masked photons deposit exact +0.0, so per-device partial
    sums are bit-identical to the full-grid ones — only the psum
    SEGMENTATION differs from the checkpointed path, which psums per
    segment; with one device the two paths are bit-identical)."""
    from ..engines.photon_pallas import emitter_vector
    from ..engines.photon_pallas_wide import (
        _splat, batch_seed, device_seed, trace_deposits_wide,
        trace_deposits_wide_rng, trace_splat_wide, trace_splat_wide_rng,
    )
    from ..engines.schedule import emitter_slice

    n_dev = mesh.shape["photons"]
    b_local = batch_size // n_dev
    TB = sublanes * LANES
    U = uniforms_per_photon(cfg.max_depth)
    repl = P()

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(repl, repl), out_specs=repl,
        check_vma=False,
    )
    def run(aa_fields, key):
        ax = jax.lax.axis_index("photons")
        lm = jnp.zeros((total_c, 3), jnp.float32)

        def one_batch(lm, ev, abs_i, nv_global, bsz):
            nv_local = jnp.clip(
                nv_global - ax * b_local, 0, b_local
            ).astype(jnp.int32)
            if cfg.device_rng:
                seed = device_seed(batch_seed(cfg.seed, abs_i), ax)
                if cfg.splat in ("inkernel", "inkernel_i8"):
                    return lm + trace_splat_wide_rng(
                        aa_fields, ev, seed, nv_local, cfg, group_counts,
                        total_c, bsz, sublanes,
                        i8=(cfg.splat == "inkernel_i8"),
                    )
                idx, col = trace_deposits_wide_rng(
                    aa_fields, ev, seed, nv_local, cfg, group_counts,
                    bsz, sublanes,
                )
                return _splat(lm, idx, col, cfg)
            k = jax.random.fold_in(key, abs_i)
            k = jax.random.fold_in(k, ax)
            u = jax.random.uniform(k, (b_local, U), dtype=jnp.float32)
            if cfg.splat in ("inkernel", "inkernel_i8"):
                return lm + trace_splat_wide(
                    aa_fields, ev, u, nv_local, cfg, group_counts,
                    total_c, sublanes, i8=(cfg.splat == "inkernel_i8"),
                )
            idx, col = trace_deposits_wide(
                aa_fields, ev, u, nv_local, cfg, group_counts, sublanes,
            )
            return _splat(lm, idx, col, cfg)

        for e, base_batch, n_batches, last_valid in schedule:
            ev = emitter_vector(emitter_slice(emitters, e))

            def body(i, lm, ev=ev, base_batch=base_batch):
                return one_batch(
                    lm, ev, base_batch + i, jnp.int32(batch_size), b_local
                )

            lm = jax.lax.fori_loop(0, n_batches - 1, body, lm)
            # tail: the largest LOCAL valid count over devices is device
            # 0's min(b_local, last_valid); shrink the local grid to the
            # covering power-of-two block count (device-RNG only — the
            # threefry path's uniforms shape feeds the draws)
            b_tail = b_local
            lv_loc = min(b_local, last_valid)
            if cfg.device_rng and lv_loc < b_local:
                blocks = -(-lv_loc // TB)
                p2 = 1
                while p2 < blocks:
                    p2 *= 2
                b_tail = min(b_local, p2 * TB)
            lm = one_batch(
                lm, ev, base_batch + n_batches - 1,
                jnp.int32(last_valid), b_tail,
            )
        return jax.lax.psum(lm, "photons")

    return run(aa_fields, key)


def render_photons_sharded_wide(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    aa: AARectsDev,
    mesh: Mesh = None,
    sublanes: int = None,
    checkpoint_path: str = None,
    every_batches: "int | None" = None,
    on_segment=None,
) -> jnp.ndarray:
    """Full photon pass on the wide AA engine, sharded over all devices.

    The production multi-chip path: the per-emitter dispatch schedule of the
    reference (global_illumination_cl.c:304-308) with each global batch split
    across the mesh and psum-reduced per emitter. Checkpoints (shared
    filesystem required multi-host: all hosts load, the primary writes) are
    fingerprinted with the device count — a resumed run must use the same
    mesh shape, since draws are keyed per (batch, device)."""
    from ..engines.photon_pallas import emitter_vector
    from ..engines.schedule import run_schedule
    from . import multihost

    from ..engines.photon_pallas_wide import compact_aa

    mesh = mesh or photon_mesh()
    n_dev = mesh.shape["photons"]
    B = int(cfg.photons_per_batch)
    quantum = n_dev * LANES
    if B % quantum:
        B = ((B + quantum - 1) // quantum) * quantum
    b_local = B // n_dev
    if sublanes is None:
        sublanes = 64
    while sublanes > 1 and b_local % (sublanes * LANES):
        sublanes //= 2

    key = jax.random.PRNGKey(cfg.seed)
    aa_c, total_c, expand = compact_aa(aa, num_texels)
    # each shard holds the FULL replicated accumulator, so the fused-splat
    # VMEM ceiling applies per chip exactly as single-chip
    from ..engines.photon_pallas_wide import maybe_degrade_splat

    cfg = maybe_degrade_splat(cfg, total_c)

    if checkpoint_path is None and on_segment is None:
        # fast path: the whole schedule as one sharded program, one psum
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
        compact_lm = _render_all_sharded_wide(
            aa_c.fields, emitters, key, cfg, B, aa_c.group_counts,
            sublanes, tuple(schedule), total_c, mesh,
        )
        return expand(compact_lm)

    def trace_seg(lm, em, base_batch, off, seg, n_batches, last_valid):
        return _trace_emitter_sharded_wide(
            lm, aa_c.fields, emitter_vector(em), key, base_batch, off, seg,
            n_batches, last_valid, cfg, B, aa_c.group_counts, sublanes,
            mesh,
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
        fingerprint_extra=("wide-sharded", "compact", n_dev),
        write_checkpoints=multihost.is_primary(),
        on_segment=seg_cb,
    )
    return expand(compact_lm)


def render_ao_fused_sharded(
    scene,
    aa,
    cfg,
    mesh: Mesh = None,
    sublanes: int = 64,
    unroll: "int | None" = None,
):
    """The fused-expansion AO pass (engines/ao_pallas.render_ao_fused —
    the single-chip production default since round 5, 1.42B vs 860M
    texel-rays/s) sharded over the `photons` mesh axis.

    Like render_ao_sharded, AO is texel-parallel with ZERO collectives:
    the fused prep's per-wall texel BLOCKS (S_T sublanes each) divide
    across devices — each device runs the fused kernel over its block
    slice against the replicated scene + per-wall direction tables, and
    the hosts gather the concatenated block sums. Block padding replays
    each wall's first texel (valid rays, discarded by the gather-back),
    and device padding replays block 0, so every lane traces real
    geometry."""
    import numpy as np

    from ..engines.ao_pallas import (
        _ao_fused, _ao_fused_prep, ao_fused_write_back,
    )

    mesh = mesh or photon_mesh()
    n_dev = mesh.shape["photons"]

    (wall_ids, centers8, dirs3, facrow, S_T, n_kblocks, gather_idx,
     norm) = _ao_fused_prep(scene, cfg, sublanes)
    n_blocks = int(wall_ids.shape[0])
    rows = n_blocks * S_T

    # pad the BLOCK axis to a device multiple by replaying block 0
    blocks_pad = (n_blocks + n_dev - 1) // n_dev * n_dev
    if blocks_pad != n_blocks:
        import jax.numpy as _jnp

        extra = blocks_pad - n_blocks
        wall_ids = _jnp.concatenate(
            [wall_ids, _jnp.broadcast_to(wall_ids[0:1], (extra,))]
        )
        centers8 = _jnp.concatenate(
            [centers8, _jnp.tile(centers8[0:S_T], (extra, 1))]
        )

    gc = tuple(aa.group_counts)
    sky = float(cfg.sky_distance)
    sharded = P("photons")
    repl = P()

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(sharded, sharded, repl, repl, repl),
        out_specs=sharded,
        check_vma=False,
    )
    def run(w_loc, c_loc, fields, dirt, fac):
        return _ao_fused(
            fields, w_loc, c_loc, dirt, fac, gc, S_T, n_kblocks, sky,
            unroll,
        )

    sums = np.asarray(
        run(wall_ids, centers8, aa.fields, dirs3, facrow)
    )[:rows]
    return ao_fused_write_back(scene, sums, gather_idx, norm)


def render_ao_sharded(
    scene,
    aa,
    cfg,
    mesh: Mesh = None,
    rays_per_call: int = 1 << 21,
):
    """Ambient occlusion sharded over the `photons` mesh axis.

    AO is deterministic and texel-parallel (photonmap.c:436-491: every
    texel's 481 rays are independent), so each device evaluates a disjoint
    slice of every texel chunk — no collectives at all. Deterministic;
    matches the single-device Pallas engine to float tolerance (the
    zero-weight ray padding below changes the reduction tree, nothing
    else)."""
    import numpy as np

    from ..engines.ao import tile_centers, wall_directions
    from ..engines.ao_pallas import LANES as AOLANES
    from ..ops.geosphere import geosphere
    from ..scene.rectangle import num_tiles

    f32 = np.float32
    mesh = mesh or photon_mesh()
    n_dev = mesh.shape["photons"]

    vs = geosphere(cfg.geosphere_level)
    K = len(vs)
    # pad the ray table to a power of two with ZERO-WEIGHT copies of ray 0
    # (fac=0 drops them from both sums): (C*K_pad) % 1024 == 0 then needs
    # only C % (1024/gcd) — tiny per-device chunks instead of 1024-texel
    # quanta, so small scenes don't trace 4x padding
    K_pad = 1 << int(np.ceil(np.log2(K)))
    fac = np.zeros(K_pad, f32)
    fac[:K] = vs[:, 2].astype(f32)
    fac = jnp.asarray(fac)

    centers = np.concatenate([tile_centers(w) for w in scene.walls])
    wall_of_texel = np.concatenate(
        [np.full(num_tiles(w), i, np.int32)
         for i, w in enumerate(scene.walls)]
    )

    def padded_dirs(n):
        d = wall_directions(n, cfg.geosphere_level)
        return np.concatenate(
            [d, np.broadcast_to(d[0:1], (K_pad - K, 3))]
        ).astype(f32)

    dir_tables = jnp.asarray(
        np.stack([padded_dirs(w.n) for w in scene.walls])
    )
    centers_dev = jnp.asarray(centers)
    wall_dev = jnp.asarray(wall_of_texel)

    T0 = len(centers)
    texels = np.zeros((scene.num_texels, 3), f32)

    # ONE device program for the whole pass (python-level chunk loops pay
    # dispatch + readback latency per call): the padded texel axis divides
    # across devices, each device fori-loops its local chunks. Sublane
    # count and local chunk must satisfy (chunk * K_pad) % (S*128) == 0.
    from ..engines.ao_pallas import _ao_all

    S = 64 if (T0 // n_dev) * K_pad >= (1 << 22) else 8
    TB = S * AOLANES
    c_quantum = max(1, TB // math.gcd(K_pad, TB))
    chunk = max(AOLANES, rays_per_call // K_pad)
    chunk = max(c_quantum, (chunk // c_quantum) * c_quantum)
    t_loc_rounded = (
        (T0 + c_quantum * n_dev - 1) // (c_quantum * n_dev) * c_quantum
    )
    chunk = min(chunk, t_loc_rounded)
    n_chunks = (t_loc_rounded + chunk - 1) // chunk
    t_loc = n_chunks * chunk
    idxs = np.arange(t_loc * n_dev) % T0  # wrap-pad
    K = K_pad

    sharded = P("photons")
    repl = P()

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(sharded, sharded, repl, repl, repl),
        out_specs=sharded,
        check_vma=False,
    )
    def all_fn(c, w, fields, dirt, fac):
        return _ao_all(
            fields, c, w, dirt, fac, aa.group_counts, K, chunk, n_chunks,
            float(cfg.sky_distance), float(cfg.normalization), S,
        )

    vals = np.asarray(
        all_fn(
            centers_dev[jnp.asarray(idxs)], wall_dev[jnp.asarray(idxs)],
            aa.fields, dir_tables, fac,
        )
    )[:T0]

    t = 0
    for wall in scene.walls:
        n = num_tiles(wall)
        texels[wall.base : wall.base + n] = vals[t : t + n, None]
        t += n
    return texels


def render_photons_sharded(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    mesh: Mesh = None,
    checkpoint_path: str = None,
    every_batches: "int | None" = None,
    on_segment=None,
) -> jnp.ndarray:
    """Full photon pass sharded over all devices (windows then lights,
    global_illumination_cl.c:304-308)."""
    from ..engines.schedule import run_schedule
    from . import multihost

    mesh = mesh or photon_mesh()
    key = jax.random.PRNGKey(cfg.seed)
    B = int(cfg.photons_per_batch)
    n_dev = mesh.shape["photons"]
    if B % n_dev:
        B = ((B + n_dev - 1) // n_dev) * n_dev

    def trace_seg(lm, em, base_batch, off, seg, n_batches, last_valid):
        return _trace_emitter_sharded(
            lm, rects, em, key, base_batch, off, seg, n_batches,
            last_valid, cfg, B, mesh,
        )

    return run_schedule(
        trace_seg,
        emitters,
        num_texels,
        cfg,
        B,
        checkpoint_path=checkpoint_path,
        every_batches=every_batches,
        fingerprint_extra=("xla-sharded", n_dev),
        write_checkpoints=multihost.is_primary(),
        on_segment=on_segment,
    )
