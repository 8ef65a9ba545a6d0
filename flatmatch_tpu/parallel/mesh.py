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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..config import PhotonConfig
from ..ops.device_scene import EmittersDev, RectsDev
from ..engines.photon import EmitterSlice, trace_batch, uniforms_per_photon


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
    n_batches,
    last_batch_valid,
    cfg: PhotonConfig,
    batch_size: int,
    mesh: Mesh,
):
    """One emitter's photon budget, sharded over the `photons` mesh axis.

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
            k = jax.random.fold_in(key, base_batch + i)
            k = jax.random.fold_in(k, ax)
            uniforms = jax.random.uniform(k, (b_local, U), dtype=jnp.float32)
            n_valid_global = jnp.where(
                i == n_batches - 1, last_batch_valid, jnp.int32(batch_size)
            )
            # photons [ax*b_local, (ax+1)*b_local) of the global batch
            n_valid_local = jnp.clip(
                n_valid_global - ax * b_local, 0, b_local
            ).astype(jnp.int32)
            return trace_batch(lm, rects, em, uniforms, n_valid_local, cfg)

        delta = jax.lax.fori_loop(0, n_batches, body, jnp.zeros_like(lightmap))
        # one collective per emitter: deterministic replacement for the
        # reference's racy shared accumulator (photonmap.cl:256-258)
        return lightmap + jax.lax.psum(delta, "photons")

    return shard_fn(lightmap, key)


def render_photons_sharded(
    rects: RectsDev,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    mesh: Mesh = None,
) -> jnp.ndarray:
    """Full photon pass sharded over all devices (windows then lights,
    global_illumination_cl.c:304-308)."""
    mesh = mesh or photon_mesh()
    lightmap = jnp.zeros((num_texels, 3), jnp.float32)
    key = jax.random.PRNGKey(cfg.seed)
    B = int(cfg.photons_per_batch)
    n_dev = mesh.shape["photons"]
    if B % n_dev:
        B = ((B + n_dev - 1) // n_dev) * n_dev
    counts = np.asarray(emitters.counts)
    base_batch = 0
    for e in range(len(counts)):
        n = int(counts[e])
        if n == 0:
            continue
        n_batches = (n + B - 1) // B
        last_valid = n - (n_batches - 1) * B
        em = EmitterSlice(
            pos=emitters.pos[e],
            wvec=emitters.wvec[e],
            hvec=emitters.hvec[e],
            n=emitters.n[e],
            color=emitters.color[e],
            is_window=emitters.is_window[e],
        )
        lightmap = _trace_emitter_sharded(
            lightmap,
            rects,
            em,
            key,
            jnp.int32(base_batch),
            jnp.int32(n_batches),
            jnp.int32(last_valid),
            cfg,
            B,
            mesh,
        )
        base_batch += n_batches
    return lightmap
