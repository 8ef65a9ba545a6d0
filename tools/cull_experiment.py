"""Exact-culling measurement (round-4 VERDICT #3): can fewer-rects-per-ray
beat the 44.6M photons/s issue-bound floor?

The reference demonstrates exact culling twice (BSP, photonmap.c:302-374;
sorted candidates, radiosityNative.c:25-62) — both are per-RAY schemes on
a sequential CPU. On the wide TPU kernel every [S, 128] ray block executes
the same rect loop, so only a cull that removes a rect for ALL rays in a
block saves anything. The one block-uniform exact cull this engine admits
is at BOUNCE 0: a block's photons all start on one emitter's plane heading
into its front halfspace, so rects entirely behind that plane cannot be
the nearest hit at depth 0 (they CAN at depth >= 1 — a photon that escapes
through the window hole can strike another wing's exterior face, so the
cull is depth-0-only and its reachable win is bounded by
cull_fraction / max_depth <= 1/8 = 12.5%).

This tool puts numbers on both halves:
  1. the achievable cull fraction per scene (photon-weighted over
     emitters, host geometry only);
  2. the measured throughput delta from a timing twin: the kernel's
     d0_counts hook runs bounce 0 over only the first
     ceil((1-f) * count) rects of each axis group — same instruction
     mix/loop structure as a real per-emitter culled list, without the
     (tie-break-reordering) permutation plumbing.

Run on a TPU host:  python tools/cull_experiment.py [k ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.engines import photon_pallas_wide as W
from flatmatch_tpu.ops.aa_scene import pack_aa
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.scene import geometry, image as im, layout

sys.path.insert(0, "/root/repo/tests/fixtures")
import pathlib

from make_layout import tiled  # noqa: E402

KS = [int(a) for a in sys.argv[1:]] or [1, 3]
BATCH = 1 << 18
SUBLANES = 64
REPS = 24  # in-program batches per measurement (~2 s)


def build(k):
    if k == 1:
        png = "/root/reference/example.png"
    else:
        png = f"/tmp/stress_{k}x{k}.png"
        if not pathlib.Path(png).exists():
            tiled("/root/reference/example.png", png, k, k)
    img = im.load_layout(png)
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    return geometry.Scene(lay)


def cull_fraction(scene):
    """Photon-weighted fraction of walls ENTIRELY behind each emitter's
    plane (all four corners at signed distance <= 0) — the exact bounce-0
    cull a per-emitter candidate list could apply."""
    ems = scene.windows + scene.lights
    weights = []
    fracs = []
    for e in ems:
        n = np.asarray(e.n, np.float64)
        p0 = np.asarray(e.pos, np.float64)
        behind = 0
        for r in scene.walls:
            corners = [
                r.pos, r.pos + r.width, r.pos + r.height,
                r.pos + r.width + r.height,
            ]
            if all(float(np.dot(np.asarray(c, np.float64) - p0, n)) <= 1e-9
                   for c in corners):
                behind += 1
        from flatmatch_tpu.scene.rectangle import area_f32

        fracs.append(behind / len(scene.walls))
        weights.append(float(area_f32(e)))  # photons ∝ emitter area
    w = np.asarray(weights)
    f = np.asarray(fracs)
    return float((w * f).sum() / w.sum()), f.min(), f.max()


for k in KS:
    scene = build(k)
    aa = pack_aa(scene.walls)
    aa_c, total_c, expand = W.compact_aa(aa, scene.num_texels)
    f, fmin, fmax = cull_fraction(scene)
    print(
        f"k={k}: N={sum(aa.group_counts)} cull_fraction={f:.3f} "
        f"(per-emitter {fmin:.3f}..{fmax:.3f}) -> arithmetic upper bound "
        f"{f / 8 * 100:.1f}% at max_depth=8",
        flush=True,
    )

    cfg = PhotonConfig(
        samples_per_area=1.0, photons_per_batch=BATCH, seed=0,
        splat="inkernel_i8", device_rng=True,
    )
    ems = pack_emitters(scene, 1.0, cfg.window_color, cfg.light_color)
    from flatmatch_tpu.engines.photon_pallas import emitter_vector
    from flatmatch_tpu.engines.schedule import emitter_slice

    ev = emitter_vector(emitter_slice(ems, 0))
    gc = tuple(aa_c.group_counts)
    d0 = tuple(max(1, int(np.ceil((1.0 - f) * c))) for c in gc)

    def timed(d0_counts):
        @jax.jit
        def run():
            def body(i, lm):
                return lm + W.trace_splat_wide_rng(
                    aa_c.fields, ev, W.batch_seed(cfg.seed, i),
                    jnp.int32(BATCH), cfg, gc, total_c, BATCH, SUBLANES,
                    i8=True, d0_counts=d0_counts,
                )

            return jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((total_c, 3), jnp.float32)
            ).sum()

        float(np.asarray(run()))  # warm
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            e = float(np.asarray(run()))
            dt = min(dt, time.perf_counter() - t0)
            assert np.isfinite(e)
        return REPS * BATCH / dt

    base = timed(None)
    culled = timed(d0)
    print(
        f"k={k}: baseline {base / 1e6:.1f}M photons/s, d0-culled "
        f"({gc} -> {d0}) {culled / 1e6:.1f}M photons/s = "
        f"{(culled / base - 1) * 100:+.1f}%",
        flush=True,
    )
