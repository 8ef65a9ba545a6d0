"""Sweep 2: chains under device_rng, and the trace/splat cost split."""
import sys
import time

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import numpy as np

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.engines import photon_pallas_wide as w
from flatmatch_tpu.ops.aa_scene import pack_aa
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.scene import geometry, image as im, layout

assert jax.default_backend() == "tpu", jax.default_backend()

img = im.load_layout("/root/reference/example.png")
lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
scene = geometry.Scene(lay)
rects = pack_rects(scene.walls)
aa = pack_aa(scene.walls)

TARGET = 1 << 26
probe = pack_emitters(scene, 1.0, (18, 18, 18), (16, 16, 18))
total_area = float(np.asarray(probe.area).sum())
spa = TARGET / total_area
base = PhotonConfig(
    samples_per_area=spa, seed=0, device_rng=True, photons_per_batch=1 << 18
)
emitters = pack_emitters(scene, spa, base.window_color, base.light_color)
n_photons = int(np.asarray(emitters.counts).sum())
print(f"budget: {n_photons} photons", flush=True)

# --- trace-only cost (rng, S=64): deposits stream to HBM, no splat -------
aa_c, total_c, expand = w.compact_aa(aa, scene.num_texels)
B = 1 << 18
ev = w.emitter_vector(
    __import__("flatmatch_tpu.engines.photon", fromlist=["EmitterSlice"])
    .EmitterSlice(
        pos=emitters.pos[0], wvec=emitters.wvec[0], hvec=emitters.hvec[0],
        n=emitters.n[0], color=emitters.color[0],
        is_window=emitters.is_window[0],
    )
)
for chains in (1, 2):
    f = jax.jit(
        lambda seed, chains=chains: w.trace_deposits_wide_rng(
            aa_c.fields, ev, seed, B, base, aa_c.group_counts, B,
            sublanes=64, chains=chains,
        )
    )
    idx, col = f(1)
    float(np.asarray(idx).sum())
    t0 = time.perf_counter()
    reps = 8
    for i in range(reps):
        idx, col = f(i + 2)
    s = float(np.asarray(idx).sum()) + float(np.asarray(col).sum())
    dt = (time.perf_counter() - t0) / reps
    print(
        f"trace-only rng s64 chains={chains}: {dt*1e3:.2f} ms/batch "
        f"({B/dt/1e6:.1f}M photons/s) [{s:.3g}]",
        flush=True,
    )

# --- full render with chains -------------------------------------------
for name, splat, chains in [
    ("fused_rng_s64_c2", "fused", 2),
    ("inkernel_rng_s64_c2", "inkernel", 2),
]:
    cfg = dataclasses.replace(base, splat=splat)
    try:
        t0 = time.perf_counter()
        lm = np.asarray(
            w.render_photons(
                rects, emitters, scene.num_texels, cfg, aa, sublanes=64,
                chains=chains,
            )
        )
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        lm = np.asarray(
            w.render_photons(
                rects, emitters, scene.num_texels, cfg, aa, sublanes=64,
                chains=chains,
            )
        )
        dt = time.perf_counter() - t0
        print(
            f"{name}: {n_photons/dt/1e6:.1f}M photons/s ({dt*1e3:.0f} ms; "
            f"first {tc:.0f}s) energy {lm.sum():.4g}",
            flush=True,
        )
    except Exception as e:
        print(f"{name}: FAILED {e!r}"[:300], flush=True)
