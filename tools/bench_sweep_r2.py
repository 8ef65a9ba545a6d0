"""Sweep splat mode x device_rng x sublanes x batch on the real chip
(full-schedule render_photons on example.png, forced readback)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import numpy as np

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.engines import photon_pallas_wide
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
base = PhotonConfig(samples_per_area=spa, seed=0)
emitters = pack_emitters(scene, spa, base.window_color, base.light_color)
n_photons = int(np.asarray(emitters.counts).sum())
print(f"budget: {n_photons} photons", flush=True)

variants = [
    ("fused_rng_s64_b256k", "fused", True, 64, 1 << 18),
    ("fused_rng_s128_b256k", "fused", True, 128, 1 << 18),
    ("inkernel_rng_s128_b256k", "inkernel", True, 128, 1 << 18),
    ("fused_rng_s64_b512k", "fused", True, 64, 1 << 19),
    ("inkernel_rng_s64_b512k", "inkernel", True, 64, 1 << 19),
]
for name, splat, rng, s, b in variants:
    cfg = dataclasses.replace(
        base, splat=splat, device_rng=rng, photons_per_batch=b
    )
    try:
        t0 = time.perf_counter()
        lm = np.asarray(
            photon_pallas_wide.render_photons(
                rects, emitters, scene.num_texels, cfg, aa, sublanes=s
            )
        )
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        lm = np.asarray(
            photon_pallas_wide.render_photons(
                rects, emitters, scene.num_texels, cfg, aa, sublanes=s
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
