"""On-HARDWARE bench + gate for the fused trace+splat kernel
(cfg.splat='inkernel', photon_pallas_wide.trace_splat_wide*).

Compares the full-schedule render (render_photons, one device program)
across splat modes and sublane heights on example.png, and asserts the
in-kernel path agrees with the separate fused-splat path on identical
draws (same deposits, different f32 accumulation order).

Run on a TPU host:  timeout 3600 python tools/bench_inkernel.py
"""
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
BATCH = 1 << 18
probe = pack_emitters(scene, 1.0, (18, 18, 18), (16, 16, 18))
total_area = float(np.asarray(probe.area).sum())
spa = TARGET / total_area
base = PhotonConfig(samples_per_area=spa, photons_per_batch=BATCH, seed=0)
emitters = pack_emitters(scene, spa, base.window_color, base.light_color)
n_photons = int(np.asarray(emitters.counts).sum())
print(f"budget: {n_photons} photons, batch {BATCH}", flush=True)


def run(cfg, sublanes):
    return photon_pallas_wide.render_photons(
        rects, emitters, scene.num_texels, cfg, aa, sublanes=sublanes
    )


results = {}
variants = [
    ("fused_s64", base, 64),
    ("inkernel_s32", dataclasses.replace(base, splat="inkernel"), 32),
    ("inkernel_s64", dataclasses.replace(base, splat="inkernel"), 64),
    (
        "inkernel_rng_s64",
        dataclasses.replace(base, splat="inkernel", device_rng=True),
        64,
    ),
]
for name, cfg, s in variants:
    t0 = time.perf_counter()
    lm = np.asarray(run(cfg, s))  # compile + run
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    lm = np.asarray(run(cfg, s))
    dt = time.perf_counter() - t0
    rate = n_photons / dt
    results[name] = (rate, lm)
    print(
        f"{name}: {rate/1e6:.1f}M photons/s ({dt*1e3:.0f} ms; "
        f"first call {tc:.0f}s) energy {lm.sum():.1f}",
        flush=True,
    )

# gate: same draws -> same deposits; only f32 accumulation order differs
ref = results["fused_s64"][1]
for name in ("inkernel_s32", "inkernel_s64"):
    got = results[name][1]
    np.testing.assert_allclose(got.sum(), ref.sum(), rtol=1e-5)
    nz = np.abs(ref) > 1e-3
    rel = np.abs(got[nz] - ref[nz]) / np.abs(ref[nz])
    print(f"{name}: max_rel vs fused (bright texels) {rel.max():.2e}")
    assert rel.max() < 1e-2, rel.max()
# device-RNG stream differs: statistical agreement only
np.testing.assert_allclose(
    results["inkernel_rng_s64"][1].sum(), ref.sum(), rtol=0.01
)
print("inkernel on-hardware gate: OK")
