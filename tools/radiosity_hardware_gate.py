"""On-HARDWARE production-budget radiosity gate: run the AA radiosity
engine on the real chip at the reference's FULL config (rays_per_texel=
10000, 7 iterations, reflectance 0.3 — radiosityNative.c:147,230,102)
against the unpatched reference build's texel dump on example.png
(tests/fixtures/example_radiosity_rays10000.f32, srand(12345)).

Distribution-level agreement (different RNGs): total energy, per-wall
means, per-texel correlation — the same standard as the CPU test
(tests/test_radiosity_vs_reference.py::
test_radiosity_production_budget_matches_reference), but exercising the
Pallas AA form-factor path + on-chip gather that production uses.

Run on a TPU host:  python tools/radiosity_hardware_gate.py
Last green (v5e, 2026-08-20): 45.3 s on chip, total-energy err 1.8e-4,
texel corr 0.999894, worst wall-mean rel err 9.8e-3 over 172 walls.
"""
import sys

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from flatmatch_tpu.config import RadiosityConfig
from flatmatch_tpu.engines import radiosity
from flatmatch_tpu.scene import geometry, image as im, layout
from flatmatch_tpu.scene.rectangle import num_tiles

assert jax.default_backend() == "tpu", jax.default_backend()

img = im.load_layout("/root/reference/example.png")
lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
scene = geometry.Scene(lay)
gold = np.fromfile(
    "/root/repo/tests/fixtures/example_radiosity_rays10000.f32", dtype="<f4"
).reshape(scene.num_texels, 4)[:, :3]

cfg = RadiosityConfig(rays_per_texel=10000, iterations=7, seed=5)
import time

t0 = time.perf_counter()
ours = radiosity.render_radiosity(scene, cfg)
dt = time.perf_counter() - t0

err_total = abs(ours.sum() - gold.sum()) / gold.sum()
corr = np.corrcoef(ours.ravel(), gold.ravel())[0, 1]
worst = 0.0
checked = 0
for i, r in enumerate(scene.walls):
    sl = slice(r.base, r.base + num_tiles(r))
    g = gold[sl].mean()
    if g > 1e-3:
        worst = max(worst, abs(ours[sl].mean() - g) / g)
        checked += 1
print(
    f"example @ rays=10000: {dt:.1f} s, total-energy err {err_total:.2e}, "
    f"texel corr {corr:.6f}, worst wall-mean rel err {worst:.2e} "
    f"over {checked} walls"
)
assert err_total < 0.01, err_total
assert corr > 0.995, corr
assert worst < 0.1, worst
print("OK")
