"""Photon-throughput scaling efficiency across the visible device mesh.

BASELINE.md north-star: >=85% scaling efficiency from 1 chip to >=2 hosts.
This harness measures photons/s on 1 device and on all N visible devices
with the production sharded wide engine and reports the ratio. On a
single-chip host it degenerates to N=1 (prints efficiency 1.0) — run it on
a pod slice (same command on every host, jax.distributed auto-init via
the cluster env) for the real number.

Off-TPU it exercises the same code path on the virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
which validates mechanism, not performance.

Usage: python tools/bench_scaling.py [photons_budget]
Prints one JSON line:
  {"metric": "scaling_efficiency", "value": E, "n_devices": N,
   "one_dev_photons_per_s": A, "all_dev_photons_per_s": B}
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import os

import jax

# honor an explicit CPU request even though the ambient sitecustomize has
# already baked the TPU platform into jax.config (conftest.py note)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from flatmatch_tpu.parallel import multihost

multihost.initialize()

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.ops.aa_scene import pack_aa
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.parallel.mesh import (
    photon_mesh, render_photons_sharded, render_photons_sharded_wide,
)
from flatmatch_tpu.scene import geometry, image as im, layout

ON_TPU = jax.default_backend() == "tpu"

# default budget is platform-aware: 67M photons saturate a chip in ~2 s,
# but would take hours on the CPU mechanism-validation path
BUDGET = int(sys.argv[1]) if len(sys.argv) > 1 else (
    (1 << 26) if ON_TPU else (1 << 19)
)

img = im.load_layout("/root/reference/example.png")
lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
scene = geometry.Scene(lay)
rects = pack_rects(scene.walls)
aa = pack_aa(scene.walls)
assert aa is not None

probe = pack_emitters(scene, 1.0, (18, 18, 18), (16, 16, 18))
spa = BUDGET / float(np.asarray(probe.area).sum())
cfg = PhotonConfig(
    samples_per_area=spa, photons_per_batch=1 << 18, seed=0, device_rng=True,
    # the CLI production default: in-kernel int8 splat (the sharded wide
    # path routes it straight through shard_map, parallel/mesh.py:171-176)
    splat="inkernel_i8",
)
emitters = pack_emitters(scene, spa, cfg.window_color, cfg.light_color)
n_photons = int(np.asarray(emitters.counts).sum())

devices = jax.devices()
N = len(devices)


def measure(mesh):
    def run():
        # wide Pallas engine on TPU; the sharded XLA engine elsewhere
        # (mechanism validation on the virtual CPU mesh)
        if ON_TPU:
            lm = render_photons_sharded_wide(
                rects, emitters, scene.num_texels, cfg, aa, mesh
            )
        else:
            lm = render_photons_sharded(
                rects, emitters, scene.num_texels, cfg, mesh
            )
        return float(np.asarray(lm).sum())

    run()  # warm/compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        e = run()
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(e) and e > 0
    return n_photons / best


one = measure(photon_mesh(devices[:1]))
full = one if N == 1 else measure(photon_mesh(devices))
eff = full / (one * N)

if multihost.is_primary():
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "n_devices": N,
                "one_dev_photons_per_s": round(one, 1),
                "all_dev_photons_per_s": round(full, 1),
                # virtual CPU devices share host cores: efficiency there
                # validates mechanism only, never report it as scaling
                "platform": jax.default_backend(),
            }
        )
    )
