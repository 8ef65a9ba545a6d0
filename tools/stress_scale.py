"""Scene-scale stress axis (round-4 VERDICT weak #2 / next #2): measure
where the wide AA megakernel's capacity ends and how throughput scales
with rect count, on k x k tilings of the flagship scene (each tile is a
full copy of example.png's apartment: 172 walls, 114k texels — see
tests/fixtures/make_layout.tiled).

Per k: scene stats (N rects, texels, compact texels, the [F_AA, N] SMEM
scene block, the fused-splat VMEM accumulator), production-config wide
throughput (in-program best-of), and an on-chip wide-vs-XLA parity check
at shared threefry draws (energy + texel correlation; on hardware the
two decorrelate through transcendentals, so tolerances are statistical —
verify-skill note).

Run on a TPU host:  python tools/stress_scale.py [k ...]
"""
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.engines import photon, photon_pallas_wide
from flatmatch_tpu.ops.aa_scene import F_AA, pack_aa
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.scene import geometry, image as im, layout

sys.path.insert(0, "/root/repo/tests/fixtures")
from make_layout import tiled  # noqa: E402

KS = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
TARGET = 1 << 26            # production-throughput photon budget per k
PARITY = 1 << 20            # shared-draw parity budget per k


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


for k in KS:
    t0 = time.perf_counter()
    scene = build(k)
    parse_s = time.perf_counter() - t0
    aa = pack_aa(scene.walls)
    N = sum(aa.group_counts)
    aa_c, total_c, expand = photon_pallas_wide.compact_aa(
        aa, scene.num_texels
    )
    print(
        f"k={k}: N={N} texels={scene.num_texels} total_c={total_c} "
        f"SMEM_scene={F_AA * N * 4 / 1024:.1f}KB "
        f"fused_acc={total_c * 12 / 1e6:.2f}MB parse={parse_s:.1f}s",
        flush=True,
    )
    rects = pack_rects(scene.walls)

    # --- parity: shared threefry draws, exact splat tier, small budget ---
    probe = pack_emitters(scene, 1.0, (18, 18, 18), (16, 16, 18))
    area = float(np.asarray(probe.area).sum())
    cfg_p = PhotonConfig(
        samples_per_area=PARITY / area, photons_per_batch=1 << 15, seed=7,
        splat="scatter", device_rng=False,
    )
    ems_p = pack_emitters(
        scene, cfg_p.samples_per_area, cfg_p.window_color, cfg_p.light_color
    )
    try:
        lm_w = np.asarray(photon_pallas_wide.render_photons(
            rects, ems_p, scene.num_texels, cfg_p, aa
        ))
    except Exception as e:
        print(f"k={k}: WIDE ENGINE FAILED: {repr(e)[:300]}", flush=True)
        continue
    lm_x = np.asarray(photon.render_photons(
        rects, ems_p, scene.num_texels, cfg_p
    ))
    e_err = abs(lm_w.sum() - lm_x.sum()) / lm_x.sum()
    corr = np.corrcoef(lm_w.ravel(), lm_x.ravel())[0, 1]
    print(
        f"k={k}: parity vs XLA @ {int(np.asarray(ems_p.counts).sum())} "
        f"photons: energy_err={e_err:.2e} corr={corr:.6f}",
        flush=True,
    )

    # --- production throughput ---
    cfg = PhotonConfig(
        samples_per_area=TARGET / area, photons_per_batch=1 << 18, seed=0,
        splat="inkernel_i8", device_rng=True,
    )
    ems = pack_emitters(
        scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
    )
    n_photons = int(np.asarray(ems.counts).sum())

    def run():
        return photon_pallas_wide.render_photons(
            rects, ems, scene.num_texels, cfg, aa, sublanes=64
        )

    try:
        float(np.asarray(run()).sum())  # warm/compile
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            e = float(np.asarray(run()).sum())
            dt = min(dt, time.perf_counter() - t0)
            assert np.isfinite(e) and e > 0
        print(
            f"k={k}: wide production {n_photons / dt / 1e6:.1f}M photons/s "
            f"({n_photons} photons, {dt:.2f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"k={k}: WIDE PRODUCTION FAILED: {repr(e)[:300]}", flush=True)
