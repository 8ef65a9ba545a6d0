#!/usr/bin/env python
"""On-chip physics gate: the PRODUCTION path vs the actual reference C engine.

Renders example.png with the exact production configuration the CLI
defaults to — wide AA Pallas megakernel, in-kernel counter-hash RNG,
int8 in-kernel splat (`inkernel_i8`) — at the budget of the reference
PHOTON_NATIVE dump (tests/fixtures/example_photon_native_spa300k.f32,
samplesPerArea=300000, srand(12345)) and applies the same
distribution-level gates as tests/test_physics_vs_reference.py: total
energy 2%, per-wall mean radiance, per-texel correlation > 0.98.

This closes the chain reference-C <-> XLA engine (CPU tests) <->
production kernel (this tool, real hardware). Prints one JSON line.

Usage: python tools/validate_production_vs_reference.py
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from flatmatch_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402

from flatmatch_tpu.config import PhotonConfig  # noqa: E402
from flatmatch_tpu.engines import photon_pallas_wide as wide  # noqa: E402
from flatmatch_tpu.ops.aa_scene import pack_aa  # noqa: E402
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects  # noqa: E402
from flatmatch_tpu.scene import geometry, image as im, layout  # noqa: E402
from flatmatch_tpu.scene.rectangle import num_tiles  # noqa: E402

f32 = np.float32
SPA = 300000.0
FIXTURE = REPO / "tests" / "fixtures" / "example_photon_native_spa300k.f32"


def main():
    img = im.load_layout("/root/reference/example.png")
    lay = layout.parse_layout(img, f32(1.0) / f32(30.0), 200.0)
    scene = geometry.Scene(lay)
    gold = np.fromfile(FIXTURE, dtype="<f4").reshape(scene.num_texels, 4)[:, :3]

    # the CLI production defaults (cli.py): wide engine, device RNG,
    # int8 in-kernel splat
    cfg = PhotonConfig(
        samples_per_area=SPA, photons_per_batch=1 << 17, seed=3,
        device_rng=True, splat="inkernel_i8",
    )
    rects = pack_rects(scene.walls)
    emitters = pack_emitters(scene, SPA, cfg.window_color, cfg.light_color)
    aa = pack_aa(scene.walls)
    ours = np.asarray(
        wide.render_photons(rects, emitters, scene.num_texels, cfg, aa,
                            sublanes=64)
    )

    energy_rel = abs(ours.sum() - gold.sum()) / gold.sum()
    corr = float(np.corrcoef(ours.ravel(), gold.ravel())[0, 1])
    worst, checked = 0.0, 0
    for i, r in enumerate(scene.walls):
        sl = slice(r.base, r.base + num_tiles(r))
        o, g = ours[sl].mean(), gold[sl].mean()
        if g > gold.sum() / scene.num_texels * 0.1:
            rtol = 0.12 if num_tiles(r) >= 64 else 0.25
            rel = abs(o - g) / g
            worst = max(worst, rel / rtol)
            checked += 1
    ok = bool(energy_rel < 0.02 and corr > 0.98 and worst < 1.0
              and checked >= 20)
    print(json.dumps({
        "config": "wide + device_rng + inkernel_i8 (CLI production defaults)",
        "photons": int(np.asarray(emitters.counts).sum()),
        "energy_rel_err": round(float(energy_rel), 5),
        "texel_corr": round(corr, 5),
        "walls_checked": checked,
        "worst_wall_rel_vs_tolerance": round(float(worst), 3),
        "pass": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
