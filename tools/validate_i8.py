#!/usr/bin/env python
"""On-chip physics gate for the int8 splat variants.

Renders example.png with the production wide engine at a moderate photon
budget under splat="fused" (bf16, the f32-grade baseline) and under each
int8 variant, then checks that the dithered 7-bit quantization stays at
MC-noise level: total energy, per-texel correlation, and relative error on
well-lit texels. Prints one JSON line per variant.

Usage: python tools/validate_i8.py [photons=2**24]
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from flatmatch_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from flatmatch_tpu.config import PhotonConfig  # noqa: E402
from flatmatch_tpu.engines import photon_pallas_wide  # noqa: E402
from flatmatch_tpu.ops.aa_scene import pack_aa  # noqa: E402
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects  # noqa: E402
from flatmatch_tpu.scene import geometry, image as im, layout  # noqa: E402

SCENE_PNG = pathlib.Path("/root/reference/example.png")
if not SCENE_PNG.exists():
    SCENE_PNG = REPO / "tests" / "fixtures" / "mini.png"


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 24)
    img = im.load_layout(str(SCENE_PNG))
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    scene = geometry.Scene(lay)
    probe = pack_emitters(scene, 1.0, (18, 18, 18), (16, 16, 18))
    spa = target / float(np.asarray(probe.area).sum())
    base = PhotonConfig(
        samples_per_area=spa, photons_per_batch=1 << 18, seed=0,
        device_rng=True, splat="fused",
    )
    rects = pack_rects(scene.walls)
    emitters = pack_emitters(scene, spa, base.window_color, base.light_color)
    aa = pack_aa(scene.walls)

    def run(cfg):
        return np.asarray(
            photon_pallas_wide.render_photons(
                rects, emitters, scene.num_texels, cfg, aa, sublanes=64
            )
        )

    ref = run(base)
    lit = ref.sum(1) > np.percentile(ref.sum(1), 60)  # well-lit texels
    for splat in ("fused_i8", "inkernel_i8"):
        out = run(dataclasses.replace(base, splat=splat))
        energy_rel = abs(out.sum() - ref.sum()) / ref.sum()
        corr = np.corrcoef(out.reshape(-1), ref.reshape(-1))[0, 1]
        denom = np.maximum(ref[lit], 1e-6)
        rel = np.abs(out[lit] - ref[lit]) / denom
        print(json.dumps({
            "splat": splat,
            "photons": target,
            "energy_rel_err": round(float(energy_rel), 6),
            "texel_corr": round(float(corr), 6),
            "lit_rel_err_mean": round(float(rel.mean()), 5),
            "lit_rel_err_p99": round(float(np.percentile(rel, 99)), 5),
            "pass": bool(
                energy_rel < 5e-3 and corr > 0.9995 and rel.mean() < 0.02
            ),
        }))


if __name__ == "__main__":
    main()
