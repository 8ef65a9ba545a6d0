"""On-HARDWARE AO golden gate: run the deterministic AO Pallas engine on
the real chip against the reference-build f32 dumps (same tolerances as
tests/test_ao_parity.py uses on CPU). Catches Mosaic-vs-XLA numeric
regressions that interpret-mode tests cannot see (the bf16-MXU texel-id
corruption class, photon_pallas.py header note).

Run on a TPU host:  python tools/ao_hardware_gate.py
Last green (v5e, 2026-08-20 round 5, chunked AND fused variants): tiny
max_rel 2.4e-6 / fused 2.5e-6; mini mean_rel 1.2e-4, 1.98% of texels
>= 5e-4 both variants (knife-edge ties, see tests/test_ao_parity.py
audit note); example mean_rel 6.0e-6, 0.04% >= 5e-4 both variants."""
import sys

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from flatmatch_tpu.config import AoConfig
from flatmatch_tpu.engines import ao_pallas
from flatmatch_tpu.ops.aa_scene import pack_aa
from flatmatch_tpu.scene import geometry, image as im, layout

assert jax.default_backend() == "tpu", jax.default_backend()

for name in ("tiny", "mini", "example"):
    png = (
        "/root/reference/example.png" if name == "example"
        else f"/root/repo/tests/fixtures/{name}.png"
    )
    img = im.load_layout(png)
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    scene = geometry.Scene(lay)
    gold = np.fromfile(
        f"/root/repo/tests/fixtures/{name}_ao_texels.f32", dtype="<f4"
    ).reshape(scene.num_texels, 4)[:, :3]
    aa = pack_aa(scene.walls)
    ours = np.asarray(ao_pallas.render_ao(scene, aa, AoConfig()))
    level0 = scene.level0_mask()
    a, g = ours[level0], gold[level0]
    denom = np.maximum(np.abs(g), 1e-6)
    rel = np.abs(a - g) / denom
    frac_bad = float((rel.max(axis=1) >= 5e-4).mean())
    print(
        f"{name}: max_rel={rel.max():.2e} mean_rel={rel.mean():.2e} "
        f"frac_texels_rel>=5e-4: {frac_bad:.4f}"
    )
    assert rel.mean() < 2e-4, rel.mean()
    assert frac_bad <= 0.02, frac_bad

    # the FUSED variant (in-kernel ray synthesis — the production default
    # since round 5) against the same golden: same per-(ray, rect)
    # arithmetic, sum-over-k order differs by ulps
    ours_f = np.asarray(ao_pallas.render_ao_fused(scene, aa, AoConfig()))
    a = ours_f[level0]
    rel_f = np.abs(a - g) / denom
    frac_bad_f = float((rel_f.max(axis=1) >= 5e-4).mean())
    print(
        f"{name} fused: max_rel={rel_f.max():.2e} "
        f"mean_rel={rel_f.mean():.2e} "
        f"frac_texels_rel>=5e-4: {frac_bad_f:.4f}"
    )
    assert rel_f.mean() < 2e-4, rel_f.mean()
    assert frac_bad_f <= 0.02, frac_bad_f

# XLA AO engine on a flagship wall subset: regression gate for the
# default-precision-matmul intersector bug (f32 `@` = one bf16 MXU pass on
# TPU; it truncated ray origins and fabricated grazing hits — round 4).
# These walls have no knife-edge ties, so the gate is tight.
from flatmatch_tpu.config import AoConfig as _AoCfg
from flatmatch_tpu.engines import ao as ao_xla
from flatmatch_tpu.ops.device_scene import pack_rects
from flatmatch_tpu.scene.rectangle import num_tiles

img = im.load_layout("/root/reference/example.png")
lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
scene = geometry.Scene(lay)
gold = np.fromfile(
    "/root/repo/tests/fixtures/example_ao_texels.f32", dtype="<f4"
).reshape(scene.num_texels, 4)[:, :3]
sel = [147, 164, 38, 88, 154]
ours = ao_xla.render_ao(scene, pack_rects(scene.walls), _AoCfg(), sel)
for wi in sel:
    r = scene.walls[wi]
    sl = slice(r.base, r.base + num_tiles(r))
    rel = np.abs(ours[sl] - gold[sl]) / np.maximum(np.abs(gold[sl]), 1e-6)
    assert rel.max() < 1e-4, (wi, rel.max())
    print(f"XLA AO wall {wi}: max_rel={rel.max():.2e}")
print("AO on-hardware golden gate: OK")
