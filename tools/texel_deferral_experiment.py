"""Texel-address-deferral upper bound (round-5 measured dead end; the
numbers quoted in README's decomposition section).

The wide trace kernel's only deferrable per-rect work is texel
addressing (9 of ~31 VPU ops — everything else feeds the running
minimum). This tool times the `no_texel` kernel twin, which REMOVES
those 9 ops entirely (wrong results, valid timing): the measured gain is
the upper bound on what a real deferral could win, BEFORE paying back
the ~6 extra per-rect selects a deferral needs to carry the winner's
addressing scalars through the loop (they cannot be gathered per-lane
from SMEM after it).

Measured (v5e, 2026-08-20, 24 x 2^18-photon batches in-program,
production inkernel_i8 tier): baseline 39.3M photons/s, no-texel twin
41.9M = +6.6% (an earlier texel=fac variant that kept the btex select
measured +5.2%) — so a real deferral nets ~0 before the
register-pressure risk the chains=2 regression demonstrated. Dead end.
(The twin bins every deposit to texel 0 — a constant in-range id — so
it is safe on every splat tier while removing the address arithmetic.)

Run on a TPU host:  python tools/texel_deferral_experiment.py
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
from flatmatch_tpu.engines.photon_pallas import emitter_vector
from flatmatch_tpu.engines.schedule import emitter_slice
from flatmatch_tpu.ops.aa_scene import pack_aa
from flatmatch_tpu.ops.device_scene import pack_emitters
from flatmatch_tpu.scene import geometry, image as im, layout

img = im.load_layout("/root/reference/example.png")
lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
scene = geometry.Scene(lay)
aa = pack_aa(scene.walls)
aa_c, total_c, expand = W.compact_aa(aa, scene.num_texels)
gc = tuple(aa_c.group_counts)
B = 1 << 18
REPS = 24
cfg = PhotonConfig(
    samples_per_area=1.0, photons_per_batch=B, seed=0,
    splat="inkernel_i8", device_rng=True,
)
ems = pack_emitters(scene, 1.0, cfg.window_color, cfg.light_color)
ev = emitter_vector(emitter_slice(ems, 0))


def timed(no_texel):
    @jax.jit
    def run():
        def body(i, lm):
            return lm + W.trace_splat_wide_rng(
                aa_c.fields, ev, W.batch_seed(cfg.seed, i), jnp.int32(B),
                cfg, gc, total_c, B, 64, i8=True, no_texel=no_texel,
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
    return REPS * B / dt


base = timed(False)
nt = timed(True)
print(
    f"baseline {base / 1e6:.1f}M photons/s, no-texel-address twin "
    f"{nt / 1e6:.1f}M = {(nt / base - 1) * 100:+.1f}%"
)
