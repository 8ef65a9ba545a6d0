#!/usr/bin/env python
"""Device-time cost decomposition of the photon batch loop.

Captures a jax.profiler trace of a few production batches and sums
device-side event durations per kernel, so claims like "the splat is X%
of device time" are reproducible instead of hand-extracted. Parses the
Chrome-trace JSON the profiler writes (no TensorBoard needed).

Usage: python tools/profile_decomposition.py [splat=inkernel_i8] [batches=8]
Prints one JSON line: {"splat": ..., "device_ms_per_batch": ...,
"by_kernel": {name: ms_per_batch}, ...}
"""
import glob
import gzip
import json
import pathlib
import sys
import tempfile

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from flatmatch_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from flatmatch_tpu.config import PhotonConfig  # noqa: E402
from flatmatch_tpu.engines import photon_pallas_wide as wide  # noqa: E402
from flatmatch_tpu.ops.aa_scene import pack_aa  # noqa: E402
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects  # noqa: E402
from flatmatch_tpu.scene import geometry, image as im, layout  # noqa: E402

SCENE_PNG = pathlib.Path("/root/reference/example.png")
if not SCENE_PNG.exists():
    SCENE_PNG = REPO / "tests" / "fixtures" / "mini.png"


def _device_events(trace_dir):
    """All complete ('X') events from device-side tracks of the newest
    chrome trace under trace_dir, as (name, duration_us)."""
    paths = sorted(
        glob.glob(str(pathlib.Path(trace_dir) / "**" / "*.trace.json.gz"),
                  recursive=True)
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device events live on pids named "TPU ..."/"/device:..."; the trace
    # nests Modules > Ops > TraceMe as separate tids — keep only the
    # "XLA Ops" leaf thread so durations aren't double-counted
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e.get("pid"), e.get("tid"))] = (
                e.get("args", {}).get("name", "")
            )
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if not ("TPU" in pname or "device" in pname.lower()):
            continue
        tname = tid_name.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" in tname:
            out.append((e.get("name", "?"), float(e.get("dur", 0.0))))
    return out


def main():
    splat = sys.argv[1] if len(sys.argv) > 1 else "inkernel_i8"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B = 1 << 18
    img = im.load_layout(str(SCENE_PNG))
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    scene = geometry.Scene(lay)
    probe = pack_emitters(scene, 1.0, (18, 18, 18), (16, 16, 18))
    spa = (n_batches * B) / float(np.asarray(probe.area).sum())
    cfg = PhotonConfig(
        samples_per_area=spa, photons_per_batch=B, seed=0,
        device_rng=True, splat=splat,
    )
    rects = pack_rects(scene.walls)
    emitters = pack_emitters(scene, spa, cfg.window_color, cfg.light_color)
    n_photons = int(np.asarray(emitters.counts).sum())
    aa = pack_aa(scene.walls)

    def run():
        lm = wide.render_photons(
            rects, emitters, scene.num_texels, cfg, aa, sublanes=64
        )
        return float(np.asarray(lm).sum())

    run()  # compile
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            energy = run()
        evs = _device_events(td)
    assert np.isfinite(energy) and energy > 0

    # group: custom kernels by base name (strip per-instance suffixes);
    # everything else under "xla_other". The while/fusion wrappers NEST the
    # pallas kernels, so only leaf custom-call events count toward kernels
    # and the wrapper remainder is reported once.
    per_kernel, wrapper_us, other_us = {}, 0.0, 0.0
    for name, dur in evs:
        base = name.split(".")[0].split("(")[0]
        if base.startswith(("trace_", "fused_splat", "aa_nearest")):
            per_kernel[base] = per_kernel.get(base, 0.0) + dur
        elif base.startswith(("while", "jit_")):
            wrapper_us += dur
        else:
            other_us += dur
    batches = max(1, -(-n_photons // B))
    kern_us = sum(per_kernel.values())
    print(json.dumps({
        "splat": splat,
        "photons": n_photons,
        "batches": batches,
        "kernel_ms_per_batch": round(kern_us / 1e3 / batches, 3),
        "by_kernel_ms_per_batch": {
            k: round(v / 1e3 / batches, 3)
            for k, v in sorted(per_kernel.items(), key=lambda kv: -kv[1])
        },
        "xla_other_ms_per_batch": round(other_us / 1e3 / batches, 3),
        "wrapper_ms_total": round(wrapper_us / 1e3, 2),
    }))


if __name__ == "__main__":
    main()
