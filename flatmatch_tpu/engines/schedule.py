"""Shared per-emitter photon dispatch schedule.

Every photon engine (XLA, wide Pallas, and their sharded variants) runs the
same outer schedule as the reference dispatch loop — every window emitter,
then every lamp (/root/reference/global_illumination_cl.c:304-308), each
with numSamples = samplesPerArea * area photons streamed in fixed-shape
batches. This module owns that loop once, including optional checkpoint /
resume: because the RNG is counter-based (threefry fold_in of the global
batch index), a resumed run traces exactly the photons the uninterrupted
run would have — bit-identical results (gated in tests/test_checkpoint.py).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..config import PhotonConfig
from ..ops.device_scene import EmittersDev
from .photon import EmitterSlice

# trace_seg(lightmap, em, base_batch, batch_offset, seg_len,
#           emitter_n_batches, last_batch_valid) -> lightmap
TraceSeg = Callable


def emitter_slice(emitters: EmittersDev, e: int) -> EmitterSlice:
    return EmitterSlice(
        pos=emitters.pos[e],
        wvec=emitters.wvec[e],
        hvec=emitters.hvec[e],
        n=emitters.n[e],
        color=emitters.color[e],
        is_window=emitters.is_window[e],
    )


def run_schedule(
    trace_seg: TraceSeg,
    emitters: EmittersDev,
    num_texels: int,
    cfg: PhotonConfig,
    batch_size: int,
    checkpoint_path: Optional[str] = None,
    every_batches: "int | None" = None,
    fingerprint_extra=(),
    write_checkpoints: bool = True,
    on_segment: Optional[Callable] = None,
):
    """Run the full emitter schedule, optionally checkpointed.

    `fingerprint_extra` distinguishes engines / mesh shapes whose RNG
    schedules differ (a wide-engine checkpoint must never resume an XLA
    render, nor an 8-device one a 4-device run). `write_checkpoints` is
    False on non-primary hosts: all hosts resume from the (shared-
    filesystem) checkpoint, only the primary writes it.

    `on_segment(lightmap, photons_done, photons_total)` fires after every
    completed segment — the incremental-result hook behind progressive
    tile previews (the TPU analog of the reference browser port posting
    each wall's lightmap as it completes, /root/reference/worker.js:43-60).
    Returns the raw (un-normalized) [num_texels, 3] lightmap.
    """
    import jax.numpy as jnp

    from ..utils import checkpoint as ckpt
    from ..utils.progress import info

    counts = np.asarray(emitters.counts)
    B = int(batch_size)
    if every_batches is None:
        every_batches = int(cfg.checkpoint_every)

    resume_e, resume_b = 0, 0
    lightmap = jnp.zeros((num_texels, 3), jnp.float32)
    fp = None
    if checkpoint_path is not None:
        fp = ckpt.config_fingerprint(
            cfg, num_texels, counts,
            extra=tuple(fingerprint_extra) + (B, every_batches),
        )
        state = ckpt.load(checkpoint_path, fp)
        if state is not None:
            arr, resume_e, resume_b = state
            lightmap = jnp.asarray(arr)
            info(
                f"resuming from {checkpoint_path}: emitter {resume_e}, "
                f"batch {resume_b}"
            )

    total_photons = int(counts.sum())
    base_batch = 0
    done_before = 0  # photons of fully completed PRIOR emitters
    for e in range(len(counts)):
        n = int(counts[e])
        if n == 0:
            continue
        n_batches = (n + B - 1) // B
        last_valid = n - (n_batches - 1) * B
        if e < resume_e:
            base_batch += n_batches
            done_before += n
            continue
        em = emitter_slice(emitters, e)
        start = resume_b if e == resume_e else 0
        # ALWAYS segment by every_batches, checkpointing or not: the sharded
        # engines psum once per segment, so identical segmentation is what
        # makes a checkpointed/resumed run bit-identical to a straight one
        step = every_batches
        for off in range(start, n_batches, max(step, 1)):
            seg = min(step, n_batches - off)
            lightmap = trace_seg(
                lightmap,
                em,
                jnp.int32(base_batch),
                jnp.int32(off),
                jnp.int32(seg),
                jnp.int32(n_batches),
                jnp.int32(last_valid),
            )
            if checkpoint_path is not None and write_checkpoints:
                nxt = off + seg
                cursor = (e, nxt) if nxt < n_batches else (e + 1, 0)
                ckpt.save(
                    checkpoint_path, np.asarray(lightmap), *cursor, fp
                )
            if checkpoint_path is not None:
                # fault injection (tests + chaos drills): hard-kill this
                # process after N checkpoint rounds, like a preempted host.
                # Counted on every process (the non-primary skips the write
                # but dies at the same point) so multi-process kills are
                # synchronized. The reference's failure story was
                # printf+exit (SURVEY.md §5); this makes ours testable.
                import os

                kill_after = os.environ.get(
                    "FLATMATCH_FAULT_EXIT_AFTER_CHECKPOINTS"
                )
                if kill_after is not None:
                    saves_done = getattr(run_schedule, "_fault_saves", 0) + 1
                    run_schedule._fault_saves = saves_done
                    if saves_done >= int(kill_after):
                        from ..utils.progress import warn

                        warn(
                            f"FAULT INJECTION: exiting after "
                            f"{saves_done} checkpoint rounds"
                        )
                        os._exit(17)
            if on_segment is not None:
                done = done_before + min((off + seg) * B, n)
                on_segment(lightmap, done, total_photons)
        base_batch += n_batches
        done_before += n
    return lightmap
