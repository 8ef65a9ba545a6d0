"""Checkpoint / resume for long photon renders.

The reference has no checkpointing — a run is minutes and restartable
(SURVEY.md §5); its closest artifact is the raw float lightmap dump
(rectangle.c:391-429, reproduced in io/tiles.save_tile_raw). At production
photon budgets (1e8/m^2, hours across hosts) resumability matters, and the
engine design makes it trivial: the only mutable state between photon
batches is the lightmap accumulator plus the (emitter, batch) cursor —
RNG is counter-based, so resuming from a cursor reproduces the exact same
photons the uninterrupted run would have traced.

Checkpoints are a single .npz with a config fingerprint; loading verifies
the fingerprint so a checkpoint can never silently resume a different
render.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import pathlib
from typing import Optional, Tuple

import numpy as np

from ..config import PhotonConfig


# Bumped whenever the fingerprint payload schema (not the render config)
# changes. A checkpoint from a different schema version can't be validated
# at all, so load() restarts gracefully instead of claiming the CONFIG
# changed when it was the code that did.
FINGERPRINT_VERSION = 2


def config_fingerprint(
    cfg: PhotonConfig, num_texels: int, counts, extra=()
) -> str:
    """`extra` captures anything else the RNG schedule depends on: engine
    name, device count (a sharded run keys draws per (batch, device)),
    batch size."""
    payload = json.dumps(
        {
            "cfg": dataclasses.asdict(cfg),
            "num_texels": int(num_texels),
            "counts": [int(c) for c in np.asarray(counts)],
            "extra": [str(x) for x in extra],
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save(
    path: str,
    lightmap: np.ndarray,
    emitter_index: int,
    batch_index: int,
    fingerprint: str,
) -> None:
    """Atomic checkpoint write (tmp + rename)."""
    p = pathlib.Path(path)
    tmp = p.with_suffix(".tmp.npz")
    np.savez_compressed(
        tmp,
        lightmap=np.asarray(lightmap, np.float32),
        emitter_index=np.int64(emitter_index),
        batch_index=np.int64(batch_index),
        fingerprint=np.frombuffer(
            fingerprint.encode("ascii"), dtype=np.uint8
        ),
        fp_version=np.int64(FINGERPRINT_VERSION),
    )
    os.replace(tmp, p)


def load(
    path: str, fingerprint: str
) -> Optional[Tuple[np.ndarray, int, int]]:
    """Returns (lightmap, emitter_index, batch_index) or None if absent.

    Raises ValueError on a same-version fingerprint mismatch (wrong
    scene/config/seed). A checkpoint written under a DIFFERENT fingerprint
    schema version cannot be validated at all — the run restarts from
    scratch with a warning instead of a misleading "config changed" error.
    """
    p = pathlib.Path(path)
    if not p.exists():
        return None
    with np.load(p) as z:
        version = int(z["fp_version"]) if "fp_version" in z else 1
        if version != FINGERPRINT_VERSION:
            from .progress import warn

            warn(
                f"checkpoint {path} was written by an incompatible engine "
                f"version (fingerprint schema v{version}, this build is "
                f"v{FINGERPRINT_VERSION}); restarting from scratch"
            )
            return None
        found = z["fingerprint"].tobytes().decode("ascii")
        if found != fingerprint:
            raise ValueError(
                f"checkpoint {path} was written for config {found}, "
                f"expected {fingerprint}"
            )
        return (
            z["lightmap"].astype(np.float32),
            int(z["emitter_index"]),
            int(z["batch_index"]),
        )
