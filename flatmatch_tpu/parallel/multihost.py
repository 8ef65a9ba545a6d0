"""Multi-host launch support.

The reference is strictly single-process/single-device (SURVEY.md §2
"Collective backend: none"). The TPU framework scales out with the JAX
distributed runtime: every host runs the same program, `initialize()` wires
the JAX coordination service (ICI within a slice, DCN across slices), and
the photon mesh then spans all global devices — no custom transport, no
NCCL/MPI analog needed because the replicated state is tiny and the only
collectives are the per-emitter lightmap/gradient psums
(parallel/mesh.py, diff/render.py).

Typical pod-slice launch (same command on every host):

    python -m flatmatch_tpu.cli render layout.png 30 --engine photon_pallas

with the cluster env (TPU_WORKER_HOSTNAMES etc.) set by the deployment; or
explicitly:

    from flatmatch_tpu.parallel import multihost
    multihost.initialize(coordinator="10.0.0.2:8476", num_processes=4,
                         process_id=int(os.environ["WORKER_ID"]))
"""
from __future__ import annotations

from typing import Optional

import jax

from ..utils.progress import info


_initialized = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize with auto-detection.

    With no arguments, relies on the TPU runtime's cluster auto-detection
    (GCE metadata / megascale env); explicit arguments cover bare-metal
    deployments.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    # NOTE: must run before ANY other jax call — even jax.process_count()
    # initializes the XLA backend and would make this raise.
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
        info(
            f"distributed runtime up: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.device_count()} global devices"
        )
    except RuntimeError as e:
        # already initialized (e.g. auto-init by the runtime) or single-host
        _initialized = True
        info(f"distributed init skipped ({e})")


def is_primary() -> bool:
    """True on the host that should write artifacts (tiles, JSONs)."""
    return jax.process_index() == 0
