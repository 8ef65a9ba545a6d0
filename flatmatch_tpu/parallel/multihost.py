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

import os
from typing import Optional

import jax

from ..utils.progress import info


_initialized = False

# Env vars whose presence means "this process is part of a configured
# multi-host cluster" — jax.distributed auto-detection will use them.
_CLUSTER_ENV = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "CLOUD_TPU_TASK_ID",
)


def cluster_configured() -> bool:
    """True when the environment declares a MULTI-host cluster.

    A single-entry TPU_WORKER_HOSTNAMES (every single TPU-VM sets it) is
    not a cluster."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    return any(
        os.environ.get(k)
        for k in _CLUSTER_ENV
        if k != "TPU_WORKER_HOSTNAMES"
    )


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize.

    With no arguments: initializes only when the environment declares a
    cluster (TPU pod metadata / coordinator env vars) and otherwise runs
    single-host — the common case. With explicit arguments, or with a
    cluster environment present, a failed init is FATAL: a configured
    distributed job must never silently degrade to a single-host render
    with every host writing artifacts (the reference's analog is its
    fail-fast exit(0) on OpenCL errors, global_illumination_cl.c:227-242).
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator is not None or num_processes is not None
    if not explicit and not cluster_configured():
        _initialized = True
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
    except RuntimeError as e:
        msg = str(e).lower()
        if "already initialized" in msg or "only be called once" in msg:
            # auto-init by the runtime (or a second initialize() call
            # path). jax 0.9's double-init text is "distributed.initialize
            # should only be called once."; older versions said "already
            # initialized" — match both.
            _initialized = True
            info(f"distributed runtime already up ({e})")
            return
        if not explicit and "before any jax calls" in msg:
            # env-triggered auto-init attempted after JAX was already up
            # (e.g. library use inside a larger program): stay single-host
            from ..utils.progress import warn

            _initialized = True
            warn(f"distributed auto-init skipped: {e}")
            return
        raise RuntimeError(
            "jax.distributed.initialize failed for a configured cluster "
            f"(coordinator={coordinator!r}): {e}"
        ) from e
    _initialized = True
    info(
        f"distributed runtime up: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.device_count()} global devices"
    )


def is_primary() -> bool:
    """True on the host that should write artifacts (tiles, JSONs)."""
    return jax.process_index() == 0
