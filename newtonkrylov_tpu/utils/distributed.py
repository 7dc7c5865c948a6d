"""Multi-host bring-up (the reference has no communication backend at all —
SURVEY.md §2/§5: its halo scaffold is single-process).

On TPU pods JAX needs one ``jax.distributed.initialize()`` per host before
any backend use; collectives then ride ICI within a slice and DCN across
hosts automatically — there is no transport code to write (the psum/ppermute
seams in spaces.py/halo.py are the whole story).  This module wraps the
bring-up with environment detection so the same entry point works on a
single chip, a CPU test mesh, and a pod slice.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize", "is_multihost", "host_summary"]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime if the environment calls for it.

    Explicit arguments win; otherwise TPU pod metadata / standard cluster
    env vars are auto-detected by ``jax.distributed.initialize``.  Returns
    True if a multi-process runtime was initialized, False for single-process
    environments (no-op, safe to call unconditionally at program start).
    """
    global _initialized
    if _initialized:
        return True
    explicit = coordinator_address is not None
    auto = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                  "TPU_WORKER_HOSTNAMES", "SLURM_JOB_NUM_NODES")
    )
    if not explicit and not auto:
        return False
    if os.environ.get("TPU_WORKER_HOSTNAMES") in ("localhost", None) and not explicit:
        # single-host TPU VM (incl. tunnel-attached dev chips): nothing to do
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        return True
    except Exception as e:  # pragma: no cover - depends on cluster env
        print(f"[distributed] initialize failed ({e}); continuing single-process")
        return False


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_summary() -> str:
    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
