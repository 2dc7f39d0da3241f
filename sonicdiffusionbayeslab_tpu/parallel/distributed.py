"""Multi-host / multi-process helpers (SURVEY §2.3 communication backend).

One process per host, chips discovered via ``jax.distributed.initialize``
(ICI within a slice, DCN across slices — all transport belongs to XLA).
Metric states reduce with a host-level allreduce so validation numbers are
global (the reference declared torchmetrics ``dist_reduce_fx='sum'`` states
but never ran distributed — SURVEY §2.3).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize multi-process JAX when a cluster is configured; no-op (and
    False) for single-process runs, so entrypoints can call unconditionally."""
    coordinator = coordinator or os.environ.get("SDBL_COORDINATOR")
    if coordinator is None and num_processes is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def all_sum_scalar(x: float) -> float:
    """Sum a host scalar across processes (identity single-process)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    return float(multihost_utils.process_allgather(np.asarray(x)).sum())


def all_sum_array(x: np.ndarray) -> np.ndarray:
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x))).sum(axis=0)
