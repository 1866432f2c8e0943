"""Multi-host launch.

Replaces the reference's accelerate/submitit launchers (experiment.py:99-103,
165-173, 293-302): on TPU pods each host runs the same program and calls
`initialize_distributed()` once before building the mesh; `jax.devices()`
then spans the slice and the SPMD train step runs over ICI/DCN unchanged.
"""
from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address=None, num_processes=None, process_id=None
):
    """jax.distributed.initialize with env fallbacks; no-op when single-host
    or already initialized."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
        )
    except Exception as e:  # noqa: BLE001
        logger.warning(f"jax.distributed.initialize failed: {e}")


def is_main_process() -> bool:
    """Rank gating for host-side effects (training_loop.py:503, 635-637)."""
    return jax.process_index() == 0
