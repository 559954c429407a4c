"""Multi-host initialization.

Single-slice TPU training needs nothing (all chips visible to one process);
across hosts/slices, call ``initialize()`` before building the mesh — JAX
then exposes the global device set and the data-parallel step in
train/steps.py works unchanged (collectives ride ICI within a slice and DCN
across slices).  This replaces the reference's process-level cluster story
(Kaldi perl launchers, SURVEY.md §2.5) with actual gradient-parallel
multi-host training.
"""

import logging
import os


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or standard env vars.

    No-op when single-process (no coordinator configured).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "CRANK_TPU_COORDINATOR"
    )
    if coordinator_address is None and num_processes is None:
        # TPU pods auto-configure through the runtime; only initialize when
        # the runtime metadata is present
        if os.environ.get("TPU_WORKER_HOSTNAMES") and os.environ.get(
            "TPU_WORKER_ID"
        ):
            try:
                jax.distributed.initialize()
                logging.info(
                    "jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count(),
                )
            except Exception as e:  # pragma: no cover
                logging.info("jax.distributed auto-init skipped: %s", e)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logging.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(), jax.process_count(),
    )
