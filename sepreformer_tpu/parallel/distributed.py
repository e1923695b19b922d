"""Multi-host runtime bring-up.

The reference has no multi-process story (single-process DataParallel
only, SURVEY §2.9).  On TPU pods: call ``initialize_distributed()`` once
per host before any jax op; afterwards ``jax.devices()`` spans the slice,
one ``Mesh`` covers all chips, the data loader shards keys by
``jax.process_index()``, and pjit reduces gradients over ICI/DCN.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("sepreformer_tpu")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when running multi-host.

    No-ops (returns False) for single-host runs: TPU pod environments are
    auto-detected by jax.distributed.initialize with no arguments; explicit
    coordinates may be passed for other launchers.  Safe to call twice.
    """
    import jax

    # NOTE: do NOT probe jax.process_count() here — it initializes the
    # local XLA backend, after which jax.distributed.initialize refuses
    # to run (bug found by tests/test_distributed_multiprocess.py)
    if jax.distributed.is_initialized():
        return True
    env_says_multihost = any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not env_says_multihost:
        # plain single-host: nothing to do
        if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in ("", "localhost"):
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "distributed runtime up: process %d/%d, %d devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )
        return True
    except Exception as e:
        log.warning("jax.distributed.initialize failed: %s", e)
        return False


def global_sum_scalars(values) -> list:
    """Sum host-local python scalars across all processes.

    Every host receives the identical result, so host-driven control flow
    (plateau LR, best-checkpoint selection — engine.run) stays in lockstep
    across the cluster.  Single-process runs return the inputs unchanged.
    """
    import jax

    vals = [float(v) for v in values]
    if jax.process_count() == 1:
        return vals
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(vals, np.float32))
    return [float(x) for x in np.asarray(gathered).sum(axis=0)]
