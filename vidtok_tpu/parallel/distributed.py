"""Multi-host initialization (the reference's torchrun/DDP launch
equivalent, main.py:884-902 + README.md:230-234).

On a multi-host TPU slice, call ``init_distributed()`` once per process
before creating the mesh; JAX discovers the slice topology from the TPU
runtime. ``make_mesh()`` then spans all global devices, parameters stay
replicated, the batch shards over 'data', and XLA routes gradient
all-reduces over ICI within a slice and DCN across slices automatically —
there is no NCCL-style backend code.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    No-ops (returns False) for single-process runs. Arguments default to the
    standard env (JAX discovers them on TPU pods automatically).
    """
    import jax

    env_np = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if env_np <= 1 and coordinator_address is None and (
            "COORDINATOR_ADDRESS" not in os.environ):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num_processes, process_id=process_id)
    return True


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> int:
    """Per-process batch size for a globally-sharded batch."""
    import jax

    assert global_batch % jax.process_count() == 0
    return global_batch // jax.process_count()
