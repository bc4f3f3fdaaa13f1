"""Multi-host runtime glue.

The reference's only scaling story is single-process DataParallel
(train_fibinet.py:69-70). The TPU-native story (SURVEY §5.8): every host runs
this same program; ``initialize()`` wires the JAX distributed runtime; the
mesh spans all hosts' devices; each host loads a disjoint shard of the split
(``TableData.shard``); and ``host_local_to_global`` assembles per-host numpy
batches into one global device array sharded over the ``data`` axis, so the
jitted train step is identical single-host and multi-host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Idempotent jax.distributed.initialize. Returns True when the
    distributed runtime is (now) initialized.

    Must run before any JAX computation (the check below deliberately does
    NOT touch the backend — ``jax.process_count()`` would initialize the
    local runtime and break a later multi-process init). With no explicit
    args, env-based auto-detection is attempted (TPU pod / SLURM / cloud
    environments export the coordination variables); a plain single-process
    environment is a clean no-op."""
    if jax.distributed.is_initialized():
        return True
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError):
        if coordinator_address is not None or num_processes is not None:
            raise  # an explicit request must not silently no-op
        return False  # bare call outside any cluster environment


def host_id() -> int:
    return jax.process_index()


def host_count() -> int:
    return jax.process_count()


def host_local_to_global(
    batch: dict[str, np.ndarray], mesh: Mesh, data_axis: str = "data",
    batch_dim: int = 0,
) -> dict[str, jax.Array]:
    """Per-host numpy batch (local rows) -> global arrays sharded P(data).

    Single-process: plain device_put. Multi-process: each host contributes
    its local rows; the logical global batch is the concatenation over hosts
    (jax.make_array_from_process_local_data handles placement).

    ``batch_dim`` names the row axis: 0 for plain batches, 1 for K-stacked
    dispatch chunks of shape (K, rows, ...) — the scan axis K stays
    unsharded, rows shard over ``data_axis``.
    """

    def _spec(v):
        spec = [None] * v.ndim
        spec[batch_dim] = data_axis
        return P(*spec)

    sharding_of = {k: NamedSharding(mesh, _spec(v)) for k, v in batch.items()}
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding_of[k]) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding_of[k], v)
        for k, v in batch.items()
    }
