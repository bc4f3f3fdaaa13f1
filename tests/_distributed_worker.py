"""Worker for the real 2-process jax.distributed test (run as a subprocess).

Each process: init the distributed runtime -> shard the dataset by host
(``TableData.shard``) -> assemble its host-local batch into a global sharded
array (``host_local_to_global``) -> run one jitted global-mean computation
and one embedding-gradient step. Process 0 prints the results as JSON; the
parent test compares them against a single-process numpy reference.

Usage: python tests/_distributed_worker.py <coordinator> <num_procs> <pid>
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
# exactly ONE local device per process, whatever the parent env says
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from ctr_recommendation_tpu.parallel import distributed

    assert distributed.initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    assert distributed.host_id() == pid

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ctr_recommendation_tpu.data.parquet import TableData

    # deterministic dataset, identical in every process
    rng = np.random.default_rng(0)
    n, vocab, e = 64, 32, 8
    full = TableData(
        {
            "ids": rng.integers(0, vocab, size=(n,)).astype(np.int32),
            "y": rng.normal(size=(n,)).astype(np.float32),
        },
        n,
    )
    local = full.shard(pid, nprocs)
    assert local.num_rows == n // nprocs

    devices = np.asarray(jax.devices()).reshape(nprocs, 1)
    mesh = Mesh(devices, ("data", "model"))
    emb = jnp.asarray(rng.normal(size=(vocab, e)).astype(np.float32))
    emb = jax.device_put(emb, NamedSharding(mesh, P()))

    batch = distributed.host_local_to_global(dict(local.columns), mesh)

    @jax.jit
    def loss_and_grad(emb, ids, y):
        def loss_fn(emb):
            return jnp.mean(jnp.sum(emb[ids], axis=-1) * y)

        return jax.value_and_grad(loss_fn)(emb)

    loss, grad = loss_and_grad(emb, batch["ids"], batch["y"])
    gnorm = jnp.linalg.norm(grad.reshape(-1))
    if pid == 0:
        print(json.dumps({"loss": float(loss), "gnorm": float(gnorm)}), flush=True)


if __name__ == "__main__":
    main()
