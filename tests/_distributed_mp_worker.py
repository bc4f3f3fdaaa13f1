"""Worker: dp=2 x mp=2 Trainer step across 2 real processes, 2 devices EACH.

VERDICT r2 item 7: the round-2 two-process tests ran 1 device per process,
so the model axis never crossed a process boundary. Here the mesh is laid
out so each model-parallel pair is (process-0 device i, process-1 device i)
— the shard_map all-to-all embedding lookup's id/row exchange actually
crosses processes. The parent test asserts the step's loss and updated
table norm equal a single-process single-device Trainer on the same batch.

Usage: python tests/_distributed_mp_worker.py <coordinator> <nprocs> <pid>
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# NB: this import sets XLA_FLAGS to 1 device/process for its own use — the
# jax_num_cpu_devices config below (set AFTER the import, before backend
# init) is what actually gives this worker its 2 local devices.
from tests._distributed_trainer_worker import full_batch, tiny_experiment  # noqa: E402

jax.config.update("jax_num_cpu_devices", 2)


def main() -> None:
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from ctr_recommendation_tpu.parallel import distributed

    assert distributed.initialize(coordinator, nprocs, pid)
    assert len(jax.devices()) == 2 * nprocs, jax.devices()

    import dataclasses

    from jax.sharding import Mesh

    from ctr_recommendation_tpu.config.schema import MeshConfig
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.parallel.embedding import make_sharded_lookup
    from ctr_recommendation_tpu.training import Trainer

    # devices arrive ordered (process, local); reshape(nprocs, 2).T makes
    # element [i, j] = process j's device i -> the model axis (columns of a
    # row) pairs devices from DIFFERENT processes.
    devices = np.asarray(jax.devices()).reshape(nprocs, 2).T
    mesh = Mesh(devices, ("data", "model"))
    exp = tiny_experiment(pid, "dense").replace(
        mesh=MeshConfig(data_parallel=2, model_parallel=2)
    )
    exp = exp.replace(
        train=dataclasses.replace(
            exp.train, checkpoint_dir=f"/tmp/dist_mp_ckpt_{pid}"
        )
    )
    fm = build_feature_map(exp.dataset)
    # small_table_rows=0 forces the real all_to_all exchange even for the
    # tiny test vocab — the point is crossing the process boundary
    lookup = make_sharded_lookup(mesh, feature_map=fm, small_table_rows=0)
    trainer = Trainer(
        exp, mesh=mesh, steps_per_epoch=1, lookup=lookup, log_fn=lambda s: None
    )

    # With model pairs spanning processes, each data shard is replicated on
    # one device of EACH process — so every process addresses every data
    # shard and must supply the FULL batch; host_local_to_global's
    # make_array_from_process_local_data slices each device's shard from it.
    batch = full_batch()
    gbatch = distributed.host_local_to_global(batch, mesh)

    state, metrics = trainer._train_step(trainer.state, gbatch, jax.random.key(0))
    loss = float(metrics["loss"])
    gnorm = float(
        jax.numpy.linalg.norm(
            state.params["trunk"]["tables"]["item_id"].reshape(-1)
        )
    )
    if pid == 0:
        print(json.dumps({"loss": loss, "table_norm": gnorm}), flush=True)


if __name__ == "__main__":
    main()
