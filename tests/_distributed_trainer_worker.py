"""Worker: full Trainer train step across 2 real processes (1 device each).

Builds the tiny MicroLens experiment on a 2-process global mesh (dp=2),
assembles the SAME deterministic batch from per-host halves via
host_local_to_global, runs ONE jitted train step, and prints the loss —
which the parent test asserts equal to a single-process Trainer step on the
full batch.

Usage: python tests/_distributed_trainer_worker.py <coordinator> <nprocs> <pid>
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import numpy as np  # noqa: E402


def tiny_experiment(pid: int, table_optimizer: str = "dense"):
    import dataclasses

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.loader import microlens_features

    exp = microlens_experiment(
        data_root="", embedding_dim=16, hidden_units=(32, 16), batch_size=64,
        epochs=1, max_len=8, use_pallas=False,
        checkpoint_dir=f"/tmp/dist_trainer_ckpt_{table_optimizer}_{pid}",
    )
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=200, cate_vocab=11, max_len=8, mm_dim=24),
    )
    return exp.replace(
        dataset=ds,
        train=dataclasses.replace(exp.train, table_optimizer=table_optimizer),
    )


def full_batch():
    rng = np.random.default_rng(0)
    n, item_vocab, max_len, mm_dim = 64, 200, 8, 24
    return {
        "user_id": rng.integers(0, 100, size=(n,), dtype=np.int32),
        "likes_level": rng.integers(0, 11, size=(n,), dtype=np.int32),
        "views_level": rng.integers(0, 11, size=(n,), dtype=np.int32),
        "item_id": rng.integers(1, item_vocab, size=(n,), dtype=np.int32),
        "item_emb_d128": rng.normal(size=(n, mm_dim)).astype(np.float32),
        "item_seq": np.where(
            rng.random((n, max_len)) < 0.3, 0,
            rng.integers(1, item_vocab, size=(n, max_len)),
        ).astype(np.int32),
        "label": (rng.random(n) < 0.5).astype(np.float32),
    }


def main() -> None:
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    table_optimizer = sys.argv[4] if len(sys.argv) > 4 else "dense"

    from ctr_recommendation_tpu.parallel import distributed

    assert distributed.initialize(coordinator, nprocs, pid)

    from jax.sharding import Mesh

    from ctr_recommendation_tpu.training import Trainer

    devices = np.asarray(jax.devices()).reshape(nprocs, 1)
    mesh = Mesh(devices, ("data", "model"))
    exp = tiny_experiment(pid, table_optimizer)
    trainer = Trainer(exp, mesh=mesh, steps_per_epoch=1, log_fn=lambda s: None)

    batch = full_batch()
    # per-host half: contiguous split so the global concat == the full batch
    n = 64 // nprocs
    local = {k: v[pid * n : (pid + 1) * n] for k, v in batch.items()}
    gbatch = distributed.host_local_to_global(local, mesh)

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
