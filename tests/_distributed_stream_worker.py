"""Worker: full streaming CLI training across 2 real processes.

Runs ``run_training(exp, stream=True)`` end-to-end (Trainer init, streaming
row-group reader, per-epoch eval, checkpoint + best export) on a 2-process
dp=2 mesh over a train parquet whose row groups divide UNEVENLY between the
hosts (600 vs 400 rows). Before the lockstep step-count fix this deadlocked:
the 600-row host dispatched 2 extra steps whose collectives waited forever
on the 400-row host. The parent test asserts both processes exit 0 and that
each epoch ran exactly the common step count (min_h floor(rows_h / bs)).

Usage: python tests/_distributed_stream_worker.py <coordinator> <nprocs> <pid> <data_root> <ckpt_dir>
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"


def main() -> None:
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    data_root, ckpt_dir = sys.argv[4], sys.argv[5]

    from ctr_recommendation_tpu.parallel import distributed

    assert distributed.initialize(coordinator, nprocs, pid)

    import dataclasses

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.loader import microlens_features
    from ctr_recommendation_tpu.cli.train import run_training

    exp = microlens_experiment(
        data_root=data_root, embedding_dim=16, hidden_units=(32, 16),
        batch_size=100, epochs=2, max_len=8, use_pallas=False,
        checkpoint_dir=ckpt_dir, eval_batch_size=512,
    )
    exp = exp.replace(
        dataset=dataclasses.replace(
            exp.dataset,
            features=microlens_features(
                item_vocab=201, cate_vocab=11, max_len=8, mm_dim=16
            ),
        )
    )
    rc = run_training(exp, stream=True)
    print(json.dumps({"pid": pid, "rc": rc}), flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
