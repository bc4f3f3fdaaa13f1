"""Predict CLI — the reference's ``python src/prediction.py`` as a real tool.

Loads the best exported checkpoint, scores the test split at eval batch size
with the BatchNorm-folded tower and tolerant item lookup, and writes the
Kaggle submission pair (prediction_fibinet.csv + submission_fibinet.zip,
Prediction.py:120-126 format).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Batch scoring + submission")
    p.add_argument("--data-root", required=True)
    p.add_argument("--model", default="mm_fibinet")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--out-dir", default="output")
    p.add_argument("--batch-size", type=int, default=8192)
    p.add_argument("--embedding-dim", type=int, default=None)
    p.add_argument("--stream", action="store_true",
                   help="stream the test split from parquet row groups "
                        "instead of loading it into RAM (larger-than-memory "
                        "splits); scores batch-by-batch in row order")
    args = p.parse_args(argv)

    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    import dataclasses
    import os

    from ctr_recommendation_tpu.config import microlens_experiment, serialize
    from ctr_recommendation_tpu.data import ItemStore
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.inference import Predictor, write_submission
    from ctr_recommendation_tpu.training import Trainer

    exp_json = os.path.join(args.checkpoint_dir, "experiment.json")
    if os.path.exists(exp_json):
        # checkpoint is self-describing — rebuild the exact trained model
        exp = serialize.load(exp_json)
        root = args.data_root
        exp = exp.replace(
            dataset=dataclasses.replace(
                exp.dataset,
                data_root=root,
                test_data=os.path.join(root, "test.parquet"),
                item_info=os.path.join(root, "item_info.parquet"),
            ),
            train=dataclasses.replace(exp.train, checkpoint_dir=args.checkpoint_dir),
        )
        # Serving ignores the TRAINING mesh: a checkpoint trained with
        # model_parallel>1 on a pod must restore on this host's devices
        # (replicated) — make_mesh would otherwise demand the pod's exact
        # device count. Orbax re-places the saved global arrays onto the
        # serving sharding at restore.
        from ctr_recommendation_tpu.config.schema import MeshConfig

        exp = exp.replace(mesh=MeshConfig())
    else:
        overrides = {"checkpoint_dir": args.checkpoint_dir}
        if args.embedding_dim:
            overrides["embedding_dim"] = args.embedding_dim
        exp = microlens_experiment(
            data_root=args.data_root, model=args.model, **overrides
        )
    fm = build_feature_map(exp.dataset)

    store = ItemStore.from_parquet(
        exp.dataset.item_info,
        id_col=exp.dataset.item_info_key,
        emb_col=exp.dataset.item_info_emb_col,
    )
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(exp.dataset.test_data).metadata.num_rows
    print(f"[data] test {n_rows} rows")

    trainer = Trainer(exp, steps_per_epoch=1, log_fn=print)
    trainer.load_best()
    pred = Predictor(
        exp, trainer.state.params, trainer.state.model_state, item_store=store
    )

    if args.stream:
        # row-group streaming (submission row order = parquet row order:
        # single "host", unshuffled)
        from ctr_recommendation_tpu.data.streaming import stream_batches

        probs = pred.predict_all(
            stream_batches(
                exp.dataset.test_data, fm, args.batch_size, include_label=False
            )
        )
        assert probs.shape == (n_rows,)
        csv_path, zip_path = write_submission(probs, args.out_dir)
    else:
        # the overlapped pipeline: record-batch decode -> packed single-
        # buffer upload -> fused scoring scan -> incremental CSV -> zip
        # (inference/pipeline.py). Constant host memory at any split size.
        from ctr_recommendation_tpu.inference import run_submission_pipeline

        written, csv_path, zip_path = run_submission_pipeline(
            exp.dataset.test_data, pred, args.out_dir,
            batch_size=args.batch_size,
        )
        assert written == n_rows
    print(f"[out] {csv_path}\n[out] {zip_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
