"""Evaluate CLI — score a labeled split from a checkpoint, no training.

The reference computes validation AUC only inside the training loop
(src/train_fibinet.py:134-145); checking a saved model against a split means
re-running training. This tool closes that gap: load the best export (or any
checkpoint dir), score a labeled parquet split with the serving path
(BatchNorm-folded tower, tolerant item join), and print AUC + logloss —
the same exact tie-aware metrics the trainer's model selection uses
(training/metrics.py, sklearn-parity tested).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Evaluate a checkpoint on a labeled split")
    p.add_argument("--data-root", required=True)
    p.add_argument(
        "--split",
        default="valid",
        help="split file stem under data-root (valid/test/train) or a parquet path",
    )
    p.add_argument("--model", default="mm_fibinet")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--batch-size", type=int, default=8192)
    p.add_argument(
        "--gauc-col",
        default=None,
        help="also report group AUC keyed by this id column (e.g. user_id)",
    )
    args = p.parse_args(argv)

    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    import dataclasses
    import os

    import jax.numpy as jnp
    import numpy as np

    from ctr_recommendation_tpu.config import microlens_experiment, serialize
    from ctr_recommendation_tpu.data import ItemStore, load_split
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.inference import Predictor
    from ctr_recommendation_tpu.training import Trainer
    from ctr_recommendation_tpu.training.metrics import auc, logloss

    exp_json = os.path.join(args.checkpoint_dir, "experiment.json")
    if os.path.exists(exp_json):
        exp = serialize.load(exp_json)
        root = args.data_root
        exp = exp.replace(
            dataset=dataclasses.replace(
                exp.dataset,
                data_root=root,
                item_info=os.path.join(root, "item_info.parquet"),
            ),
            train=dataclasses.replace(exp.train, checkpoint_dir=args.checkpoint_dir),
        )
        # serving mesh, not the training mesh — see cli/predict.py
        from ctr_recommendation_tpu.config.schema import MeshConfig

        exp = exp.replace(mesh=MeshConfig())
    else:
        exp = microlens_experiment(
            data_root=args.data_root,
            model=args.model,
            checkpoint_dir=args.checkpoint_dir,
        )
    fm = build_feature_map(exp.dataset)

    split_path = (
        args.split
        if args.split.endswith(".parquet")
        else os.path.join(args.data_root, f"{args.split}.parquet")
    )
    data = load_split(split_path, fm, include_label=True)
    if fm.label not in data.columns:
        # e.g. the MicroLens test split ships without labels (load_split
        # silently drops absent columns) — say so instead of a deep KeyError
        import sys

        print(
            f"split {split_path} has no {fm.label!r} column — evaluation "
            "needs a labeled split (use cli.predict for unlabeled scoring)",
            file=sys.stderr,
        )
        return 2
    if args.gauc_col and args.gauc_col not in data.columns:
        # validate BEFORE the scoring loop — a typo'd column should not cost
        # a full batch of device scoring first
        import sys

        print(
            f"--gauc-col {args.gauc_col!r} is not a column of {split_path} "
            f"(have: {sorted(data.columns)})",
            file=sys.stderr,
        )
        return 2
    store = ItemStore.from_parquet(
        exp.dataset.item_info,
        id_col=exp.dataset.item_info_key,
        emb_col=exp.dataset.item_info_emb_col,
    )
    print(f"[data] {split_path}: {data.num_rows} rows")

    trainer = Trainer(exp, steps_per_epoch=1, log_fn=print)
    trainer.load_best()
    pred = Predictor(
        exp, trainer.state.params, trainer.state.model_state, item_store=store
    )

    # whole split scored as one device program (the predict CLI's bulk
    # path); row order is preserved so labels/groups come straight from the
    # loaded columns
    probs_np = pred.score_table(data, batch_size=args.batch_size)
    labels_np = np.asarray(data.columns[fm.label])
    probs = jnp.asarray(probs_np)
    labels = jnp.asarray(labels_np)

    a = float(auc(labels, probs))
    ll = float(logloss(labels, probs))
    extra = ""
    if args.gauc_col:
        from ctr_recommendation_tpu.training.metrics import group_auc

        ga = group_auc(labels_np, probs_np, np.asarray(data.columns[args.gauc_col]))
        extra = f" gAUC[{args.gauc_col}]={ga:.6f}"
    print(f"[eval] rows={probs.shape[0]} AUC={a:.6f} logloss={ll:.6f}{extra}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
