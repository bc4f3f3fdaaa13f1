"""Full MicroLens-scale training run, reproducibly.

The reference's logged run (BASELINE.md): ~800-999 steps/epoch at batch 4096
on MicroLens_1M_x1 (train split ~3.3-4.1M rows, item vocab 91718, E=128),
per-epoch eval on the valid split. Real MicroLens data does not exist in
this environment, so this drives the SAME WORKLOAD SHAPE on the committed
synthetic generator: 3.07M train rows (750 steps/epoch @ 4096), 91718-item
vocab, 128-d multimodal vectors, 615K-row eval each epoch — and reports
wall-clock s/epoch, examples/s, and the AUC trajectory.

Usage: python benchmarks/full_scale_run.py [--epochs 5] [--table-optimizer adam]
--rows is the TOTAL row count (train + 615K valid + 100K test); the
default reproduces the 3.07M-train-row / 750-step workload. A different
--rows changes the train split and is NOT comparable to the recorded
PERFORMANCE.md numbers (delete the cached --root dir when changing it).

Numbers land in docs/PERFORMANCE.md ("Full MicroLens-scale run" row).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--rows", type=int, default=3_072_000 + 615_000 + 100_000)
    p.add_argument("--table-optimizer", default="adam",
               help="dense | adagrad | rowwise_adagrad | adam (lazy); all "
                    "within run variance of each other since the round-4 "
                    "rss_init=0 fix (training/sparse.py)")
    p.add_argument("--table-lr-scale", type=float, default=None,
               help="lr multiplier for the sparse table optimizer; default "
                    "resolves per family (10.0 for the adagrad kinds)")
    p.add_argument("--model", default="mm_fibinet",
               help="registry name (mm_fibinet | xdeepfm | finalmlp | "
                    "sasrec_fibinet | ...) — BASELINE.json's named variants")
    p.add_argument("--signal", choices=("planted", "high"), default="planted",
               help="'high' = the reference-regime workload (Bayes AUC "
                    "~0.95); dataset dirs are per-signal, so runs are "
                    "comparable only within a signal")
    p.add_argument("--root", default=None, help="dataset dir (default: temp)")
    args = p.parse_args()

    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.data import load_split, write_synthetic_dataset
    from ctr_recommendation_tpu.data.item_store import ItemStore
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.training import Trainer

    suffix = "" if args.signal == "planted" else f"_{args.signal}"
    root = args.root or os.path.join(
        tempfile.gettempdir(), "microlens_full_synth" + suffix
    )
    if not os.path.exists(os.path.join(root, "train.parquet")):
        print(f"[gen] writing {args.rows} synthetic rows under {root} ...")
        t0 = time.perf_counter()
        write_synthetic_dataset(
            root,
            num_rows=args.rows,
            valid_frac=615_000 / args.rows,
            test_frac=100_000 / args.rows,
            num_items=91_717,  # ids 1..91717; vocab 91718 rows (0 = pad)
            max_len=20,
            mm_dim=128,
            seed=2025,
            signal=args.signal,
        )
        print(f"[gen] done in {time.perf_counter() - t0:.1f}s")

    exp = microlens_experiment(
        data_root=root,
        model=args.model,
        epochs=args.epochs,
        checkpoint_dir=os.path.join(root, "ckpt_" + args.model),
        table_optimizer=args.table_optimizer,
        table_lr_scale=args.table_lr_scale,
        checkpoint_every=args.checkpoint_every,
    )
    fm = build_feature_map(exp.dataset)
    train = load_split(os.path.join(root, "train.parquet"), fm)
    valid = load_split(os.path.join(root, "valid.parquet"), fm)
    store = ItemStore.from_parquet(os.path.join(root, "item_info.parquet"))
    print(f"[data] train {train.num_rows} rows, valid {valid.num_rows} rows")

    steps = train.num_rows // exp.train.batch_size
    trainer = Trainer(exp, steps_per_epoch=steps, log_fn=print, item_store=store)
    t0 = time.perf_counter()
    history = trainer.fit_on_device(train, valid)
    wall = time.perf_counter() - t0
    rows_per_epoch = steps * exp.train.batch_size
    print(
        f"[full-scale] {args.epochs} epochs x {steps} steps @ bs "
        f"{exp.train.batch_size}: {wall:.1f}s total, "
        f"{wall / args.epochs:.2f}s/epoch (incl. eval), "
        f"{rows_per_epoch * args.epochs / wall:,.0f} ex/s end-to-end"
    )
    print("[auc]", [round(h["auc"], 4) for h in history])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
