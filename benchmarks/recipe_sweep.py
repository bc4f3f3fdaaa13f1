"""Recipe sweep toward the synthetic Bayes ceiling (VERDICT r4 item 4).

The committed high-signal workload (data/synthetic.py signal="high") has a
Bayes AUC of ~0.958; round 4's default recipe peaked at 0.9384 — ~0.02 of
learnable signal left on the table. This driver sweeps the recipe knobs the
reference exposes (bilinear all/each, SENet reduction, tower widths, table
optimizer x lr scale, epochs-to-peak) at the FULL MicroLens scale
(3.07M-row train split, 750 steps/epoch @ 4096, vocab 91718, E=128) and
writes a JSON results table for docs/PERFORMANCE.md.

Usage:
    python benchmarks/recipe_sweep.py [--epochs 10] [--out sweep.json]
    python benchmarks/recipe_sweep.py --seeds 2025 7 42 --configs lr_2x
        # seed-variance band at a winning config (any GRID key)

Each run is ~2-4 s/epoch on one v5e; a 16-config sweep costs minutes.
Dataset dirs are cached per signal under /tmp (same layout as
full_scale_run.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the grid: one knob away from the reference recipe per entry, plus a few
# combinations of the individually-best settings
GRID: dict[str, dict] = {
    "reference": {},
    "bilinear_each": {"bilinear_type": "each"},
    "senet_r1": {"senet_reduction": 1},
    "senet_r4": {"senet_reduction": 4},
    "tower_1024": {"hidden_units": (1024, 512)},
    "tower_768_384": {"hidden_units": (768, 384)},
    "rowwise_adagrad": {"table_optimizer": "rowwise_adagrad"},
    "rowwise_adagrad_s5": {
        "table_optimizer": "rowwise_adagrad", "table_lr_scale": 5.0
    },
    "rowwise_adagrad_s20": {
        "table_optimizer": "rowwise_adagrad", "table_lr_scale": 20.0
    },
    "adam_tables_s3": {"table_optimizer": "adam", "table_lr_scale": 3.0},
    "dropout_01": {"net_dropout": 0.1},
    "dropout_03": {"net_dropout": 0.3},
    "lr_half": {"learning_rate": 5e-4},
    "lr_2x": {"learning_rate": 2e-3},
    "each_rowwise": {
        "bilinear_type": "each", "table_optimizer": "rowwise_adagrad"
    },
    "each_tower1024_rowwise": {
        "bilinear_type": "each", "hidden_units": (1024, 512),
        "table_optimizer": "rowwise_adagrad",
    },
    # capacity probes: the 16-config knob grid saturates at ~0.9386-0.9389
    # (every recipe within 0.002), so the residual vs the 0.958 ceiling is
    # tested against model capacity rather than recipe
    "emb_256": {"embedding_dim": 256},
    "emb_256_tower1024": {"embedding_dim": 256, "hidden_units": (1024, 512)},
}


def run_config(name, overrides, root, epochs, seed, log=print):
    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.data import load_split
    from ctr_recommendation_tpu.data.item_store import ItemStore
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.training import Trainer

    ckpt = os.path.join(root, f"ckpt_sweep_{name}_{seed}")
    exp = microlens_experiment(
        data_root=root,
        epochs=epochs,
        checkpoint_dir=ckpt,
        seed=seed,
        **overrides,
    )
    fm = build_feature_map(exp.dataset)
    train = load_split(os.path.join(root, "train.parquet"), fm)
    valid = load_split(os.path.join(root, "valid.parquet"), fm)
    store = ItemStore.from_parquet(os.path.join(root, "item_info.parquet"))
    steps = train.num_rows // exp.train.batch_size
    trainer = Trainer(
        exp, steps_per_epoch=steps, log_fn=lambda s: None, item_store=store
    )
    t0 = time.perf_counter()
    history = trainer.fit_on_device(train, valid)
    wall = time.perf_counter() - t0
    aucs = [round(h["auc"], 5) for h in history]
    best = max(aucs)
    result = {
        "config": name,
        "seed": seed,
        "overrides": {k: list(v) if isinstance(v, tuple) else v
                      for k, v in overrides.items()},
        "best_auc": best,
        "best_epoch": int(aucs.index(best)) + 1,
        "auc_trajectory": aucs,
        "wall_s": round(wall, 1),
        "s_per_epoch": round(wall / max(len(aucs), 1), 2),
    }
    log(f"[sweep] {name} seed={seed}: best {best:.4f} @ epoch "
        f"{result['best_epoch']} ({result['s_per_epoch']}s/epoch) {aucs}")
    return result


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--rows", type=int, default=3_072_000 + 615_000 + 100_000)
    p.add_argument("--seeds", type=int, nargs="*", default=[2025])
    p.add_argument("--configs", nargs="*", default=None,
                   help="subset of GRID keys (default: all)")
    p.add_argument("--out", default="benchmarks/sweep_results.json")
    args = p.parse_args()

    from ctr_recommendation_tpu.data import write_synthetic_dataset
    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    root = os.path.join(tempfile.gettempdir(), "microlens_full_synth_high")
    if not os.path.exists(os.path.join(root, "train.parquet")):
        print(f"[gen] writing {args.rows} high-signal rows under {root} ...")
        write_synthetic_dataset(
            root,
            num_rows=args.rows,
            valid_frac=615_000 / args.rows,
            test_frac=100_000 / args.rows,
            num_items=91_717,
            max_len=20,
            mm_dim=128,
            seed=2025,
            signal="high",
        )

    names = args.configs or list(GRID)
    unknown = [n for n in names if n not in GRID]
    if unknown:
        p.error(f"unknown --configs {unknown}; choose from {sorted(GRID)}")
    results = []
    for name in names:
        for seed in args.seeds:
            results.append(
                run_config(name, GRID[name], root, args.epochs, seed)
            )
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
    ranked = sorted(results, key=lambda r: -r["best_auc"])
    print("\n[sweep] ranked:")
    for r in ranked:
        print(f"  {r['best_auc']:.4f} @ep{r['best_epoch']}  "
              f"{r['config']} (seed {r['seed']})")
    print(f"[sweep] results -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
