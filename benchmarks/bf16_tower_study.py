"""bf16-tower convergence study (VERDICT r1 item 10).

`tower_dtype: "compute"` runs the DNN tower's matmuls in the training
compute dtype (bfloat16) for ~2x MXU throughput; BatchNorm statistics and
the loss stay fp32. This script trains the same synthetic experiment with
the tower in fp32 vs bf16 (same seed, data, recipe) and prints both
AUC/loss trajectories — the convergence-parity evidence for flipping the
default. `tests/test_bf16_tower.py` runs a scaled-down version in-suite.

Run: python benchmarks/bf16_tower_study.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(root: str, tower_dtype: str, *, epochs=4, num_rows=12000, num_items=1500,
        embedding_dim=32, batch_size=256, max_len=8, seed=11):
    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.loader import microlens_features
    from ctr_recommendation_tpu.data import (
        ItemStore,
        iter_batches,
        load_split,
        write_synthetic_dataset,
    )
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.training import Trainer

    if not os.path.exists(os.path.join(root, "train.parquet")):
        write_synthetic_dataset(
            root, num_rows=num_rows, num_items=num_items, max_len=max_len,
            mm_dim=64, seed=seed,
        )
    exp = microlens_experiment(
        data_root=root,
        embedding_dim=embedding_dim,
        hidden_units=(256, 128),
        batch_size=batch_size,
        epochs=epochs,
        max_len=max_len,
        use_pallas=False,
        tower_dtype=tower_dtype,
        checkpoint_dir=os.path.join(root, f"ckpt_{tower_dtype}"),
        log_every=10_000,
    )
    exp = exp.replace(
        dataset=dataclasses.replace(
            exp.dataset,
            features=microlens_features(
                item_vocab=num_items + 1, cate_vocab=11, max_len=max_len, mm_dim=64
            ),
        )
    )
    fm = build_feature_map(exp.dataset)
    train = load_split(exp.dataset.train_data, fm)
    valid = load_split(exp.dataset.valid_data, fm)
    store = ItemStore.from_parquet(exp.dataset.item_info)
    spe = train.num_rows // batch_size
    trainer = Trainer(exp, steps_per_epoch=spe, item_store=store, log_fn=lambda s: None)
    return trainer.fit_on_device(train, valid)


def main():
    with tempfile.TemporaryDirectory() as root:
        fp32 = run(root, "float32")
        bf16 = run(root, "compute")
    print(f"{'epoch':>5} | {'fp32 loss':>9} {'fp32 AUC':>8} | {'bf16 loss':>9} {'bf16 AUC':>8}")
    for a, b in zip(fp32, bf16):
        print(
            f"{a['epoch']:>5} | {a['train_loss']:>9.4f} {a['auc']:>8.4f} "
            f"| {b['train_loss']:>9.4f} {b['auc']:>8.4f}"
        )
    print(json.dumps({
        "fp32_auc": [h["auc"] for h in fp32],
        "bf16_auc": [h["auc"] for h in bf16],
    }))


if __name__ == "__main__":
    main()
