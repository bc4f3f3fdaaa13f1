"""Convergence-parity harness: the ACTUAL torch reference vs the JAX Trainer.

VERDICT r1 item 1: ops-level parity (SENet/bilinear/OneCycle/masked-mean)
does not prove the *system* converges like the reference. No MicroLens data
exists in this environment, so the next-best proof: import the reference
model + recipe itself from /root/reference/src (imported, NOT copied —
model_fibinet.py:91-199 architecture, train_fibinet.py:74-152 recipe:
Adam(lr,wd) + OneCycleLR(max_lr=10lr, pct_start=.3, div=25, final_div=1000)
stepped per batch + clip 10.0 + BCELoss + per-epoch sklearn AUC), train it
on the committed synthetic dataset, and compare full AUC trajectories
against ``Trainer.fit`` on the identical splits/batching.

Both sides consume the same ``iter_batches`` stream (same seeded shuffle),
so the comparison isolates model + optimizer + loss semantics.

Run standalone: ``python benchmarks/convergence_parity.py`` prints the
per-epoch table (docs/PARITY.md records a committed run).

Full-shape mode (VERDICT r2 item 1 — the reference's REAL regime:
E=128, 6 fields, bs 4096, OneCycle max_lr 1e-2 / pct_start 0.3, clip 10,
BatchNorm at the 2688-wide concat, run well past the OneCycle peak):

    python benchmarks/convergence_parity.py \
        --embedding-dim 128 --batch-size 4096 --epochs 40 \
        --rows 200000 --items 20000 --max-len 20 --out parity_full.json

The torch side is the reference's own imported model at its hardcoded
91718-vocab (model_fibinet.py:100) — synthetic ids stay far below it; the
iid N(0,1) rows actually touched are statistically identical to the JAX
side's right-sized table.
"""

from __future__ import annotations

import os
import sys

import numpy as np

# standalone `python benchmarks/convergence_parity.py` runs: the package
# lives at the repo root, one directory up
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

REFERENCE_SRC = "/root/reference/src"

# The reference hardcodes these (model_fibinet.py:100-102,105,125-135):
# vocab 91718 items / 20000 users / 11 cates, mm input 128-d, MLP 512-256.
# The JAX side is configured to the same architecture; the synthetic ids
# simply stay far below the reference's oversized vocab.
REF_MM_DIM = 128
REF_HIDDEN = (512, 256)


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_SRC, "model_fibinet.py"))


def _torch_batches(batches, device, label_key="label"):
    import torch

    for b in batches:
        labels = torch.from_numpy(np.asarray(b[label_key], np.float32)).to(device)
        bd = {
            k: torch.from_numpy(np.asarray(v)).to(device)
            for k, v in b.items()
            if k not in (label_key, "__weight__", "user_id")
        }
        yield bd, labels


def run_torch_reference(
    fm,
    train,
    valid,
    store,
    *,
    embedding_dim: int,
    batch_size: int,
    epochs: int,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    seed: int = 2025,
    progress: bool = False,
) -> list[dict[str, float]]:
    """The reference training loop (train_fibinet.py:74-152) around the
    reference's own imported model, on our synthetic splits. CPU torch."""
    import torch

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import model_fibinet as ref_model  # the reference's module, not a copy
    import utils as ref_utils

    from ctr_recommendation_tpu.data import iter_batches

    ref_utils.set_seed(seed)
    device = torch.device("cpu")
    model = ref_model.build_model(None, {"embedding_dim": embedding_dim}).to(device)

    spe = sum(
        1
        for _ in iter_batches(
            train, fm, batch_size, shuffle=True, seed=seed, epoch=0, drop_last=True
        )
    )
    optimizer = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=weight_decay)
    loss_fn = torch.nn.BCELoss()
    scheduler = torch.optim.lr_scheduler.OneCycleLR(
        optimizer,
        max_lr=lr * 10,
        epochs=epochs,
        steps_per_epoch=spe,
        pct_start=0.3,
        div_factor=25.0,
        final_div_factor=1000.0,
    )

    history = []
    for epoch in range(epochs):
        model.train()
        total_loss, steps = 0.0, 0
        stream = iter_batches(
            train, fm, batch_size, shuffle=True, seed=seed, epoch=epoch,
            item_store=store, drop_last=True,
        )
        for bd, labels in _torch_batches(stream, device):
            optimizer.zero_grad()
            y_pred = model(bd)
            loss = loss_fn(y_pred, labels)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=10.0)
            optimizer.step()
            scheduler.step()
            total_loss += loss.item()
            steps += 1

        model.eval()
        y_trues, y_preds = [], []
        with torch.no_grad():
            stream = iter_batches(
                valid, fm, batch_size, item_store=store, pad_final=False
            )
            for bd, labels in _torch_batches(stream, device):
                y_preds.append(model(bd).cpu().numpy())
                y_trues.append(labels.cpu().numpy())
        auc = ref_utils.compute_auc(
            np.concatenate(y_trues), np.concatenate(y_preds)
        )
        history.append(
            {"epoch": epoch + 1, "train_loss": total_loss / max(steps, 1), "auc": float(auc)}
        )
        if progress:
            print(
                f"[torch] epoch {epoch + 1}/{epochs} loss "
                f"{history[-1]['train_loss']:.4f} auc {auc:.4f}",
                flush=True,
            )
    return history


def run_jax_trainer(exp, fm, train, valid, store) -> list[dict[str, float]]:
    from ctr_recommendation_tpu.data import iter_batches
    from ctr_recommendation_tpu.training import Trainer

    bs = exp.train.batch_size
    spe = sum(
        1
        for _ in iter_batches(
            train, fm, bs, shuffle=True, seed=exp.train.seed, epoch=0, drop_last=True
        )
    )
    trainer = Trainer(exp, steps_per_epoch=spe, log_fn=lambda s: None)

    def train_batches(epoch):
        return iter_batches(
            train, fm, bs, shuffle=True, seed=exp.train.seed, epoch=epoch,
            item_store=store, drop_last=True,
        )

    def valid_batches():
        return iter_batches(valid, fm, bs, item_store=store)

    return trainer.fit(train_batches, valid_batches)


def build_setup(root: str, *, embedding_dim=16, batch_size=256, epochs=4,
                num_rows=12000, num_items=1500, max_len=8, seed=11,
                signal="planted"):
    """Synthetic dataset + matched JAX experiment (reference architecture:
    mm 128-d input, 512-256 tower, E configurable)."""
    import dataclasses

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.loader import microlens_features
    from ctr_recommendation_tpu.data import ItemStore, load_split, write_synthetic_dataset
    from ctr_recommendation_tpu.features import build_feature_map

    paths = write_synthetic_dataset(
        root, num_rows=num_rows, num_items=num_items, max_len=max_len,
        mm_dim=REF_MM_DIM, seed=seed, signal=signal,
    )
    exp = microlens_experiment(
        data_root=root,
        embedding_dim=embedding_dim,
        hidden_units=REF_HIDDEN,
        batch_size=batch_size,
        epochs=epochs,
        max_len=max_len,
        use_pallas=False,
        checkpoint_dir=os.path.join(root, "ckpt"),
        log_every=10_000,
    )
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(
            item_vocab=num_items + 1, cate_vocab=11, max_len=max_len,
            mm_dim=REF_MM_DIM,
        ),
    )
    exp = exp.replace(dataset=ds)
    fm = build_feature_map(ds)
    train = load_split(paths["train"], fm)
    valid = load_split(paths["valid"], fm)
    store = ItemStore.from_parquet(paths["item_info"])
    return exp, fm, train, valid, store


def main():
    import argparse
    import json
    import tempfile
    import time

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--embedding-dim", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--rows", type=int, default=12000)
    p.add_argument("--items", type=int, default=1500)
    p.add_argument("--max-len", type=int, default=8)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--signal", choices=("planted", "high"), default="planted",
                   help="'high' = the reference-regime workload (Bayes AUC ~0.95;\n"
                        "VERDICT r3 item 1: both sides must peak >=0.90)")
    p.add_argument("--torch-seed", type=int, default=None,
                   help="override the torch side's training seed only (data "
                        "and the JAX side keep the recipe seed) — for the "
                        "seed-variance control: if torch-vs-torch across "
                        "seeds moves as much as torch-vs-jax, the framework "
                        "gap is within run variance")
    p.add_argument("--torch-only", action="store_true",
                   help="skip the JAX side (seed-variance control runs)")
    p.add_argument("--out", default=None, help="write the full result JSON here")
    args = p.parse_args()

    with tempfile.TemporaryDirectory() as root:
        exp, fm, train, valid, store = build_setup(
            root, embedding_dim=args.embedding_dim, batch_size=args.batch_size,
            epochs=args.epochs, num_rows=args.rows, num_items=args.items,
            max_len=args.max_len, seed=args.seed, signal=args.signal,
        )
        spe = train.num_rows // args.batch_size
        print(
            f"[setup] train {train.num_rows} rows, valid {valid.num_rows}, "
            f"E={args.embedding_dim}, bs {args.batch_size}, {spe} steps/epoch, "
            f"{args.epochs} epochs (OneCycle peak ~step "
            f"{int(0.3 * spe * args.epochs)} of {spe * args.epochs})",
            flush=True,
        )
        jx, t_jax = None, 0.0
        if not args.torch_only:
            t0 = time.time()
            jx = run_jax_trainer(exp, fm, train, valid, store)
            t_jax = time.time() - t0
            print(f"[jax] done in {t_jax:.1f}s", flush=True)
        t0 = time.time()
        th = run_torch_reference(
            fm, train, valid, store,
            embedding_dim=exp.model.embedding_dim,
            batch_size=exp.train.batch_size,
            epochs=exp.train.epochs,
            lr=exp.train.learning_rate,
            weight_decay=exp.train.weight_decay,
            seed=(
                args.torch_seed if args.torch_seed is not None
                else exp.train.seed
            ),
            progress=True,
        )
        t_torch = time.time() - t0
        print(f"[torch] done in {t_torch:.1f}s", flush=True)
    result = {
        "shape": {
            "embedding_dim": args.embedding_dim, "batch_size": args.batch_size,
            "epochs": args.epochs, "train_rows": args.rows, "items": args.items,
            "max_len": args.max_len, "seed": args.seed,
            "signal": args.signal, "torch_seed": args.torch_seed,
        },
        "torch_loss": [t["train_loss"] for t in th],
        "torch_auc": [t["auc"] for t in th],
        "torch_best_epoch": int(np.argmax([t["auc"] for t in th])) + 1,
        "torch_seconds": round(t_torch, 1),
    }
    if jx is not None:
        print(f"{'epoch':>5} | {'torch loss':>10} {'torch AUC':>9} | {'jax loss':>10} {'jax AUC':>9} | {'dloss':>7} {'dAUC':>7}")
        for t, j in zip(th, jx):
            print(
                f"{t['epoch']:>5} | {t['train_loss']:>10.4f} {t['auc']:>9.4f} "
                f"| {j['train_loss']:>10.4f} {j['auc']:>9.4f} "
                f"| {abs(t['train_loss'] - j['train_loss']):>7.4f} "
                f"{abs(t['auc'] - j['auc']):>7.4f}"
            )
        result.update(
            jax_loss=[j["train_loss"] for j in jx],
            jax_auc=[j["auc"] for j in jx],
            max_loss_gap=float(
                max(abs(t["train_loss"] - j["train_loss"]) for t, j in zip(th, jx))
            ),
            max_auc_gap=float(
                max(abs(t["auc"] - j["auc"]) for t, j in zip(th, jx))
            ),
            jax_best_epoch=int(np.argmax([j["auc"] for j in jx])) + 1,
            jax_seconds=round(t_jax, 1),
        )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
