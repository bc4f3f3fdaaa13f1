"""Train CLI — the reference's ``python src/train_fibinet.py`` with real flags.

Usage:
    python -m ctr_recommendation_tpu.cli.train --data-root data/MicroLens_1M_x1
    python -m ctr_recommendation_tpu.cli.train --config config.yaml --expid MM_FiBiNET_Run
    python -m ctr_recommendation_tpu.cli.train --synthetic /tmp/synth --model xdeepfm

The reference takes zero arguments and hardcodes paths with a ../ fallback
(train_fibinet.py:18-24); this exposes dataset paths, model choice, epochs,
and resume as flags while defaulting to the reference's exact recipe.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a CTR model on TPU")
    p.add_argument("--config", help="reference-compatible YAML config")
    p.add_argument("--logged-run-parity", action="store_true",
                   help="apply the reference CODE's hardcoded values (Adam, "
                        "bilinear 'all', dropout 0.2) over dead YAML keys, "
                        "reproducing the logged 0.9315-AUC run")
    p.add_argument("--expid", help="experiment id in the YAML")
    p.add_argument("--data-root", help="directory with train/valid/test/item_info parquet")
    p.add_argument("--synthetic", metavar="DIR",
                   help="generate a synthetic MicroLens-shaped dataset in DIR and train on it")
    p.add_argument("--synthetic-rows", type=int, default=200_000)
    p.add_argument("--synthetic-items", type=int, default=4096,
                   help="item vocab for --synthetic (use 91717 for full MicroLens scale)")
    p.add_argument("--synthetic-signal", choices=("planted", "high"),
                   default="planted",
                   help="planted-logit regime: 'planted' (Bayes AUC ~0.75, "
                        "fast tests) or 'high' (Bayes ~0.95 — the "
                        "reference's 0.93+ AUC regime)")
    p.add_argument("--model", default=None,
                   help="model name (mm_fibinet | xdeepfm | finalmlp | "
                        "sasrec_fibinet | dcnv2 | deepfm | autoint | din | "
                        "masknet | pnn | dlrm)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--embedding-dim", type=int, default=None)
    p.add_argument("--embedding-init-std", type=float, default=None,
                   help="embedding table init N(0, std); default resolves "
                        "per family (1.0 torch parity; deepfm 0.01 — its raw "
                        "FM product logits saturate BCE at std 1.0)")
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--optimizer", default=None)
    p.add_argument("--table-optimizer", default=None,
                   help="embedding-table update strategy: dense (reference "
                        "semantics) | adagrad | rowwise_adagrad | adam "
                        "(touched-rows-only sparse updates)")
    p.add_argument("--table-lr-scale", type=float, default=None,
                   help="lr multiplier for the sparse table optimizer "
                        "(adagrad-family steps decay ~1/sqrt(touches); "
                        "~10 tracks the Adam trajectory at full scale)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=None,
                   help="full-state resume-point cadence in epochs (best "
                        "export still saves on every improvement)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--strict-items", action="store_true",
                   help="raise on item_ids missing from item_info (reference train semantics)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of one epoch into DIR and exit")
    p.add_argument("--stream", action="store_true",
                   help="stream the train split from parquet row groups instead of "
                        "loading it into RAM/HBM (for splits larger than memory)")
    p.add_argument("--rng-impl", default=None,
                   help="training-rng PRNG: threefry (bit-reproducible "
                        "default) | rbg (TPU hardware generator; -19%% step "
                        "time on dropout-heavy models, same statistics)")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="host-driven paths (--stream/--strict-items/multi-host) "
                        "group this many batches per device dispatch (one jitted "
                        "K-step scan); 1 = dispatch per batch")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    from ctr_recommendation_tpu.config import load_experiment, microlens_experiment
    from ctr_recommendation_tpu.config.schema import MeshConfig

    overrides = {}
    for k in ("epochs", "batch_size", "embedding_dim", "embedding_init_std",
              "learning_rate", "optimizer", "table_optimizer", "table_lr_scale",
              "checkpoint_dir",
              "checkpoint_every", "steps_per_dispatch", "rng_impl"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    if args.no_pallas:
        overrides["use_pallas"] = False

    if args.synthetic:
        from ctr_recommendation_tpu.data import write_synthetic_dataset

        os.makedirs(args.synthetic, exist_ok=True)
        if not os.path.exists(os.path.join(args.synthetic, "train.parquet")):
            print(f"[synthetic] generating {args.synthetic_rows} rows in {args.synthetic}")
            write_synthetic_dataset(
                args.synthetic, num_rows=args.synthetic_rows,
                num_items=args.synthetic_items, signal=args.synthetic_signal,
            )
        exp = microlens_experiment(
            data_root=args.synthetic, model=args.model or "mm_fibinet", **overrides
        )
        import ctr_recommendation_tpu.config.loader as loader

        exp = exp.replace(
            dataset=dataclasses.replace(
                exp.dataset,
                features=loader.microlens_features(
                    item_vocab=args.synthetic_items + 1, cate_vocab=11,
                    max_len=20, mm_dim=128,
                ),
            )
        )
    elif args.config:
        exp = load_experiment(
            args.config, expid=args.expid, data_root=args.data_root,
            logged_run_parity=args.logged_run_parity,
        )
        if args.model:
            exp = exp.replace(model=dataclasses.replace(exp.model, model=args.model))
        for k, v in overrides.items():
            target = (
                "model"
                if k in ("embedding_dim", "embedding_init_std", "use_pallas")
                else "train"
            )
            exp = exp.replace(**{target: dataclasses.replace(getattr(exp, target), **{k: v})})
    else:
        if not args.data_root:
            print("need --data-root, --config, or --synthetic", file=sys.stderr)
            return 2
        exp = microlens_experiment(
            data_root=args.data_root, model=args.model or "mm_fibinet", **overrides
        )
    if args.model_parallel > 1:
        exp = exp.replace(mesh=MeshConfig(model_parallel=args.model_parallel))

    # (the round-3 "-0.08 AUC" rowwise_adagrad warning is gone: the gap was
    # the optax-default rss accumulator floor of 0.1 swamping CTR-scale
    # gradients; the accumulator now starts at 0 — torch Adagrad's default —
    # and the first update of a row is properly normalized. See
    # training/sparse.py rss_init and tests/test_sparse.py.)

    return run_training(
        exp, resume=args.resume, strict_items=args.strict_items, stream=args.stream,
        profile_dir=args.profile_dir,
    )


def run_training(
    exp, *, resume: bool = False, strict_items: bool = False, stream: bool = False,
    profile_dir: str | None = None,
) -> int:
    from ctr_recommendation_tpu.data import ItemStore, iter_batches, load_split
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.parallel.embedding import make_sharded_lookup
    from ctr_recommendation_tpu.parallel.mesh import make_mesh
    from ctr_recommendation_tpu.training import Trainer

    from ctr_recommendation_tpu.models import get_model

    get_model(exp.model.model)  # fail fast on unknown model, before data load
    fm = build_feature_map(exp.dataset)
    print(f"[data] loading {exp.dataset.train_data}")
    valid = load_split(exp.dataset.valid_data, fm)
    store = ItemStore.from_parquet(
        exp.dataset.item_info,
        id_col=exp.dataset.item_info_key,
        emb_col=exp.dataset.item_info_emb_col,
    )
    bs = exp.train.batch_size
    if stream:
        import pyarrow.parquet as pq

        train_rows = pq.ParquetFile(exp.dataset.train_data).metadata.num_rows
        train = None
    else:
        train = load_split(exp.dataset.train_data, fm)
        train_rows = train.num_rows
    print(f"[data] train {train_rows} rows, valid {valid.num_rows} rows")

    mesh = make_mesh(exp.mesh)
    # sparse table updates replace the lookup with their dedup row gather;
    # with mp>1 the row exchange is then left to GSPMD instead of the
    # explicit all-to-all lookup
    sparse_tables = exp.train.table_optimizer != "dense"
    lookup = (
        make_sharded_lookup(
            mesh,
            model_axis=exp.mesh.model_axis,
            data_axis=exp.mesh.data_axis,
            method=exp.mesh.lookup_method,
            capacity_factor=exp.mesh.lookup_capacity_factor,
            feature_map=fm,
        )
        if exp.mesh.model_parallel > 1 and not sparse_tables
        else None
    )
    import itertools

    from ctr_recommendation_tpu.parallel import distributed

    n_hosts, host = distributed.host_count(), distributed.host_id()
    if stream:
        from ctr_recommendation_tpu.data.streaming import common_step_count

        # every host runs the same number of steps per epoch (unequal
        # row-group assignment would deadlock the slower hosts' collectives)
        steps = common_step_count(exp.dataset.train_data, bs, n_hosts)
    elif n_hosts > 1:
        # disjoint per-host shard — each global batch must contain every
        # example once, not host_count duplicates of the same rows — with a
        # lockstep step count (shards can differ by up to n_hosts-1 rows)
        train = train.shard(host, n_hosts)
        steps = (train_rows // n_hosts) // bs
    else:
        steps = train_rows // bs
    if steps < 1:
        # NOT clamped to 1: forcing a step on hosts whose shard holds < one
        # full batch would deadlock the others' collectives (the empty host
        # yields no batches). All hosts compute the same value -> all raise.
        print(
            f"batch size {bs} exceeds the smallest per-host train shard "
            f"({train_rows} rows / {n_hosts} host(s)); lower --batch-size",
            file=sys.stderr,
        )
        return 2
    # Default: item join happens ON DEVICE inside the jitted step (batches
    # carry only ids). strict mode needs the host-side check, so it keeps
    # the host join (reference training semantics, dataloader.py:104-106).
    host_store = store if strict_items else None
    trainer = Trainer(
        exp, mesh=mesh, steps_per_epoch=steps, lookup=lookup,
        item_store=None if strict_items else store,
    )

    if profile_dir:
        if stream or strict_items:
            # profile_epoch runs the device-resident epoch scan: it needs the
            # whole split in HBM (not --stream) and the on-device item join
            # (not --strict-items); fail clearly instead of crashing at trace
            print(
                "--profile-dir requires the in-memory, non-strict path "
                "(drop --stream/--strict-items)",
                file=sys.stderr,
            )
            return 2
        trainer.profile_epoch(train, profile_dir)
        return 0

    single_chip = len(mesh.devices.flat) == 1
    if single_chip and not strict_items and not stream:
        # whole split resident in HBM; epochs run as one jitted scan
        trainer.fit_on_device(train, valid, resume=resume)
        return 0

    if stream:
        from ctr_recommendation_tpu.data.streaming import stream_batches

        def train_batches(epoch):
            it = stream_batches(
                exp.dataset.train_data, fm, bs,
                shuffle=exp.train.shuffle, seed=exp.train.seed, epoch=epoch,
                host_index=host, host_count=n_hosts,
                item_store=host_store, drop_last=True, strict_items=strict_items,
            )
            return itertools.islice(it, steps)

    else:

        def train_batches(epoch):
            it = iter_batches(
                train, fm, bs, shuffle=exp.train.shuffle,
                seed=exp.train.seed + host, epoch=epoch, item_store=host_store,
                drop_last=True, strict_items=strict_items,
            )
            return itertools.islice(it, steps)

    def valid_batches():
        return iter_batches(valid, fm, exp.train.eval_batch_size, item_store=host_store)

    trainer.fit(train_batches, valid_batches, resume=resume)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
