"""Regression tests for the round-2 code-review findings.

Each test pins one fixed behavior: weighted BatchNorm statistics on padded
batches, multi-host streaming step-count alignment, dense-join source
matching, MicroLens-only YAML feature overrides, resume-preserving metrics
CSV, and provenance-preserving experiment.json.
"""

import dataclasses
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.ops import mlp


# ------------------------------------------------------------- weighted BN
def test_batchnorm_ignores_zero_weight_rows():
    """BN statistics on a padded batch (zero-weight tail) must equal the
    statistics of the unpadded batch — padding must not skew normalization
    or running stats."""
    key = jax.random.key(0)
    params, state = mlp.init(key, 6, (8,), out_dim=1, batch_norm=True)
    x_real = jax.random.normal(jax.random.key(1), (10, 6))
    # pad by repeating row 0 (what iter_batches/stream_batches do)
    x_pad = jnp.concatenate([x_real, jnp.tile(x_real[:1], (6, 1))])
    w = jnp.concatenate([jnp.ones(10), jnp.zeros(6)])

    out_ref, st_ref = mlp.apply(params, state, x_real, train=True)
    out_pad, st_pad = mlp.apply(params, state, x_pad, train=True, weight=w)

    np.testing.assert_allclose(out_pad[:10], out_ref, rtol=1e-5, atol=1e-6)
    for a, b in zip(st_ref["layers"], st_pad["layers"]):
        np.testing.assert_allclose(a["bn_mean"], b["bn_mean"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a["bn_var"], b["bn_var"], rtol=1e-5, atol=1e-6)


def test_batchnorm_unweighted_path_unchanged():
    """weight=None must reproduce the exact original math (torch parity)."""
    key = jax.random.key(0)
    params, state = mlp.init(key, 4, (5,), out_dim=1, batch_norm=True)
    x = jax.random.normal(jax.random.key(1), (12, 4))
    out_a, st_a = mlp.apply(params, state, x, train=True)
    out_b, st_b = mlp.apply(params, state, x, train=True, weight=jnp.ones(12))
    np.testing.assert_allclose(out_a, out_b, rtol=1e-5, atol=1e-6)
    for a, b in zip(st_a["layers"], st_b["layers"]):
        np.testing.assert_allclose(a["bn_var"], b["bn_var"], rtol=1e-5, atol=1e-6)


# ------------------------------------------- multi-host streaming alignment
def test_common_step_count_uneven_row_groups(tmp_path):
    """Hosts get different row counts from round-robin row-group assignment;
    the common step count must be min_h floor(rows_h / bs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ctr_recommendation_tpu.data.streaming import common_step_count

    path = str(tmp_path / "t.parquet")
    n = 1000
    table = pa.table({"x": pa.array(np.arange(n))})
    # 3 row groups: 400 + 400 + 200 -> host0 gets 600, host1 gets 400
    pq.write_table(table, path, row_group_size=400)
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups == 3

    bs = 100
    assert common_step_count(path, bs, host_count=1) == 10
    assert common_step_count(path, bs, host_count=2) == 4  # min(600, 400)//100


def test_stream_batches_strict_items(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.loader import microlens_features
    from ctr_recommendation_tpu.data.item_store import ItemStore
    from ctr_recommendation_tpu.data.streaming import stream_batches
    from ctr_recommendation_tpu.features import build_feature_map

    exp = microlens_experiment(data_root=str(tmp_path), max_len=4)
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=50, cate_vocab=11, max_len=4, mm_dim=8),
    )
    fm = build_feature_map(ds)

    n = 16
    rng = np.random.default_rng(0)
    table = pa.table(
        {
            "user_id": pa.array(np.zeros(n, np.int32)),
            "likes_level": pa.array(rng.integers(0, 11, n).astype(np.int32)),
            "views_level": pa.array(rng.integers(0, 11, n).astype(np.int32)),
            "item_id": pa.array(np.full(n, 40, np.int32)),  # NOT in item_info
            "item_seq": pa.array([[1, 2]] * n),
            "label": pa.array(np.zeros(n, np.float32)),
        }
    )
    path = str(tmp_path / "train.parquet")
    pq.write_table(table, path)
    # item_info covering ids 0..9 only
    store = ItemStore(
        emb=np.ones((10, 8), np.float32), known_mask=np.ones(10, bool)
    )

    # tolerant (default): zeros for the unknown id, no raise
    batches = list(stream_batches(path, fm, 8, item_store=store))
    assert all((b["item_emb_d128"] == 0).all() for b in batches)
    # strict: reference train semantics — unknown item ids raise
    with pytest.raises(KeyError):
        list(stream_batches(path, fm, 8, item_store=store, strict_items=True))


# ------------------------------------------------------- dense-join source
def test_dense_join_plan_requires_source_tag():
    """A dense feature without a source tag must NOT be joined on an
    arbitrary id column (None == None used to match the first categorical)."""
    from ctr_recommendation_tpu.config.schema import (
        DatasetConfig,
        FeatureSpec,
        FeatureType,
    )
    from ctr_recommendation_tpu.data.device_store import dense_join_plan
    from ctr_recommendation_tpu.features import build_feature_map

    feats = (
        FeatureSpec(name="likes_level", type=FeatureType.CATEGORICAL, vocab_size=11),
        FeatureSpec(name="vec", type=FeatureType.DENSE_EMBEDDING, dense_dim=8),
    )
    fm = build_feature_map(
        DatasetConfig(dataset_id="x", features=feats, label="label")
    )
    assert dense_join_plan(fm) == []


# --------------------------------------------------- MicroLens-only overrides
def test_loader_overrides_gated_on_microlens(tmp_path):
    """A non-MicroLens dataset whose YAML declares a user_id categorical must
    keep it categorical (the reference's hardcoded placeholder treatment is
    MicroLens-specific)."""
    import yaml

    from ctr_recommendation_tpu.config import load_experiment
    from ctr_recommendation_tpu.config.schema import FeatureType

    cfg = {
        "base_expid": "exp1",
        "dataset_id": "MyDataset",
        "dataset_config": {
            "MyDataset": {
                "train_data": "t.parquet",
                "valid_data": "v.parquet",
                "feature_cols": [
                    {"name": "user_id", "type": "categorical", "vocab_size": 500},
                    {"name": "ad_id", "type": "categorical", "vocab_size": 100},
                ],
                "label_col": {"name": "click"},
            }
        },
        "exp1": {"model": "dcnv2", "epochs": 1},
    }
    path = tmp_path / "c.yaml"
    path.write_text(yaml.safe_dump(cfg))
    exp = load_experiment(str(path))
    by_name = {f.name: f for f in exp.dataset.features}
    assert by_name["user_id"].type == FeatureType.CATEGORICAL
    assert by_name["user_id"].vocab_size == 500


def test_loader_microlens_overrides_still_apply():
    from ctr_recommendation_tpu.config import load_experiment
    from ctr_recommendation_tpu.config.schema import FeatureType

    ref = "/root/reference/config/fibinet_config.yaml"
    if not os.path.exists(ref):
        import pytest

        pytest.skip("reference yaml not mounted")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = load_experiment(ref)
    by_name = {f.name: f for f in exp.dataset.features}
    assert by_name["user_id"].type == FeatureType.PLACEHOLDER
    assert by_name["item_seq"].type == FeatureType.SEQUENCE


# ----------------------------------------------------- resume history seeding
def test_seed_history_reloads_pre_resume_epochs(tmp_path):
    from ctr_recommendation_tpu.training.loop import Trainer

    ckdir = str(tmp_path)
    csv_path = os.path.join(ckdir, "metrics.csv")
    with open(csv_path, "w") as f:
        f.write("epoch,train_loss,auc\n1,0.5,0.7\n2,0.4,0.8\n3,0.35,0.82\n")

    ns = types.SimpleNamespace(
        history=[],
        exp=types.SimpleNamespace(
            train=types.SimpleNamespace(checkpoint_dir=ckdir)
        ),
    )
    # resume from epoch 2: epochs 1-2 restored, epoch 3 (post-checkpoint,
    # will be re-run) dropped
    Trainer._seed_history(ns, 2)
    assert [h["epoch"] for h in ns.history] == [1.0, 2.0]
    assert ns.history[1]["auc"] == 0.8


# ------------------------------------------- round-3 advisor findings
def test_hashed_table_rejects_nonzero_pad_via_share_embedding():
    """A sequence with share_embedding -> hashed categorical owner and a
    nonzero pad_id must be rejected at build_feature_map (hashed ids land in
    [1, buckets); a nonzero pad row would silently mask real ids)."""
    import pytest

    from ctr_recommendation_tpu.config.schema import (
        DatasetConfig,
        FeatureSpec,
        FeatureType,
    )
    from ctr_recommendation_tpu.features import build_feature_map

    feats = (
        FeatureSpec(name="item_id", type=FeatureType.CATEGORICAL, hash_buckets=64),
        FeatureSpec(
            name="item_seq", type=FeatureType.SEQUENCE, share_embedding="item_id",
            max_len=4, pad_id=63,
        ),
    )
    ds = DatasetConfig(dataset_id="x", features=feats, label="label")
    with pytest.raises(ValueError, match="hashed"):
        build_feature_map(ds)
    # pad_id 0 through the same shared-table route stays valid
    feats_ok = (
        FeatureSpec(name="item_id", type=FeatureType.CATEGORICAL, hash_buckets=64),
        FeatureSpec(
            name="item_seq", type=FeatureType.SEQUENCE, share_embedding="item_id",
            max_len=4, pad_id=0,
        ),
    )
    fm = build_feature_map(
        DatasetConfig(dataset_id="x", features=feats_ok, label="label")
    )
    assert fm.table("item_id").hashed


def test_per_family_init_std_default():
    """embedding_init_std=None resolves per family: deepfm 0.01 (raw FM
    product logits), everything else torch-parity 1.0; explicit values win."""
    import dataclasses

    from ctr_recommendation_tpu.config.schema import ModelConfig

    assert ModelConfig(model="deepfm").resolved_init_std() == 0.01
    assert ModelConfig(model="mm_fibinet").resolved_init_std() == 1.0
    assert ModelConfig(model="xdeepfm").resolved_init_std() == 1.0
    explicit = ModelConfig(model="deepfm", embedding_init_std=0.5)
    assert explicit.resolved_init_std() == 0.5
    # serialize round-trip preserves the None default
    from ctr_recommendation_tpu.config.schema import model_config_from_dict

    assert model_config_from_dict({"model": "deepfm"}).embedding_init_std is None
    assert (
        model_config_from_dict({"embedding_init_std": 0.25}).embedding_init_std
        == 0.25
    )


def test_deepfm_default_init_trains_sane(tiny_experiment, tiny_batch):
    """With the per-family default (no explicit std), deepfm's initial logits
    must be in a trainable range rather than BCE-saturated."""
    import dataclasses

    import jax

    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.models import build_model

    cfg = dataclasses.replace(tiny_experiment.model, model="deepfm")
    fm = build_feature_map(tiny_experiment.dataset)
    module, params, state = build_model(fm, cfg, jax.random.key(0))
    logits, _ = module.apply(
        params, state, fm, cfg, tiny_batch, train=False,
        compute_dtype=jnp.float32,
    )
    assert float(jnp.max(jnp.abs(logits))) < 30.0


def test_fit_on_device_history_schema_consistent(tmp_path, tiny_experiment):
    """checkpoint_every > 1 must still give every metrics row the same keys
    (checkpoint_seconds recorded as 0.0 on skipped epochs)."""
    import dataclasses

    from ctr_recommendation_tpu.data.synthetic import write_synthetic_dataset
    from ctr_recommendation_tpu.data import ItemStore, load_split
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.training import Trainer

    root = str(tmp_path)
    paths = write_synthetic_dataset(
        root, num_rows=256, num_items=50, max_len=8, mm_dim=24, seed=3
    )
    exp = tiny_experiment.replace(
        train=dataclasses.replace(
            tiny_experiment.train,
            epochs=3,
            checkpoint_every=2,
            batch_size=64,
            checkpoint_dir=os.path.join(root, "ck"),
        )
    )
    fm = build_feature_map(exp.dataset)
    train = load_split(paths["train"], fm)
    store = ItemStore.from_parquet(paths["item_info"])
    trainer = Trainer(
        exp, steps_per_epoch=4, item_store=store, log_fn=lambda s: None
    )
    hist = trainer.fit_on_device(train)
    assert len(hist) == 3
    keysets = [set(h.keys()) for h in hist]
    assert all(ks == keysets[0] for ks in keysets)
    assert hist[0]["checkpoint_seconds"] == 0.0  # epoch 1 skipped
    assert hist[1]["checkpoint_seconds"] > 0.0  # epoch 2 saved


def test_rbg_rng_impl_trains(tiny_experiment, tiny_batch):
    """rng_impl='rbg' (hardware PRNG for dropout) must run a train step to a
    finite loss; threefry stays the default."""
    import dataclasses

    import jax

    from ctr_recommendation_tpu.training import Trainer

    assert tiny_experiment.train.rng_impl == "threefry"
    exp = tiny_experiment.replace(
        train=dataclasses.replace(
            tiny_experiment.train, rng_impl="rbg",
            checkpoint_dir="/tmp/rbg_ckpt",
        )
    )
    trainer = Trainer(exp, steps_per_epoch=1, log_fn=lambda s: None)
    batch = dict(tiny_batch)
    batch["label"] = np.zeros(len(batch["item_id"]), np.float32)
    rng = trainer._replicated_key(0)
    state, m = trainer._train_step(trainer.state, trainer.put_batch(batch), rng)
    assert np.isfinite(float(m["loss"]))


def test_rowwise_adagrad_cli_warning_removed(tmp_path, capsys):
    """The round-3 '-0.08 AUC' warning is GONE: the gap was the rss
    accumulator floor freezing the tables (fixed in training/sparse.py,
    rss_init=0), so choosing rowwise_adagrad must not print scare text."""
    from ctr_recommendation_tpu.cli.train import main

    # bogus data root: main exits with FileNotFoundError after CLI setup
    import pytest

    argv = ["--data-root", str(tmp_path / "nope"),
            "--table-optimizer", "rowwise_adagrad"]
    with pytest.raises(FileNotFoundError):
        main(argv)
    err = capsys.readouterr().err
    assert "rowwise_adagrad" not in err and "-0.08" not in err


# -------------------------------------------------- experiment.json provenance
def test_experiment_json_not_clobbered_by_readonly_trainer(
    tmp_path, tiny_experiment
):
    """A second Trainer pointed at an existing checkpoint dir (the predict /
    evaluate pattern, with locally rewritten paths) must not overwrite the
    training run's persisted experiment.json."""
    import dataclasses
    import json

    from ctr_recommendation_tpu.training import Trainer

    ck = str(tmp_path / "ck")
    exp = tiny_experiment.replace(
        train=dataclasses.replace(tiny_experiment.train, checkpoint_dir=ck)
    )
    Trainer(exp, steps_per_epoch=1, log_fn=lambda s: None)
    path = os.path.join(ck, "experiment.json")
    orig = json.load(open(path))
    assert orig["dataset"]["data_root"] == exp.dataset.data_root

    # predict-style Trainer with rewritten data paths, same checkpoint dir
    exp2 = exp.replace(
        dataset=dataclasses.replace(exp.dataset, data_root="/somewhere/else")
    )
    Trainer(exp2, steps_per_epoch=1, log_fn=lambda s: None)
    assert json.load(open(path)) == orig
