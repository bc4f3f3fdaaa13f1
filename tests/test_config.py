"""Config loading: reference-format YAML -> typed ExperimentConfig, feature
map construction, share_embedding resolution, code-vs-yaml discrepancy rules."""

import textwrap

import pytest

from ctr_recommendation_tpu.config import (
    FeatureType,
    load_experiment,
    microlens_experiment,
)
from ctr_recommendation_tpu.features import build_feature_map

REFERENCE_STYLE_YAML = textwrap.dedent(
    """
    base_config:
      model_root: './checkpoints/'
      num_workers: 4
      save_best_only: True
      seed: 2025

    base_expid: MM_FiBiNET_Run
    dataset_id: MicroLens_1M_x1

    dataset_config:
      MicroLens_1M_x1:
        data_root: data/MicroLens_1M_x1/
        train_data: data/MicroLens_1M_x1/train.parquet
        valid_data: data/MicroLens_1M_x1/valid.parquet
        test_data: data/MicroLens_1M_x1/test.parquet
        item_info: data/MicroLens_1M_x1/item_info.parquet
        feature_cols:
          - {name: user_id, active: True, dtype: int, type: meta}
          - {name: item_seq, active: True, dtype: int, type: meta}
          - {name: likes_level, active: True, dtype: int, type: categorical, vocab_size: 11}
          - {name: views_level, active: True, dtype: int, type: categorical, vocab_size: 11}
          - {name: item_id, active: True, dtype: int, type: categorical, vocab_size: 91718, source: item}
          - {name: item_emb_d128, active: True, dtype: float, type: embedding, source: item}
        label_col: {name: label, dtype: float}

    MM_FiBiNET_Run:
      model: MM_FiBiNET
      dataset_id: MicroLens_1M_x1
      learning_rate: 0.001
      batch_size: 4096
      embedding_dim: 128
      max_len: 20
      bilinear_type: "all"
      senet_reduction: 2
      epochs: 40
      optimizer: adam
      weight_decay: 1.0e-5
      net_dropout: 0.2
      shuffle: True
      monitor: "AUC"
      monitor_mode: "max"
    """
)


@pytest.fixture
def yaml_path(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_STYLE_YAML)
    return str(p)


def test_load_reference_style_yaml(yaml_path):
    exp = load_experiment(yaml_path)
    assert exp.expid == "MM_FiBiNET_Run"
    assert exp.model.model == "mm_fibinet"
    assert exp.model.embedding_dim == 128
    assert exp.model.bilinear_type == "all"
    assert exp.train.batch_size == 4096
    assert exp.train.epochs == 40
    assert exp.train.seed == 2025
    assert exp.train.optimizer == "adam"
    assert exp.dataset.train_data.endswith("train.parquet")

    fm = build_feature_map(exp.dataset)
    assert fm.num_fields == 6
    assert fm.num_pairs == 15
    # user_id becomes a zeros placeholder; item_seq shares the item table;
    # views shares the likes table
    names = {f.name: f.type for f in fm.features}
    assert names["user_id"] == FeatureType.PLACEHOLDER
    assert names["item_seq"] == FeatureType.SEQUENCE
    assert fm.table_of["item_seq"] == "item_id"
    assert fm.table_of["views_level"] == "likes_level"
    assert fm.table("item_id").vocab_size == 91718
    assert fm.table("item_id").pad_id == 0
    seq = exp.dataset.feature("item_seq")
    assert seq.max_len == 20


def test_data_root_override(yaml_path):
    exp = load_experiment(yaml_path, data_root="/elsewhere")
    assert exp.dataset.train_data == "/elsewhere/train.parquet"
    assert exp.dataset.item_info == "/elsewhere/item_info.parquet"


def test_microlens_experiment_defaults_match_logged_run():
    exp = microlens_experiment()
    # SURVEY §6 run config
    t = exp.train
    assert (t.batch_size, t.epochs, t.seed) == (4096, 40, 2025)
    assert t.learning_rate == 1e-3 and t.weight_decay == 1e-5
    assert t.optimizer == "adam" and t.lr_schedule == "onecycle"
    assert t.onecycle_peak_factor == 10.0 and t.grad_clip_norm == 10.0
    m = exp.model
    assert m.embedding_dim == 128 and m.bilinear_type == "all"
    assert m.senet_reduction == 2 and m.net_dropout == 0.2
    assert m.hidden_units == (512, 256)

    with pytest.raises(TypeError):
        microlens_experiment(bogus_override=1)


# ---- the ACTUAL reference YAML, loaded verbatim (VERDICT r1 missing #4) ----

REFERENCE_YAML = "/root/reference/config/fibinet_config.yaml"
needs_reference = pytest.mark.skipif(
    not __import__("os").path.isfile(REFERENCE_YAML),
    reason="reference checkout not present",
)


@needs_reference
def test_reference_yaml_verbatim_field_order():
    """Loading the reference's own config must produce the model's field
    stack order [User, Like, View, ItemID, ItemImage, Hist]
    (model_fibinet.py:180-182), NOT the YAML's feature_cols order (which
    lists item_seq second)."""
    with pytest.warns(UserWarning, match="reference code hardcodes"):
        exp = load_experiment(REFERENCE_YAML)
    fm = build_feature_map(exp.dataset)
    assert fm.field_names == (
        "user_id", "likes_level", "views_level", "item_id",
        "item_emb_d128", "item_seq",
    )
    assert fm.table("item_id").vocab_size == 91718
    assert fm.table_of["item_seq"] == "item_id"
    assert fm.table_of["views_level"] == "likes_level"
    assert exp.dataset.feature("item_seq").max_len == 20


@needs_reference
def test_reference_yaml_both_semantics():
    """yaml-wins honors the YAML's declarations (with a warning listing
    each dead key); --logged-run-parity applies the code-wins values that
    produced the logged 0.9315 run (SURVEY §5.6)."""
    with pytest.warns(UserWarning) as rec:
        exp = load_experiment(REFERENCE_YAML)
    msg = str(rec[0].message)
    for key in ("bilinear_type", "optimizer", "net_dropout"):
        assert key in msg
    assert exp.train.optimizer == "adamw"
    assert exp.model.bilinear_type == "each"
    assert exp.model.net_dropout == 0.25

    exp2 = load_experiment(REFERENCE_YAML, logged_run_parity=True)
    assert exp2.train.optimizer == "adam"
    assert exp2.model.bilinear_type == "all"
    assert exp2.model.net_dropout == 0.2
    # keys the reference code DOES read come straight from the YAML
    for e in (exp, exp2):
        assert e.train.epochs == 40
        assert e.train.batch_size == 4096
        assert e.train.seed == 2025
        assert e.train.learning_rate == 1e-3
        assert e.model.embedding_dim == 128
        assert e.model.senet_reduction == 2


def test_field_order_yaml_key(tmp_path):
    """A YAML may pin the stack order explicitly via field_order."""
    import textwrap as tw

    cfg = tw.dedent("""
        base_expid: run
        dataset_id: ds
        dataset_config:
          ds:
            field_order: [b, a]
            feature_cols:
              - {name: a, type: categorical, vocab_size: 5}
              - {name: b, type: categorical, vocab_size: 7}
            label_col: {name: label}
        run:
          model: dcnv2
    """)
    p = tmp_path / "c.yaml"
    p.write_text(cfg)
    exp = load_experiment(str(p))
    assert tuple(f.name for f in exp.dataset.features) == ("b", "a")
