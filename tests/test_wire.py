"""Wire format (data/wire.py) + pipelined submission (inference/pipeline.py).

The wire pack must round-trip EXACTLY (the scoring program consumes the
unpacked columns), and the pipeline must write byte-for-byte the same
submission rows as the bulk score_table path.
"""

import csv
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctr_recommendation_tpu.data.wire import (
    build_unpacker,
    build_wire_plan,
    pack_columns,
    value_capacity,
)
from ctr_recommendation_tpu.features import build_feature_map


def _roundtrip(cols, plan, n_rows):
    buf, layout = pack_columns(cols, plan, n_rows)
    out = jax.jit(build_unpacker(layout))(jnp.asarray(buf))
    return {k: np.asarray(v) for k, v in out.items()}, buf


def test_plan_codes_follow_vocab_bounds(tiny_feature_map):
    plan = build_wire_plan(tiny_feature_map)
    codes = {e.name: e.code for e in plan.entries}
    # tiny fixture: cate_vocab=11 -> u8, item_vocab=200 -> u8
    assert codes["likes_level"] == "u8"
    assert codes["item_id"] == "u8"
    # full MicroLens: item vocab 91718 needs 17 bits -> u16 + hi bit
    from ctr_recommendation_tpu.config import microlens_experiment

    full = build_feature_map(microlens_experiment(data_root="").dataset)
    full_codes = {e.name: e.code for e in build_wire_plan(full).entries}
    assert full_codes["item_id"] == "u16b"
    assert full_codes["item_seq"] == "u16b"
    assert full_codes["likes_level"] == "u8"


def test_roundtrip_exact_all_codes(tiny_feature_map):
    plan = build_wire_plan(tiny_feature_map)
    rng = np.random.default_rng(0)
    n = 300
    cols = {
        "likes_level": rng.integers(0, 11, n, dtype=np.int32),
        "views_level": rng.integers(0, 11, n, dtype=np.int32),
        "item_id": rng.integers(1, 200, n, dtype=np.int32),
        "item_seq": np.where(
            rng.random((n, 8)) < 0.4,
            0,
            rng.integers(1, 200, size=(n, 8)),
        ).astype(np.int32),
    }
    # edge rows: all-pad, full, singleton, interior pad ids
    cols["item_seq"][0] = 0
    cols["item_seq"][1] = rng.integers(1, 200, 8)
    cols["item_seq"][2] = [0] * 7 + [5]
    cols["item_seq"][3] = [0, 0, 7, 0, 0, 9, 0, 3]  # interior pads survive
    out, buf = _roundtrip(cols, plan, n)
    for name, want in cols.items():
        np.testing.assert_array_equal(out[name], want, err_msg=name)
    raw = sum(v.nbytes for v in cols.values())
    assert buf.nbytes < raw  # actually compressed


def test_roundtrip_17bit_ids():
    """u16b: ids above 65535 split into u16 low + packed high bit."""
    from ctr_recommendation_tpu.config import microlens_experiment

    fm = build_feature_map(microlens_experiment(data_root="").dataset)
    plan = build_wire_plan(fm)
    rng = np.random.default_rng(1)
    n = 257  # odd size: exercises bit-padding of the packed hi bits
    cols = {
        "likes_level": rng.integers(0, 11, n, dtype=np.int32),
        "views_level": rng.integers(0, 11, n, dtype=np.int32),
        "item_id": rng.integers(1, 91718, n, dtype=np.int32),
        "item_seq": np.where(
            rng.random((n, 20)) < 0.5,
            0,
            rng.integers(1, 91718, size=(n, 20)),
        ).astype(np.int32),
    }
    cols["item_id"][:3] = [91717, 65535, 65536]  # boundary ids
    out, _ = _roundtrip(cols, plan, n)
    for name, want in cols.items():
        np.testing.assert_array_equal(out[name], want, err_msg=name)


def test_short_chunk_padded_to_n_rows(tiny_feature_map):
    plan = build_wire_plan(tiny_feature_map)
    cols = {
        "likes_level": np.array([1, 2], np.int32),
        "views_level": np.array([3, 4], np.int32),
        "item_id": np.array([199, 7], np.int32),
        "item_seq": np.array([[0] * 8, [0] * 6 + [5, 9]], np.int32),
    }
    out, _ = _roundtrip(cols, plan, 5)
    assert out["item_id"].shape == (5,)
    np.testing.assert_array_equal(out["item_id"], [199, 7, 0, 0, 0])
    np.testing.assert_array_equal(out["item_seq"][2:], np.zeros((3, 8)))


def test_value_capacity_buckets():
    # capacities repeat (bounded jit shapes) and never exceed the dense size
    n, s = 1000, 20
    caps = {value_capacity(L, n, s) for L in range(0, n * s + 1, 997)}
    assert len(caps) <= 9
    assert max(caps) <= n * s
    assert value_capacity(0, n, s) >= 1024


def test_pipeline_matches_bulk(tmp_path, tiny_experiment, tiny_feature_map):
    """End-to-end: pipelined submission == score_table probs, IDs in row
    order, valid zip, constant-memory chunking across several chunks."""
    from ctr_recommendation_tpu.data import ItemStore, write_synthetic_dataset
    from ctr_recommendation_tpu.data.parquet import load_split
    from ctr_recommendation_tpu.inference import (
        Predictor,
        run_submission_pipeline,
    )
    from ctr_recommendation_tpu.models import build_model

    root = str(tmp_path / "data")
    write_synthetic_dataset(
        root, num_rows=3000, valid_frac=0.1, test_frac=0.4,
        num_items=199, max_len=8, mm_dim=24, seed=0,
    )
    exp = tiny_experiment
    fm = tiny_feature_map
    module, params, state = build_model(fm, exp.model, jax.random.key(0))
    store = ItemStore.from_parquet(os.path.join(root, "item_info.parquet"))
    pred = Predictor(exp, params, state, fold_bn=True, item_store=store)

    test_path = os.path.join(root, "test.parquet")
    test = load_split(test_path, fm, include_label=False)
    bulk = pred.score_table(test, batch_size=128)

    out_dir = str(tmp_path / "out")
    n, csv_path, zip_path = run_submission_pipeline(
        test_path, pred, out_dir, batch_size=128, chunk_rows=256
    )
    assert n == test.num_rows
    assert csv_path == os.path.join(out_dir, "prediction_fibinet.csv")

    with open(os.path.join(out_dir, "prediction_fibinet.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["ID", "Task2"]
    assert [int(r[0]) for r in rows[1:]] == list(range(n))
    got = np.array([float(r[1]) for r in rows[1:]], np.float32)
    np.testing.assert_allclose(got, bulk, atol=2e-6)

    with zipfile.ZipFile(os.path.join(out_dir, "submission_fibinet.zip")) as z:
        assert z.testzip() is None
        assert z.namelist() == ["prediction_fibinet.csv"]


def test_pipeline_missing_column_raises(tmp_path, tiny_experiment):
    """A test parquet missing a model column fails with an actionable error
    (reader-thread exceptions propagate to the caller)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ctr_recommendation_tpu.inference import (
        Predictor,
        run_submission_pipeline,
    )
    from ctr_recommendation_tpu.models import build_model

    fm = build_feature_map(tiny_experiment.dataset)
    module, params, state = build_model(
        fm, tiny_experiment.model, jax.random.key(0)
    )
    pred = Predictor(tiny_experiment, params, state)
    path = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"likes_level": [1, 2, 3]}), path)
    with pytest.raises(KeyError, match="item_id"):
        run_submission_pipeline(path, pred, str(tmp_path / "o"), batch_size=4)


def test_hashed_table_rides_i32_and_roundtrips():
    """Hashed tables have unbounded raw ids (hashing happens on device):
    the wire plan must keep them full-width i32, including negative ids,
    and sequences on a hashed table still ride ragged."""
    import dataclasses

    from ctr_recommendation_tpu.config.loader import microlens_features
    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.schema import FeatureSpec, FeatureType

    exp = microlens_experiment(data_root="")
    feats = []
    for f in microlens_features(item_vocab=200, cate_vocab=11, max_len=8, mm_dim=16):
        if f.name == "item_id":
            f = dataclasses.replace(f, vocab_size=None, hash_buckets=512)
        feats.append(f)
    fm = build_feature_map(
        dataclasses.replace(exp.dataset, features=tuple(feats))
    )
    plan = build_wire_plan(fm)
    codes = {e.name: e.code for e in plan.entries}
    assert codes["item_id"] == "i32"
    assert codes["item_seq"] == "i32"  # shares the hashed table

    rng = np.random.default_rng(5)
    n = 64
    cols = {
        "likes_level": rng.integers(0, 11, n, dtype=np.int32),
        "views_level": rng.integers(0, 11, n, dtype=np.int32),
        # raw hashed-space ids: arbitrary int32 incl. negatives
        "item_id": rng.integers(-(2**31) + 1, 2**31 - 1, n, dtype=np.int64).astype(np.int32),
        "item_seq": np.where(
            rng.random((n, 8)) < 0.4,
            0,
            rng.integers(1, 2**31 - 1, size=(n, 8)),
        ).astype(np.int32),
    }
    buf, layout = pack_columns(cols, plan, n)
    out = jax.jit(build_unpacker(layout))(jnp.asarray(buf))
    for name, want in cols.items():
        np.testing.assert_array_equal(np.asarray(out[name]), want, err_msg=name)
