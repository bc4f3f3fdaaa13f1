"""Streaming reader: full coverage, fixed shapes, host sharding, shuffling."""

import dataclasses

import numpy as np
import pytest

from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features
from ctr_recommendation_tpu.data import load_split, write_synthetic_dataset
from ctr_recommendation_tpu.data.streaming import stream_batches
from ctr_recommendation_tpu.features import build_feature_map


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    paths = write_synthetic_dataset(
        str(root), num_rows=3000, num_items=200, max_len=8, mm_dim=16, seed=3
    )
    exp = microlens_experiment(data_root=str(root), max_len=8)
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=201, cate_vocab=11, max_len=8, mm_dim=16),
    )
    fm = build_feature_map(ds)
    return paths, fm


def test_stream_covers_all_rows_fixed_shapes(synth):
    paths, fm = synth
    ref = load_split(paths["train"], fm)
    batches = list(stream_batches(paths["train"], fm, 128))
    assert all(b["item_id"].shape == (128,) for b in batches)
    assert all(b["item_seq"].shape == (128, 8) for b in batches)
    total = sum(int(b["__weight__"].sum()) for b in batches)
    assert total == ref.num_rows
    # same multiset of item ids as the in-memory loader
    got = np.sort(
        np.concatenate([b["item_id"][b["__weight__"] > 0] for b in batches])
    )
    want = np.sort(ref.columns["item_id"])
    np.testing.assert_array_equal(got, want)


def test_stream_host_sharding_partitions(synth):
    paths, fm = synth
    ref = load_split(paths["train"], fm)
    all_ids = []
    for h in range(2):
        for b in stream_batches(
            paths["train"], fm, 128, host_index=h, host_count=2
        ):
            all_ids.append(b["item_id"][b["__weight__"] > 0])
    got = np.sort(np.concatenate(all_ids))
    np.testing.assert_array_equal(got, np.sort(ref.columns["item_id"]))


def test_stream_shuffle_deterministic_and_epoch_varying(synth):
    paths, fm = synth
    a = [b["item_id"] for b in stream_batches(paths["train"], fm, 128, shuffle=True, seed=1, epoch=0)]
    b = [b["item_id"] for b in stream_batches(paths["train"], fm, 128, shuffle=True, seed=1, epoch=0)]
    c = [b["item_id"] for b in stream_batches(paths["train"], fm, 128, shuffle=True, seed=1, epoch=1)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    assert not np.array_equal(np.concatenate(a), np.concatenate(c))
