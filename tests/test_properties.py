"""Property-based fuzzing of the data/feature invariants.

Framework-level contracts that unit examples cannot cover exhaustively:
shard disjointness, exactly-once batch coverage, pad/truncate semantics
against a naive reference, and sparse id-remap equivalence — all over
hypothesis-generated shapes. Deadline disabled: jit compiles under CPU
pytest can take seconds on first example.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ctr_recommendation_tpu.data.parquet import TableData, _pad_sequences, iter_batches
from ctr_recommendation_tpu.features.feature_map import build_feature_map

SET = settings(max_examples=30, deadline=None)


@given(
    n=st.integers(0, 200),
    count=st.integers(1, 7),
)
@SET
def test_shard_disjoint_and_covering(n, count):
    data = TableData({"x": np.arange(n, dtype=np.int64)}, n)
    parts = [data.shard(i, count) for i in range(count)]
    seen = np.concatenate([p.columns["x"] for p in parts]) if n else np.array([])
    # disjoint + covering: every row exactly once across shards
    assert sorted(seen.tolist()) == list(range(n))
    # lockstep balance: shard sizes differ by at most 1
    sizes = [p.num_rows for p in parts]
    assert max(sizes) - min(sizes) <= 1


@given(
    n=st.integers(1, 300),
    bs=st.integers(1, 64),
    shuffle=st.booleans(),
    epoch=st.integers(0, 3),
)
@SET
def test_iter_batches_exactly_once_and_fixed_shape(n, bs, shuffle, epoch):
    from ctr_recommendation_tpu.config.schema import DatasetConfig, FeatureSpec, FeatureType

    ds = DatasetConfig(
        dataset_id="fuzz",
        features=(
            FeatureSpec(name="id", type=FeatureType.CATEGORICAL, vocab_size=1000),
            FeatureSpec(name="label", type=FeatureType.LABEL),
        ),
        label="label",
    )
    fm = build_feature_map(ds)
    rows = np.arange(n, dtype=np.int32)
    data = TableData({"id": rows, "label": (rows % 2).astype(np.float32)}, n)
    seen = []
    for batch in iter_batches(data, fm, bs, shuffle=shuffle, seed=7, epoch=epoch):
        assert len(batch["id"]) == bs  # fixed shape incl. padded tail
        w = batch["__weight__"]
        seen.extend(batch["id"][w > 0].tolist())
        assert np.all(batch["id"][w == 0] == rows[0])  # pads point at row 0
    assert sorted(seen) == list(range(n))  # every example exactly once

    if shuffle:
        # determinism: same (seed, epoch) -> same order
        again = []
        for batch in iter_batches(data, fm, bs, shuffle=True, seed=7, epoch=epoch):
            again.extend(batch["id"][batch["__weight__"] > 0].tolist())
        assert again == seen


@given(
    max_len=st.integers(1, 12),
    seqs=st.lists(
        st.lists(st.integers(1, 99), min_size=0, max_size=25), min_size=1, max_size=40
    ),
)
@SET
def test_pad_sequences_matches_naive(max_len, seqs):
    got = _pad_sequences(seqs, max_len, pad_id=0)
    assert got.shape == (len(seqs), max_len)
    for r, s in enumerate(seqs):
        tail = s[-max_len:]
        # left-padded, LAST max_len entries kept (dataloader.py:113-115)
        assert got[r, : max_len - len(tail)].tolist() == [0] * (max_len - len(tail))
        assert got[r, max_len - len(tail) :].tolist() == tail


@pytest.mark.slow  # many hypothesis examples x jit retraces (~45 s)
@given(
    vocab=st.integers(2, 64),
    n_ids=st.integers(1, 200),
    neg_frac=st.floats(0.0, 0.3),
)
@SET
def test_dedup_roundtrip_matches_plain_gather(vocab, n_ids, neg_frac):
    """rows[remap(ids)] == table[clamp(ids)] for random ids incl. negatives
    (the tolerant-pad semantics of training/sparse.remap_batch)."""
    import jax.numpy as jnp

    from ctr_recommendation_tpu.training.sparse import (
        dedup_ids_inverse,
        gather_rows,
    )

    rng = np.random.default_rng(n_ids * 31 + vocab)
    ids = rng.integers(0, vocab, size=(n_ids,)).astype(np.int32)
    table = jnp.asarray(rng.normal(size=(vocab, 4)).astype(np.float32))
    uids, inv = dedup_ids_inverse(jnp.asarray(ids), vocab)
    rows = gather_rows(table, uids)
    got = np.asarray(rows[inv])
    want = np.asarray(table)[ids]
    np.testing.assert_allclose(got, want)
    u = np.asarray(uids)
    assert np.all(np.diff(u) > 0)  # sorted AND strictly unique (sentinels too)
