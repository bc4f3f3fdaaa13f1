"""Native C++ host-pipeline kernels: build, parity with the Python padder."""

import numpy as np
import pyarrow as pa

from ctr_recommendation_tpu.data import native
from ctr_recommendation_tpu.data.parquet import _pad_list_column, _pad_sequences


def test_native_library_builds():
    assert native.available(), "g++ build of pad_seq.cc failed"


def test_pad_from_offsets_matches_python():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 100, size=rng.integers(0, 12)).tolist() for _ in range(500)]
    values = np.concatenate([np.asarray(s, np.int64) for s in seqs if s] or [np.zeros(0, np.int64)])
    offsets = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    got = native.pad_sequences_from_offsets(values, offsets, max_len=8, pad_id=0)
    want = _pad_sequences(seqs, 8, 0)
    np.testing.assert_array_equal(got, want)


def test_pad_list_column_arrow_path():
    seqs = [[1, 2, 3], [], [4] * 30, [5, 6]]
    col = pa.chunked_array([pa.array(seqs[:2]), pa.array(seqs[2:])])
    got = _pad_list_column(col, 8, 0)
    want = _pad_sequences(seqs, 8, 0)
    np.testing.assert_array_equal(got, want)
    # truncation keeps the LAST entries
    assert got[2].tolist() == [4] * 8
