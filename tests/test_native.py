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


def test_submission_writer_matches_pandas():
    """Native CSV (submission.cc): byte parity with pandas to_csv including
    integral-float repr, plus append mode and a stdlib-readable zip."""
    import os
    import zipfile

    import pandas as pd
    import pytest

    if not native.submission_available():
        pytest.skip("native submission writer unavailable")
    tmp = "/tmp/test_native_submission"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(7)
    probs = rng.random(10_000).astype(np.float32)
    probs[:4] = [0.0, 1.0, np.float32(1e-8), np.float32(0.5)]
    native_csv = os.path.join(tmp, "native.csv")
    assert native.write_csv(probs, native_csv)
    pd_csv = os.path.join(tmp, "pd.csv")
    pd.DataFrame({"ID": np.arange(len(probs)), "Task2": probs}).to_csv(
        pd_csv, index=False
    )
    assert open(native_csv).read() == open(pd_csv).read()

    # append mode: ids continue from id_offset, no second header
    assert native.write_csv(probs[:3], native_csv, id_offset=len(probs), append=True)
    lines = open(native_csv).read().splitlines()
    assert len(lines) == 1 + len(probs) + 3
    assert lines[-3].split(",")[0] == str(len(probs))

    zip_path = os.path.join(tmp, "native.zip")
    assert native.zip_file(native_csv, zip_path, "prediction_fibinet.csv", 1)
    with zipfile.ZipFile(zip_path) as z:
        assert z.testzip() is None
        assert z.namelist() == ["prediction_fibinet.csv"]
        assert z.read("prediction_fibinet.csv") == open(native_csv, "rb").read()


def test_write_submission_uses_native_and_matches():
    """write_submission output parses back to the exact float32 probs."""
    import csv
    import os

    from ctr_recommendation_tpu.inference import write_submission

    rng = np.random.default_rng(3)
    probs = rng.random(5_000).astype(np.float32)
    csv_path, zip_path = write_submission(probs, "/tmp/test_native_submission/out")
    assert os.path.exists(zip_path)
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["ID", "Task2"]
    parsed = np.array([float(r[1]) for r in rows[1:]], np.float32)
    np.testing.assert_array_equal(parsed, probs)
