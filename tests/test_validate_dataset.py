"""validate-dataset CLI: accepts a reference-layout directory, rejects each
contract violation with an actionable error (VERDICT r4 item 5).

The passing fixture is written via PANDAS with object-dtype list columns —
the exact on-disk layout the reference's own pandas writers produce
(readme.md:67-72: item_emb_d128 as a list of 128 floats per row) — not via
this repo's pyarrow writer, so the test cannot accidentally co-evolve with
the loader.
"""

import dataclasses

import numpy as np
import pandas as pd
import pytest

from ctr_recommendation_tpu.cli.validate_dataset import validate
from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features

VOCAB = 300
MM = 16


def _experiment(root):
    exp = microlens_experiment(data_root=str(root))
    return exp.replace(
        dataset=dataclasses.replace(
            exp.dataset,
            features=microlens_features(
                item_vocab=VOCAB, cate_vocab=11, max_len=8, mm_dim=MM
            ),
        )
    )


def _write_reference_layout(root, vocab=VOCAB, mm=MM, **mutate):
    """Pandas-style parquet dir; ``mutate`` overrides individual frames.
    Split ids stay in [1, vocab-1) so tests can delete item ``vocab-1``
    from item_info without colliding with the random rows."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    n_items = vocab - 1

    item_info = pd.DataFrame(
        {
            "item_id": np.arange(1, n_items + 1, dtype=np.int64),
            "item_emb_d128": [
                [float(x) for x in rng.normal(size=mm)] for _ in range(n_items)
            ],
        }
    )

    def split(n, with_label=True):
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 100, n).astype(np.int64),
                "likes_level": rng.integers(0, 11, n).astype(np.int64),
                "views_level": rng.integers(0, 11, n).astype(np.int64),
                "item_id": rng.integers(1, vocab - 1, n).astype(np.int64),
                "item_seq": [
                    [int(x) for x in rng.integers(1, vocab - 1, rng.integers(0, 12))]
                    for _ in range(n)
                ],
            }
        )
        if with_label:
            df["label"] = rng.integers(0, 2, n).astype(np.float64)
        return df

    frames = {
        "item_info": item_info,
        "train": split(400),
        "valid": split(100),
        "test": split(80, with_label=False),
    }
    frames.update(mutate)
    for name, df in frames.items():
        df.to_parquet(root / f"{name}.parquet", index=False)
    return frames


def _run(tmp_path, name, **mutate):
    root = tmp_path / name
    frames = _write_reference_layout(root, **mutate)
    logs = []
    rc = validate(str(root), exp=_experiment(root), log=logs.append)
    return rc, "\n".join(logs), frames


def test_reference_layout_passes(tmp_path):
    rc, out, _ = _run(tmp_path, "good")
    assert rc == 0, out
    assert "PASSED" in out


def test_expect_rows(tmp_path):
    root = tmp_path / "rows"
    _write_reference_layout(root)
    logs = []
    assert validate(str(root), exp=_experiment(root), log=logs.append,
                    expect_rows={"test": 80}) == 0
    logs = []
    assert validate(str(root), exp=_experiment(root), log=logs.append,
                    expect_rows={"test": 385024}) == 1
    assert "expected 385024 rows, found 80" in "\n".join(logs)


def test_missing_file(tmp_path):
    root = tmp_path / "nofile"
    _write_reference_layout(root)
    (root / "valid.parquet").unlink()
    logs = []
    rc = validate(str(root), exp=_experiment(root), log=logs.append)
    assert rc == 1
    assert any("missing valid parquet" in m for m in logs)


def test_wrong_emb_length(tmp_path):
    rng = np.random.default_rng(1)
    bad = pd.DataFrame(
        {
            "item_id": np.arange(1, VOCAB, dtype=np.int64),
            "item_emb_d128": [
                [float(x) for x in rng.normal(size=MM - 1)]
                for _ in range(VOCAB - 1)
            ],
        }
    )
    rc, out, _ = _run(tmp_path, "floorlen", item_info=bad)
    assert rc == 1
    assert f"do not hold exactly {MM} floats" in out


def test_non_list_emb_column(tmp_path):
    bad = pd.DataFrame(
        {
            "item_id": np.arange(1, VOCAB, dtype=np.int64),
            "item_emb_d128": np.zeros(VOCAB - 1),
        }
    )
    rc, out, _ = _run(tmp_path, "nonlist", item_info=bad)
    assert rc == 1
    assert "must be LIST-valued" in out


def test_duplicate_item_ids(tmp_path):
    rng = np.random.default_rng(2)
    dup = pd.DataFrame(
        {
            "item_id": np.ones(10, np.int64),
            "item_emb_d128": [
                [float(x) for x in rng.normal(size=MM)] for _ in range(10)
            ],
        }
    )
    rc, out, _ = _run(tmp_path, "dup", item_info=dup)
    assert rc == 1
    assert "duplicate ids" in out


def test_missing_model_column(tmp_path):
    frames = _write_reference_layout(tmp_path / "tmpl")
    bad = frames["train"].drop(columns=["likes_level"])
    rc, out, _ = _run(tmp_path, "nocol", train=bad)
    assert rc == 1
    assert "missing model column 'likes_level'" in out


def test_out_of_vocab_ids(tmp_path):
    frames = _write_reference_layout(tmp_path / "tmpl2")
    bad = frames["valid"].copy()
    bad.loc[0, "item_id"] = VOCAB + 50  # outside the table bound
    # keep item_info referential check quiet about it: the vocab bound
    # error must fire on its own
    rc, out, _ = _run(tmp_path, "oov", valid=bad)
    assert rc == 1
    assert f"ids outside [0, {VOCAB})" in out


def test_unknown_train_item_errors_unknown_test_item_warns(tmp_path):
    frames = _write_reference_layout(tmp_path / "tmpl3")
    # id 299 is inside the vocab bound but absent from item_info
    items = frames["item_info"][frames["item_info"].item_id != VOCAB - 1]
    bad_train = frames["train"].copy()
    bad_train.loc[0, "item_id"] = VOCAB - 1
    rc, out, _ = _run(tmp_path, "unktrain", item_info=items, train=bad_train)
    assert rc == 1
    assert "not present in item_info" in out and "training raises" in out

    bad_test = frames["test"].copy()
    bad_test.loc[0, "item_id"] = VOCAB - 1
    rc, out, _ = _run(tmp_path, "unktest", item_info=items, test=bad_test)
    assert rc == 0  # warning only: inference zero-fills
    assert "zero vectors" in out


def test_bad_labels(tmp_path):
    frames = _write_reference_layout(tmp_path / "tmpl4")
    bad = frames["train"].copy()
    bad["label"] = np.linspace(-1, 2, len(bad))
    rc, out, _ = _run(tmp_path, "badlab", train=bad)
    assert rc == 1
    assert "label values outside [0, 1]" in out


def test_soft_labels_warn_only(tmp_path):
    frames = _write_reference_layout(tmp_path / "tmpl5")
    soft = frames["valid"].copy()
    soft["label"] = np.linspace(0.1, 0.9, len(soft))
    rc, out, _ = _run(tmp_path, "softlab", valid=soft)
    assert rc == 0
    assert "soft (non-binary) labels" in out


def test_cli_main(tmp_path):
    """argparse surface: --expect-rows parsing + exit code."""
    from ctr_recommendation_tpu.cli.validate_dataset import main

    root = tmp_path / "cli"
    # main() builds the full MicroLens experiment: write the fixture at the
    # real contract dims (128-d vectors, ids inside vocab 91718)
    _write_reference_layout(root, mm=128)
    assert main(["--data-root", str(root), "--expect-rows", "test=80"]) == 0
