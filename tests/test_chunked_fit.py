"""Chunked dispatch (steps_per_dispatch=K) == per-batch dispatch, exactly.

VERDICT r2 item 3: the host-driven ``fit`` paths (streaming / strict-items /
multi-host) were per-step dispatch-bound; K batches now run as one jitted
K-step scan. The math must be bit-identical in structure to the per-batch
path: same batches, same per-step rng fold (by state.step), same optimizer
sequence — so trajectories and final params must agree to float tolerance,
including when the epoch's step count is not divisible by K (tail chunk).
"""

import dataclasses

import numpy as np
import pytest

from ctr_recommendation_tpu.data import ItemStore, iter_batches, load_split
from ctr_recommendation_tpu.data.synthetic import write_synthetic_dataset
from ctr_recommendation_tpu.features import build_feature_map
from ctr_recommendation_tpu.training import Trainer

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop


@pytest.fixture(scope="module")
def setup(tmp_path_factory, tiny_experiment):
    root = str(tmp_path_factory.mktemp("chunked"))
    paths = write_synthetic_dataset(
        root, num_rows=2000, num_items=100, max_len=8, mm_dim=24, seed=7
    )
    fm = build_feature_map(tiny_experiment.dataset)
    train = load_split(paths["train"], fm)
    valid = load_split(paths["valid"], fm)
    store = ItemStore.from_parquet(paths["item_info"])
    return root, fm, train, valid, store


def _fit(tiny_experiment, setup, k, tag):
    root, fm, train, valid, store = setup
    bs = 128
    exp = tiny_experiment.replace(
        train=dataclasses.replace(
            tiny_experiment.train,
            batch_size=bs,
            epochs=2,
            steps_per_dispatch=k,
            checkpoint_dir=f"{root}/ck_{tag}",
        )
    )
    steps = train.num_rows // bs  # 11 steps -> tail chunk of 3 at k=4
    trainer = Trainer(
        exp, steps_per_epoch=steps, item_store=store, log_fn=lambda s: None
    )

    def train_batches(epoch):
        return iter_batches(
            train, fm, bs, shuffle=True, seed=exp.train.seed, epoch=epoch,
            drop_last=True,
        )

    def valid_batches():
        return iter_batches(valid, fm, bs)

    hist = trainer.fit(train_batches, valid_batches)
    return hist, trainer.state


def test_chunked_fit_matches_per_batch(tiny_experiment, setup):
    hist1, state1 = _fit(tiny_experiment, setup, 1, "k1")
    hist4, state4 = _fit(tiny_experiment, setup, 4, "k4")

    assert int(state1.step) == int(state4.step)
    for h1, h4 in zip(hist1, hist4):
        np.testing.assert_allclose(h1["train_loss"], h4["train_loss"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1["auc"], h4["auc"], rtol=1e-5, atol=1e-5)
    import jax

    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_iterator_groups_and_flushes():
    from ctr_recommendation_tpu.training.loop import Trainer

    batches = [{"a": np.zeros((4,), np.float32)} for _ in range(7)]
    chunks = list(Trainer._chunked(iter(batches), 3))
    assert [len(c) for c in chunks] == [3, 3, 1]
    # a shape change mid-stream flushes the open chunk
    ragged = batches[:2] + [{"a": np.zeros((2,), np.float32)}] + batches[3:5]
    chunks = list(Trainer._chunked(iter(ragged), 3))
    assert [len(c) for c in chunks] == [2, 1, 2]


def test_wire_dtype_narrowing(tiny_experiment):
    """put_chunk's wire plan: binary labels/weights and small-vocab
    categoricals ride uint8, big-vocab ids stay int32, soft labels stay
    f32, placeholder columns are dropped, and a later chunk violating the
    first-chunk plan WIDENS that column for the rest of the stream (one
    retrace) instead of aborting the run."""
    tr = Trainer(tiny_experiment, total_steps=4, log_fn=lambda s: None)
    rng = np.random.default_rng(0)
    n = 8

    def batch(label):
        return {
            "user_id": rng.integers(0, 50, size=n).astype(np.int32),
            "likes_level": rng.integers(0, 11, size=n).astype(np.int32),
            "views_level": rng.integers(0, 11, size=n).astype(np.int32),
            "item_id": rng.integers(1, 200, size=n).astype(np.int32),
            "item_seq": rng.integers(0, 200, size=(n, 8)).astype(np.int32),
            "label": label,
        }

    hard = batch((rng.random(n) < 0.5).astype(np.float32))
    out = tr.put_chunk([hard, hard])
    assert "user_id" not in out  # placeholder dropped from the wire
    assert out["likes_level"].dtype == np.uint8
    assert out["views_level"].dtype == np.uint8
    assert out["label"].dtype == np.uint8
    # the tiny fixture's item vocab (200) fits uint8 for both the
    # categorical id and the sequence; at MicroLens scale (91718) they
    # ride the 24-bit split encoding instead (test below)
    assert out["item_id"].dtype == np.uint8
    assert out["item_seq"].dtype == np.uint8

    # a later chunk with soft labels violates the uint8 plan -> the label
    # column widens back to f32 (exact values preserved) and STAYS wide
    logs = []
    tr.log = logs.append
    soft = batch(rng.random(n).astype(np.float32))
    out_soft = tr.put_chunk([soft, soft])
    assert out_soft["label"].dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(out_soft["label"]), np.stack([soft["label"]] * 2)
    )
    assert any("widening" in m for m in logs)
    out_hard2 = tr.put_chunk([hard, hard])
    assert out_hard2["label"].dtype == np.float32  # plan stays widened

    # a fresh trainer seeing soft labels FIRST keeps f32 on the wire
    tr2 = Trainer(
        tiny_experiment.replace(
            train=dataclasses.replace(
                tiny_experiment.train, checkpoint_dir="/tmp/wire_soft"
            )
        ),
        total_steps=4,
        log_fn=lambda s: None,
    )
    out2 = tr2.put_chunk([soft, soft])
    assert out2["label"].dtype == np.float32


def _mid_vocab_experiment(tiny_experiment, item_vocab, ckpt):
    from ctr_recommendation_tpu.config.loader import microlens_features

    ds = dataclasses.replace(
        tiny_experiment.dataset,
        features=microlens_features(
            item_vocab=item_vocab, cate_vocab=11, max_len=8, mm_dim=24
        ),
    )
    return tiny_experiment.replace(
        dataset=ds,
        train=dataclasses.replace(tiny_experiment.train, checkpoint_dir=ckpt),
    )


def test_wire_split24_roundtrip(tiny_experiment, tmp_path):
    """MicroLens-scale id columns (256 < vocab <= 2^24) ride the wire as
    uint16 low + uint8 high (3 B/element) and reconstruct exactly; a
    mid-vocab (<= 2^16) table rides plain uint16; out-of-range later chunks
    widen that column to full-width instead of silently wrapping."""
    exp = _mid_vocab_experiment(tiny_experiment, 70_000, str(tmp_path / "ck"))
    tr = Trainer(exp, total_steps=4, log_fn=lambda s: None)
    rng = np.random.default_rng(1)
    n = 8

    def batch(hi):
        return {
            "user_id": rng.integers(0, 50, size=n).astype(np.int32),
            "likes_level": rng.integers(0, 11, size=n).astype(np.int32),
            "views_level": rng.integers(0, 11, size=n).astype(np.int32),
            "item_id": rng.integers(1, hi, size=n).astype(np.int32),
            "item_seq": rng.integers(0, hi, size=(n, 8)).astype(np.int32),
            "label": (rng.random(n) < 0.5).astype(np.float32),
        }

    b = batch(70_000)
    out = tr.put_chunk([b, b])
    for col in ("item_id", "item_seq"):
        assert col not in out
        lo = np.asarray(out[col + "__lo16"])
        hi = np.asarray(out[col + "__hi8"])
        assert lo.dtype == np.uint16 and hi.dtype == np.uint8
        recon = lo.astype(np.int64) | (hi.astype(np.int64) << 16)
        np.testing.assert_array_equal(recon, np.stack([b[col], b[col]]))

    # id outside 24 bits on a later chunk -> that column widens to int32
    # for the rest of the stream (never a silent wrap); others stay packed
    bad = batch(70_000)
    bad["item_seq"][0, 0] = 1 << 24
    out_bad = tr.put_chunk([bad, bad])
    assert out_bad["item_seq"].dtype == np.int32
    np.testing.assert_array_equal(
        np.asarray(out_bad["item_seq"]), np.stack([bad["item_seq"]] * 2)
    )
    assert "item_id__lo16" in out_bad  # unaffected columns keep the plan

    # 256 < vocab <= 2^16 rides plain uint16
    exp16 = _mid_vocab_experiment(tiny_experiment, 30_000, str(tmp_path / "ck16"))
    tr16 = Trainer(exp16, total_steps=4, log_fn=lambda s: None)
    b16 = batch(30_000)
    out16 = tr16.put_chunk([b16, b16])
    assert out16["item_id"].dtype == np.uint16
    assert out16["item_seq"].dtype == np.uint16


def test_wire_split24_fit_parity(tiny_experiment, tmp_path):
    """End-to-end: a chunked fit with the split24 wire encoding reproduces
    the un-narrowed (int32-wire) trajectory exactly — the device-side
    recombination in the chunk scan is lossless."""
    root = str(tmp_path)
    paths = write_synthetic_dataset(
        root, num_rows=600, num_items=70_000, max_len=8, mm_dim=24, seed=9
    )

    def run(tag, disable_narrowing):
        exp = _mid_vocab_experiment(tiny_experiment, 70_001, f"{root}/ck_{tag}")
        exp = exp.replace(
            train=dataclasses.replace(
                exp.train, batch_size=64, epochs=1, steps_per_dispatch=3,
                checkpoint_dir=f"{root}/ck_{tag}",
            )
        )
        fm = build_feature_map(exp.dataset)
        train = load_split(paths["train"], fm)
        store = ItemStore.from_parquet(paths["item_info"])
        steps = train.num_rows // 64
        tr = Trainer(exp, steps_per_epoch=steps, item_store=store,
                     log_fn=lambda s: None)
        if disable_narrowing:
            tr._wire_plan = {}  # force full-width wire
        hist = tr.fit(
            lambda epoch: iter_batches(
                train, fm, 64, shuffle=True, seed=exp.train.seed,
                epoch=epoch, drop_last=True,
            )
        )
        return hist, tr.state

    hist_n, state_n = run("narrow", False)
    hist_w, state_w = run("wide", True)
    for hn, hw in zip(hist_n, hist_w):
        np.testing.assert_allclose(hn["train_loss"], hw["train_loss"],
                                   rtol=1e-6, atol=1e-7)
    import jax

    for a, b in zip(jax.tree.leaves(state_n.params),
                    jax.tree.leaves(state_w.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_soft_labels_mid_stream_complete_training(tiny_experiment, setup):
    """A mid-stream chunk whose labels turn soft (f32 in (0,1)) must NOT
    abort the run: the label column widens on the wire and the remaining
    chunks train through (VERDICT r4 item 7)."""
    root, fm, train, valid, store = setup
    bs = 128
    exp = tiny_experiment.replace(
        train=dataclasses.replace(
            tiny_experiment.train, batch_size=bs, epochs=1,
            steps_per_dispatch=3, checkpoint_dir=f"{root}/ck_softmid",
        )
    )
    steps = train.num_rows // bs
    logs = []
    tr = Trainer(exp, steps_per_epoch=steps, item_store=store,
                 log_fn=logs.append)

    def train_batches(epoch):
        rng = np.random.default_rng(5)
        for i, b in enumerate(
            iter_batches(train, fm, bs, shuffle=True, seed=1, epoch=epoch,
                         drop_last=True)
        ):
            if i >= steps // 2:  # labels turn soft mid-stream
                b = dict(b)
                b["label"] = rng.uniform(0.1, 0.9, size=bs).astype(np.float32)
            yield b

    hist = tr.fit(train_batches)
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])
    assert int(tr.state.step) == steps
    assert any("widening" in m for m in logs)


def test_streaming_binned_evaluate_matches_exact(tiny_experiment, setup):
    """Trainer.evaluate with num_eval_threshold_bins accumulates per batch
    (no full prediction vector) and lands within 1e-3 of the exact
    sort-based AUC over the same iterator (VERDICT r4 item 7)."""
    root, fm, train, valid, store = setup
    bs = 64  # several batches -> the accumulator actually streams
    exp_exact = tiny_experiment.replace(
        train=dataclasses.replace(
            tiny_experiment.train, checkpoint_dir=f"{root}/ck_ev_exact"
        )
    )
    exp_binned = tiny_experiment.replace(
        train=dataclasses.replace(
            tiny_experiment.train, num_eval_threshold_bins=4096,
            checkpoint_dir=f"{root}/ck_ev_binned",
        )
    )
    m = {}
    for tag, exp in (("exact", exp_exact), ("binned", exp_binned)):
        tr = Trainer(exp, steps_per_epoch=1, item_store=store,
                     log_fn=lambda s: None)
        m[tag] = tr.evaluate(iter_batches(valid, fm, bs, item_store=store))
    assert abs(m["binned"]["auc"] - m["exact"]["auc"]) < 1e-3
    np.testing.assert_allclose(
        m["binned"]["logloss"], m["exact"]["logloss"], atol=1e-5
    )
