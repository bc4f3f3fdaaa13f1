"""End-to-end: synthetic parquet -> few-epoch train -> AUC sanity -> resume ->
predict -> submission file. The SURVEY §4 integration-test gap, filled."""

import dataclasses
import os

import numpy as np
import pytest

from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features
from ctr_recommendation_tpu.data import ItemStore, iter_batches, load_split, write_synthetic_dataset
from ctr_recommendation_tpu.features import build_feature_map
from ctr_recommendation_tpu.inference import Predictor, write_submission
from ctr_recommendation_tpu.training import Trainer

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    paths = write_synthetic_dataset(
        str(root), num_rows=6000, num_items=400, max_len=8, mm_dim=24, seed=11
    )
    exp = microlens_experiment(
        data_root=str(root),
        embedding_dim=16,
        hidden_units=(64, 32),
        batch_size=256,
        epochs=3,
        max_len=8,
        learning_rate=2e-3,
        use_pallas=False,
        checkpoint_dir=str(root / "ckpt"),
        log_every=1000,
    )
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=401, cate_vocab=11, max_len=8, mm_dim=24),
    )
    exp = exp.replace(dataset=ds)
    fm = build_feature_map(ds)
    train = load_split(paths["train"], fm)
    valid = load_split(paths["valid"], fm)
    test = load_split(paths["test"], fm, include_label=False)
    store = ItemStore.from_parquet(paths["item_info"])
    return exp, fm, train, valid, test, store, root


def _loaders(exp, fm, train, valid, store):
    bs = exp.train.batch_size

    def train_batches(epoch):
        return iter_batches(
            train, fm, bs, shuffle=True, seed=exp.train.seed, epoch=epoch,
            item_store=store, drop_last=True,
        )

    def valid_batches():
        return iter_batches(valid, fm, bs, item_store=store)

    return train_batches, valid_batches


def test_train_learns_signal_and_resumes(setup):
    exp, fm, train, valid, test, store, root = setup
    spe = train.num_rows // exp.train.batch_size
    trainer = Trainer(exp, steps_per_epoch=spe, log_fn=lambda s: None)
    train_batches, valid_batches = _loaders(exp, fm, train, valid, store)
    history = trainer.fit(train_batches, valid_batches)
    assert len(history) == 3
    aucs = [h["auc"] for h in history]
    # planted signal must be learnable well above chance
    assert max(aucs) > 0.62, aucs
    # loss decreasing
    assert history[-1]["train_loss"] < history[0]["train_loss"]

    # ---- resume from checkpoint: a fresh trainer picks up at epoch 3 ----
    exp2 = exp.replace(train=dataclasses.replace(exp.train, epochs=4))
    trainer2 = Trainer(exp2, steps_per_epoch=spe, log_fn=lambda s: None)
    h2 = trainer2.fit(train_batches, valid_batches, resume=True)
    assert len(h2) == 1  # only epoch 4 ran
    assert int(trainer2.state.step) == 4 * spe

    # ---- predict + submission ----
    trainer.load_best()
    pred = Predictor(exp, trainer.state.params, trainer.state.model_state)
    test_batches = iter_batches(test, fm, exp.train.batch_size, item_store=store)
    probs = pred.predict_all(test_batches)
    assert probs.shape == (test.num_rows,)
    assert np.all((probs >= 0) & (probs <= 1))
    csv_path, zip_path = write_submission(probs, str(root / "out"))
    assert os.path.exists(zip_path)
    with open(csv_path) as f:
        header = f.readline().strip()
    assert header == "ID,Task2"

    # ---- evaluate CLI: checkpoint -> AUC/logloss on the valid split ----
    from ctr_recommendation_tpu.cli import evaluate as evaluate_cli

    rc = evaluate_cli.main(
        [
            "--data-root", str(root),
            "--split", "valid",
            "--checkpoint-dir", exp.train.checkpoint_dir,
            "--batch-size", "256",
        ]
    )
    assert rc == 0

    # ---- predict CLI: bulk (score_table) vs --stream row-group scoring
    # must write identical submissions (row order + probabilities) ----
    import csv

    from ctr_recommendation_tpu.cli import predict as predict_cli

    for flag, out in (([], "out_bulk"), (["--stream"], "out_stream")):
        rc = predict_cli.main(
            [
                "--data-root", str(root),
                "--checkpoint-dir", exp.train.checkpoint_dir,
                "--out-dir", str(root / out),
                "--batch-size", "256",
            ]
            + flag
        )
        assert rc == 0
    read = lambda p: [
        float(r[1]) for r in list(csv.reader(open(p)))[1:]
    ]
    bulk = read(str(root / "out_bulk" / "prediction_fibinet.csv"))
    stream = read(str(root / "out_stream" / "prediction_fibinet.csv"))
    assert len(bulk) == test.num_rows
    np.testing.assert_allclose(bulk, stream, atol=2e-6)


def test_bn_folded_predictor_matches_unfolded(setup):
    exp, fm, train, valid, test, store, root = setup
    trainer = Trainer(exp, steps_per_epoch=10, log_fn=lambda s: None)
    # single quick epoch to move BN stats off init
    train_batches, _ = _loaders(exp, fm, train, valid, store)
    it = train_batches(0)
    for i, b in enumerate(it):
        trainer.state, _ = trainer._train_step(
            trainer.state, trainer.put_batch(b), __import__("jax").random.key(0)
        )
        if i >= 3:
            break
    batch = next(iter(iter_batches(valid, fm, 256, item_store=store)))
    # exact fold algebra, verified in fp32 (the default bf16 compute path
    # now genuinely runs bf16 matmuls, whose rounding swamps a tight
    # tolerance; the dtype itself is pinned by test_ops dtype tests)
    import dataclasses

    exp32 = exp.replace(
        train=dataclasses.replace(exp.train, compute_dtype="float32"),
        model=dataclasses.replace(exp.model, tower_dtype="float32"),
    )
    folded = Predictor(exp32, trainer.state.params, trainer.state.model_state, fold_bn=True)
    plain = Predictor(exp32, trainer.state.params, trainer.state.model_state, fold_bn=False)
    np.testing.assert_allclose(
        np.asarray(folded(batch)), np.asarray(plain(batch)), rtol=1e-4, atol=1e-5
    )
    # and at the default (bf16) dtypes, folding must preserve the ranking
    folded_bf = Predictor(exp, trainer.state.params, trainer.state.model_state, fold_bn=True)
    plain_bf = Predictor(exp, trainer.state.params, trainer.state.model_state, fold_bn=False)
    a = np.asarray(folded_bf(batch), np.float64)
    b = np.asarray(plain_bf(batch), np.float64)
    np.testing.assert_allclose(a, b, atol=2e-2)
    corr = np.corrcoef(np.argsort(np.argsort(a)), np.argsort(np.argsort(b)))[0, 1]
    assert corr > 0.995, corr


def test_training_with_pallas_matches_jnp_path(setup):
    """use_pallas now applies to TRAINING too (hand-written Pallas backward,
    VERDICT r3 item 2): a short fit with the fused kernel fwd+bwd must track
    the jnp path's loss trajectory step-for-step at fp32 compute."""
    import jax

    exp, fm, train, valid, test, store, root = setup
    spe = train.num_rows // exp.train.batch_size
    results = {}
    for pallas in (False, True):
        e = exp.replace(
            model=dataclasses.replace(
                exp.model, use_pallas=pallas, tower_dtype="float32"
            ),
            train=dataclasses.replace(
                exp.train,
                epochs=1,
                compute_dtype="float32",
                checkpoint_dir=str(root / f"ckpt_pallas_{pallas}"),
            ),
        )
        trainer = Trainer(e, steps_per_epoch=spe, log_fn=lambda s: None)
        losses = []
        rng = jax.random.key(0)
        for i, b in enumerate(
            iter_batches(
                train, fm, e.train.batch_size, shuffle=True, seed=7, epoch=0,
                item_store=store, drop_last=True,
            )
        ):
            trainer.state, m = trainer._train_step(
                trainer.state, trainer.put_batch(b), rng
            )
            losses.append(float(m["loss"]))
            if i >= 9:
                break
        results[pallas] = np.array(losses)
    np.testing.assert_allclose(results[True], results[False], rtol=2e-4, atol=2e-4)
    # the late-step losses must actually have moved (optimizer engaged)
    assert results[True][-1] < results[True][0]
