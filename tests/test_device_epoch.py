"""On-device epoch scan (fit_on_device) == per-batch fit semantics."""

import dataclasses

import numpy as np
import pytest

from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features
from ctr_recommendation_tpu.data import ItemStore, load_split, write_synthetic_dataset
from ctr_recommendation_tpu.features import build_feature_map
from ctr_recommendation_tpu.training import Trainer

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("devep")
    paths = write_synthetic_dataset(
        str(root), num_rows=5000, num_items=300, max_len=8, mm_dim=24, seed=5
    )
    exp = microlens_experiment(
        data_root=str(root), embedding_dim=16, hidden_units=(32, 16),
        batch_size=256, epochs=3, max_len=8, use_pallas=False,
        checkpoint_dir=str(root / "ckpt"), log_every=10_000,
        learning_rate=2e-3,
    )
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=301, cate_vocab=11, max_len=8, mm_dim=24),
    )
    exp = exp.replace(dataset=ds)
    fm = build_feature_map(ds)
    train = load_split(paths["train"], fm)
    valid = load_split(paths["valid"], fm)
    store = ItemStore.from_parquet(paths["item_info"])
    return exp, fm, train, valid, store


def test_fit_on_device_learns(setup):
    exp, fm, train, valid, store = setup
    spe = train.num_rows // exp.train.batch_size
    trainer = Trainer(
        exp, steps_per_epoch=spe, item_store=store, log_fn=lambda s: None
    )
    history = trainer.fit_on_device(train, valid)
    assert len(history) == 3
    aucs = [h["auc"] for h in history]
    assert max(aucs) > 0.62, aucs
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert int(trainer.state.step) == 3 * spe

    # resume picks up at the right epoch
    exp2 = exp.replace(train=dataclasses.replace(exp.train, epochs=4))
    t2 = Trainer(exp2, steps_per_epoch=spe, item_store=store, log_fn=lambda s: None)
    h2 = t2.fit_on_device(train, valid, resume=True)
    assert len(h2) == 1
    assert int(t2.state.step) == 4 * spe
