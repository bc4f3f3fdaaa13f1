"""fit_on_device on a multi-device data-parallel mesh (8 fake CPU devices)."""

import dataclasses

import numpy as np
import pytest

from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features
from ctr_recommendation_tpu.config.schema import MeshConfig
from ctr_recommendation_tpu.data import ItemStore, load_split, write_synthetic_dataset
from ctr_recommendation_tpu.features import build_feature_map
from ctr_recommendation_tpu.parallel.mesh import make_mesh
from ctr_recommendation_tpu.training import Trainer

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop


def test_fit_on_device_mp8_sharded_tables(tmp_path):
    """Epoch scan with the shard_map row-sharded embedding lookup (1x8 mesh)."""
    from ctr_recommendation_tpu.parallel.embedding import make_sharded_lookup

    paths = write_synthetic_dataset(
        str(tmp_path / "d"), num_rows=2000, num_items=300, max_len=8, mm_dim=24, seed=10
    )
    exp = microlens_experiment(
        data_root=str(tmp_path / "d"), embedding_dim=16, hidden_units=(32, 16),
        batch_size=256, epochs=1, max_len=8, use_pallas=False,
        checkpoint_dir=str(tmp_path / "ckpt_mp"), learning_rate=2e-3,
    )
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=301, cate_vocab=11, max_len=8, mm_dim=24),
    )
    exp = exp.replace(dataset=ds, mesh=MeshConfig(data_parallel=1, model_parallel=8))
    fm = build_feature_map(ds)
    train = load_split(paths["train"], fm)
    store = ItemStore.from_parquet(paths["item_info"])
    mesh = make_mesh(exp.mesh)
    spe = train.num_rows // exp.train.batch_size
    trainer = Trainer(
        exp, mesh=mesh, steps_per_epoch=spe, item_store=store,
        lookup=make_sharded_lookup(mesh), log_fn=lambda s: None,
    )
    history = trainer.fit_on_device(train)
    assert np.isfinite(history[-1]["train_loss"])
    assert int(trainer.state.step) == spe


def test_fit_on_device_dp8(tmp_path):
    paths = write_synthetic_dataset(
        str(tmp_path), num_rows=4000, num_items=300, max_len=8, mm_dim=24, seed=9
    )
    exp = microlens_experiment(
        data_root=str(tmp_path), embedding_dim=16, hidden_units=(32, 16),
        batch_size=256, epochs=2, max_len=8, use_pallas=False,
        checkpoint_dir=str(tmp_path / "ckpt"), learning_rate=2e-3,
    )
    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=301, cate_vocab=11, max_len=8, mm_dim=24),
    )
    exp = exp.replace(
        dataset=ds, mesh=MeshConfig(data_parallel=8, model_parallel=1)
    )
    fm = build_feature_map(ds)
    train = load_split(paths["train"], fm)
    valid = load_split(paths["valid"], fm)
    store = ItemStore.from_parquet(paths["item_info"])

    mesh = make_mesh(exp.mesh)
    spe = train.num_rows // exp.train.batch_size
    trainer = Trainer(
        exp, mesh=mesh, steps_per_epoch=spe, item_store=store, log_fn=lambda s: None
    )
    history = trainer.fit_on_device(train, valid)
    assert len(history) == 2
    assert np.isfinite(history[-1]["train_loss"])
    assert history[-1]["auc"] > 0.55
    assert int(trainer.state.step) == 2 * spe
