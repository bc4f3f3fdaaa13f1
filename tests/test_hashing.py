"""Hash-trick vocabularies: unbounded ids -> fixed tables, on device.

The reference KeyErrors on unseen train item ids and hardcodes table sizes;
hash_buckets makes any int id safe (features/hashing.py). Contracts: hashes
land in [1, buckets) (row 0 reserved = pad), pad ids map to themselves,
deterministic, and the whole train/eval/predict/sparse stack runs with
hashed tables and ids far outside any declared vocab.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features
from ctr_recommendation_tpu.config.schema import FeatureSpec, FeatureType
from ctr_recommendation_tpu.features import build_feature_map
from ctr_recommendation_tpu.features.hashing import hash_ids
from __graft_entry__ import _fake_batch


def test_hash_ids_contracts():
    buckets = 97
    ids = jnp.asarray([0, 1, 2, 96, 97, 10**9, -5, -(2**31) + 1], jnp.int32)
    h = np.asarray(hash_ids(ids, buckets, pad_id=0))
    assert h[0] == 0  # pad preserved
    assert np.all(h[1:] >= 1) and np.all(h[1:] < buckets)
    # deterministic
    h2 = np.asarray(hash_ids(ids, buckets, pad_id=0))
    assert np.array_equal(h, h2)
    # same id -> same row; a spread of ids is not constant
    many = np.asarray(hash_ids(jnp.arange(1, 1000, dtype=jnp.int32), buckets))
    assert len(np.unique(many)) > buckets // 2


def _hashed_experiment(buckets=128):
    exp = microlens_experiment(
        data_root="", embedding_dim=16, hidden_units=(32, 16), batch_size=64,
        epochs=1, max_len=8, use_pallas=False, checkpoint_dir="/tmp/hash_ckpt",
    )
    feats = []
    for f in microlens_features(item_vocab=300, cate_vocab=11, max_len=8, mm_dim=16):
        if f.name == "item_id":
            f = dataclasses.replace(f, vocab_size=None, hash_buckets=buckets)
        feats.append(f)
    return exp.replace(dataset=dataclasses.replace(exp.dataset, features=tuple(feats)))


def test_feature_map_hashed_table():
    exp = _hashed_experiment(buckets=128)
    fm = build_feature_map(exp.dataset)
    t = fm.table("item_id")
    assert t.hashed and t.vocab_size == 128
    # item_seq shares the hashed table
    assert fm.table_of["item_seq"] == "item_id"


def test_train_eval_predict_with_hashed_table_and_huge_ids():
    from ctr_recommendation_tpu.inference import Predictor
    from ctr_recommendation_tpu.training import Trainer

    exp = _hashed_experiment(buckets=128)
    n = 512
    raw = _fake_batch(np.random.default_rng(0), n, 300, 8, 16)
    # ids FAR outside any declared vocab — would be out-of-range without hashing
    raw["item_id"] = (raw["item_id"].astype(np.int64) * 12345 + 10**9).astype(np.int32)
    raw["item_seq"] = np.where(
        raw["item_seq"] == 0, 0,
        (raw["item_seq"].astype(np.int64) * 54321 + 10**8).astype(np.int32),
    )

    class _S:
        columns = raw
        num_rows = n

    tr = Trainer(exp, steps_per_epoch=n // 64, log_fn=lambda s: None)
    hist = tr.fit_on_device(_S(), _S())
    assert np.isfinite(hist[-1]["train_loss"])
    assert 0.0 <= hist[-1]["auc"] <= 1.0

    pred = Predictor(exp, tr.state.params, tr.state.model_state)
    feats = {k: v for k, v in raw.items() if k not in ("label", "__weight__")}
    probs = np.asarray(pred(feats))
    assert probs.shape == (n,) and np.all(np.isfinite(probs))
    # the table's pad row stayed zero (hashes can't touch row 0)
    assert np.allclose(
        np.asarray(tr.state.params["trunk"]["tables"]["item_id"][0]), 0.0
    )


def test_sparse_step_with_hashed_table():
    from ctr_recommendation_tpu.training import Trainer

    exp = _hashed_experiment(buckets=128)
    exp = exp.replace(
        train=dataclasses.replace(
            exp.train, table_optimizer="adam", checkpoint_dir="/tmp/hash_ckpt_s"
        )
    )
    raw = _fake_batch(np.random.default_rng(1), 64, 300, 8, 16)
    raw["item_id"] = raw["item_id"] + 10**6  # out-of-vocab
    tr = Trainer(exp, steps_per_epoch=1, log_fn=lambda s: None)
    state, m = tr._train_step(tr.state, tr.put_batch(raw), jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
