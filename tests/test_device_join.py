"""On-device item join == host-side pandas-style join (same predictions)."""

import dataclasses

import jax
import numpy as np

from ctr_recommendation_tpu.data import ItemStore
from ctr_recommendation_tpu.inference import Predictor
from ctr_recommendation_tpu.models import build_model
from tests.conftest import make_batch


def _store(rng, n_items=200, dim=24):
    ids = np.arange(1, n_items)
    vecs = rng.normal(size=(len(ids), dim)).astype(np.float32)
    return ItemStore.from_arrays(ids, vecs)


def test_device_join_matches_host_join(tiny_experiment, tiny_feature_map):
    rng = np.random.default_rng(0)
    store = _store(rng)
    cfg = tiny_experiment.model
    module, params, state = build_model(tiny_feature_map, cfg, jax.random.key(0))

    batch = make_batch(rng, 64)
    del batch["item_emb_d128"]  # device-join path: ids only

    host_batch = dict(batch)
    host_batch["item_emb_d128"] = store.lookup(batch["item_id"])

    dev = Predictor(tiny_experiment, params, state, item_store=store)
    host = Predictor(tiny_experiment, params, state)
    np.testing.assert_allclose(
        np.asarray(dev(batch)), np.asarray(host(host_batch)), rtol=1e-5, atol=1e-6
    )


def test_device_join_zeros_for_unknown(tiny_experiment, tiny_feature_map):
    rng = np.random.default_rng(1)
    store = _store(rng)
    cfg = tiny_experiment.model
    module, params, state = build_model(tiny_feature_map, cfg, jax.random.key(0))
    batch = make_batch(rng, 64)
    del batch["item_emb_d128"]
    batch["item_id"] = np.full(64, 10**6, dtype=np.int64)  # out of range

    host_batch = dict(batch)
    host_batch["item_emb_d128"] = np.zeros((64, store.dim), np.float32)

    dev = Predictor(tiny_experiment, params, state, item_store=store)
    host = Predictor(tiny_experiment, params, state)
    np.testing.assert_allclose(
        np.asarray(dev(batch)), np.asarray(host(host_batch)), rtol=1e-5, atol=1e-6
    )
