"""Model-zoo forward/backward smoke + shape tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctr_recommendation_tpu.models import available_models, build_model, get_model


@pytest.mark.parametrize(
    "name",
    [
        "mm_fibinet", "xdeepfm", "finalmlp", "sasrec_fibinet", "dcnv2",
        "deepfm", "autoint", "din", "masknet", "pnn", "dlrm",
    ],
)
def test_forward_shapes_and_grad(name, tiny_experiment, tiny_feature_map, tiny_batch):
    cfg = dataclasses.replace(tiny_experiment.model, model=name)
    module, params, state = build_model(tiny_feature_map, cfg, jax.random.key(0))
    logits, new_state = module.apply(
        params, state, tiny_feature_map, cfg, tiny_batch, train=False
    )
    assert logits.shape == (64,)
    assert np.all(np.isfinite(np.asarray(logits)))

    def loss_fn(p):
        lg, st = module.apply(
            p, state, tiny_feature_map, cfg, tiny_batch,
            train=True, rng=jax.random.key(1),
        )
        return jnp.mean(lg**2), st

    (loss, st), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # some gradient must reach the shared item table
    g_item = grads["trunk"]["tables"]["item_id"]
    assert float(jnp.sum(jnp.abs(g_item))) > 0


def test_registry_contents():
    names = available_models()
    for required in ("fibinet", "mm_fibinet", "xdeepfm", "finalmlp", "sasrec_fibinet"):
        assert required in names
    with pytest.raises(KeyError):
        get_model("nope")


def test_pad_row_zero_and_no_user_table(tiny_feature_map, tiny_experiment):
    module, params, _ = build_model(
        tiny_feature_map, tiny_experiment.model, jax.random.key(0)
    )
    tables = params["trunk"]["tables"]
    # shared tables: likes/views one table, item_id/item_seq one table
    assert set(tables) == {"likes_level", "item_id"}
    assert np.allclose(np.asarray(tables["item_id"][0]), 0.0)


def test_train_eval_batchnorm_state_updates(tiny_experiment, tiny_feature_map, tiny_batch):
    cfg = tiny_experiment.model
    module, params, state = build_model(tiny_feature_map, cfg, jax.random.key(0))
    _, st_train = module.apply(
        params, state, tiny_feature_map, cfg, tiny_batch,
        train=True, rng=jax.random.key(1),
    )
    before = np.asarray(state["mlp"]["layers"][0]["bn_mean"])
    after = np.asarray(st_train["mlp"]["layers"][0]["bn_mean"])
    assert not np.allclose(before, after)
    # eval must not touch state
    _, st_eval = module.apply(
        params, state, tiny_feature_map, cfg, tiny_batch, train=False
    )
    assert np.allclose(
        np.asarray(st_eval["mlp"]["layers"][0]["bn_mean"]), before
    )
