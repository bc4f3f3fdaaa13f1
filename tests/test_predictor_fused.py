"""Predictor with the fused Pallas scoring path == plain eval forward."""

import dataclasses

import jax
import numpy as np

from ctr_recommendation_tpu.inference import Predictor
from ctr_recommendation_tpu.models import build_model
from tests.conftest import make_batch


def test_fused_predictor_path_matches_plain(tiny_experiment, tiny_feature_map):
    cfg = dataclasses.replace(tiny_experiment.model, use_pallas=True)
    exp = tiny_experiment.replace(model=cfg)
    module, params, state = build_model(tiny_feature_map, cfg, jax.random.key(0))
    batch = make_batch(np.random.default_rng(3), 64)

    # move BN stats off init so folding is non-trivial
    _, state = module.apply(
        params, state, tiny_feature_map, cfg, batch, train=True, rng=jax.random.key(1)
    )

    fused = Predictor(exp, params, state, fold_bn=True)
    plain = Predictor(
        tiny_experiment.replace(
            model=dataclasses.replace(cfg, use_pallas=False)
        ),
        params, state, fold_bn=False,
    )
    np.testing.assert_allclose(
        np.asarray(fused(batch)), np.asarray(plain(batch)), rtol=1e-4, atol=1e-5
    )
