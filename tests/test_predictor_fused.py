"""Predictor with the fused Pallas scoring path == plain eval forward.

Two regimes:
* tower_dtype="float32" — the fused kernel must match the plain forward to
  fp32 tolerance (same math, different fusion).
* tower_dtype="compute" (the default; serving runs bf16 MXU operands with
  fp32 accumulation) — probabilities agree to bf16 rounding, and the
  score ORDERING (what AUC measures) is preserved against the fp32 path.
"""

import dataclasses

import jax
import numpy as np

from ctr_recommendation_tpu.inference import Predictor
from ctr_recommendation_tpu.models import build_model
from tests.conftest import make_batch


def _setup(tiny_experiment, tiny_feature_map, tower_dtype):
    cfg = dataclasses.replace(
        tiny_experiment.model, use_pallas=True, tower_dtype=tower_dtype
    )
    exp = tiny_experiment.replace(model=cfg)
    module, params, state = build_model(tiny_feature_map, cfg, jax.random.key(0))
    batch = make_batch(np.random.default_rng(3), 64)
    # move BN stats off init so folding is non-trivial
    _, state = module.apply(
        params, state, tiny_feature_map, cfg, batch, train=True, rng=jax.random.key(1)
    )
    return exp, cfg, params, state, batch


def test_fused_predictor_path_matches_plain_fp32(tiny_experiment, tiny_feature_map):
    exp, cfg, params, state, batch = _setup(
        tiny_experiment, tiny_feature_map, "float32"
    )
    fused = Predictor(exp, params, state, fold_bn=True)
    plain = Predictor(
        exp.replace(model=dataclasses.replace(cfg, use_pallas=False)),
        params, state, fold_bn=False,
    )
    np.testing.assert_allclose(
        np.asarray(fused(batch)), np.asarray(plain(batch)), rtol=1e-4, atol=1e-5
    )


def test_fused_predictor_bf16_close_and_order_preserving(
    tiny_experiment, tiny_feature_map
):
    exp, cfg, params, state, batch = _setup(
        tiny_experiment, tiny_feature_map, "compute"
    )
    fused16 = Predictor(exp, params, state, fold_bn=True)
    plain32 = Predictor(
        exp.replace(
            model=dataclasses.replace(cfg, use_pallas=False, tower_dtype="float32")
        ),
        params, state, fold_bn=False,
    )
    p16 = np.asarray(fused16(batch))
    p32 = np.asarray(plain32(batch))
    # bf16 MXU operands, fp32 accumulation: probabilities within bf16 rounding
    np.testing.assert_allclose(p16, p32, atol=2e-2)
    # rank correlation (what AUC consumes) essentially unchanged
    r16 = np.argsort(np.argsort(p16)).astype(np.float64)
    r32 = np.argsort(np.argsort(p32)).astype(np.float64)
    rho = np.corrcoef(r16, r32)[0, 1]
    assert rho > 0.995, rho


def test_score_table_matches_predict_all(tiny_experiment, tmp_path):
    """Bulk device-resident scoring (one lax.scan program, the predict CLI
    path) must produce exactly the per-batch predict_all probabilities,
    including the non-multiple-of-batch tail."""
    from ctr_recommendation_tpu.data import ItemStore, iter_batches, load_split
    from ctr_recommendation_tpu.data.synthetic import write_synthetic_dataset
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.models import build_model

    paths = write_synthetic_dataset(
        str(tmp_path), num_rows=1000, num_items=120, max_len=8, mm_dim=24, seed=9
    )
    fm = build_feature_map(tiny_experiment.dataset)
    test = load_split(paths["test"], fm, include_label=False)
    store = ItemStore.from_parquet(paths["item_info"])
    cfg = dataclasses.replace(tiny_experiment.model, use_pallas=True)
    exp = tiny_experiment.replace(model=cfg)
    module, params, state = build_model(fm, cfg, jax.random.key(0))
    pred = Predictor(exp, params, state, item_store=store)

    bs = 37  # forces a padded tail batch
    want = pred.predict_all(iter_batches(test, fm, bs, item_store=None))
    got = pred.score_table(test, batch_size=bs)
    assert got.shape == (test.num_rows,)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
