"""Metric parity vs sklearn (SURVEY §7 hard part (e): AUC must match
sklearn to ~1e-4 so best-checkpoint selection is identical)."""

import numpy as np
import pytest
from sklearn.metrics import log_loss, roc_auc_score

from ctr_recommendation_tpu.training import metrics as M


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exact_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    n = 4001
    labels = (rng.random(n) < 0.3).astype(np.float32)
    scores = rng.normal(size=n).astype(np.float32) + labels
    got = float(M.auc(labels, scores))
    want = roc_auc_score(labels, scores)
    assert abs(got - want) < 1e-6


def test_auc_with_ties_matches_sklearn():
    rng = np.random.default_rng(3)
    n = 2000
    labels = (rng.random(n) < 0.4).astype(np.float32)
    scores = np.round(rng.random(n), 2).astype(np.float32)  # heavy ties
    got = float(M.auc(labels, scores))
    want = roc_auc_score(labels, scores)
    assert abs(got - want) < 1e-6


def test_auc_single_class_fallback():
    labels = np.ones(64, np.float32)
    scores = np.random.default_rng(0).random(64).astype(np.float32)
    assert float(M.auc(labels, scores)) == 0.5  # utils.py:23-27 behavior


def test_auc_respects_weight_mask():
    rng = np.random.default_rng(4)
    n = 1024
    labels = (rng.random(n) < 0.5).astype(np.float32)
    scores = rng.normal(size=n).astype(np.float32) + 0.5 * labels
    # mask out the last quarter; AUC must equal AUC of the first 3/4
    w = np.ones(n, np.float32)
    w[768:] = 0.0
    got = float(M.auc(labels, scores, w))
    want = roc_auc_score(labels[:768], scores[:768])
    assert abs(got - want) < 1e-6


def test_binned_auc_close_to_exact():
    rng = np.random.default_rng(5)
    n = 20000
    labels = (rng.random(n) < 0.3).astype(np.float32)
    probs = np.clip(rng.beta(2, 5, n) + 0.2 * labels, 0, 1).astype(np.float32)
    import jax.numpy as jnp

    nbins = 8192
    hp, hn = M.binned_auc_update(
        jnp.zeros(nbins), jnp.zeros(nbins), labels, probs, num_bins=nbins
    )
    got = float(M.binned_auc_finalize(hp, hn))
    want = roc_auc_score(labels, probs)
    assert abs(got - want) < 2e-3


def test_logloss_matches_sklearn():
    rng = np.random.default_rng(6)
    n = 1000
    labels = (rng.random(n) < 0.5).astype(np.float32)
    probs = rng.random(n).astype(np.float32)
    got = float(M.logloss(labels, probs))
    want = log_loss(labels, probs, labels=[0, 1])
    assert abs(got - want) < 1e-5


def test_group_auc_matches_sklearn_per_group():
    from sklearn.metrics import roc_auc_score

    from ctr_recommendation_tpu.training.metrics import group_auc

    rng = np.random.default_rng(5)
    n = 3000
    groups = rng.integers(0, 120, size=n)
    labels = (rng.random(n) < 0.4).astype(np.float32)
    # scores with ties so the tie-averaging path is exercised
    scores = np.round(rng.random(n), 2).astype(np.float32)

    got = group_auc(labels, scores, groups)

    num = den = 0.0
    for g in np.unique(groups):
        m = groups == g
        if labels[m].min() == labels[m].max():
            continue
        num += m.sum() * roc_auc_score(labels[m], scores[m])
        den += m.sum()
    want = num / den
    # fp32 device arithmetic (segment sums) vs the fp64 host oracle
    assert abs(got - want) < 1e-6


def test_group_auc_degenerate_groups():
    from ctr_recommendation_tpu.training.metrics import group_auc

    # every group single-class -> 0.5 fallback
    labels = np.array([1, 1, 0, 0], np.float32)
    groups = np.array([0, 0, 1, 1])
    scores = np.array([0.9, 0.1, 0.8, 0.2], np.float32)
    assert group_auc(labels, scores, groups) == 0.5
    # empty input
    assert group_auc(np.array([]), np.array([]), np.array([])) == 0.5
