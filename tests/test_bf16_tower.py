"""bf16 tower convergence parity (VERDICT r1 item 10).

The full-scale study (benchmarks/bf16_tower_study.py, recorded in
docs/PERFORMANCE.md) showed fp32 and bf16 towers converge identically;
this scaled-down in-suite version guards the property: same data/seed/
recipe, tower fp32 vs compute-dtype — AUC trajectories within variance and
both learn the planted signal.
"""

import numpy as np
import pytest

from benchmarks.bf16_tower_study import run

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bf16"))
    kw = dict(epochs=3, num_rows=6000, num_items=800, embedding_dim=16,
              batch_size=256, max_len=8, seed=11)
    return run(root, "float32", **kw), run(root, "compute", **kw)


def test_bf16_tower_auc_parity(both):
    fp32, bf16 = both
    a = np.array([h["auc"] for h in fp32])
    b = np.array([h["auc"] for h in bf16])
    assert np.max(np.abs(a - b)) < 0.04, (a, b)
    assert a.max() > 0.6 and b.max() > 0.6


def test_bf16_tower_loss_parity(both):
    fp32, bf16 = both
    a = np.array([h["train_loss"] for h in fp32])
    b = np.array([h["train_loss"] for h in bf16])
    np.testing.assert_allclose(b, a, atol=0.02)
