"""Torch-checkpoint import parity (VERDICT r3 item 8).

Random-init the REFERENCE's own MM_FiBiNET (imported from
/root/reference/src, not copied), push a batch through its forward, then
import its state_dict into the JAX model via tools/torch_import.py and
assert per-row probability agreement — max |dprob| <= 1e-5 fp32. Covers the
DataParallel ``module.`` prefix strip, the Linear/BN transposes, the shared
cate table, the vocab-padded item table, and the masked-mean history path.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE_SRC, "model_fibinet.py")),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def ref_model_and_exp():
    import torch

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import model_fibinet as ref_model

    from ctr_recommendation_tpu.config import microlens_experiment

    torch.manual_seed(7)
    e = 32
    model = ref_model.build_model(None, {"embedding_dim": e})
    model.eval()
    # BN running stats at init are (0, 1) — push a few train batches through
    # so the imported stats are non-trivial
    rng = np.random.default_rng(0)
    model.train()
    with torch.no_grad():
        for _ in range(3):
            bd = _torch_batch(rng, 256, e)
            model(bd)
    model.eval()
    exp = microlens_experiment(
        data_root="", embedding_dim=e, use_pallas=False,
        compute_dtype="float32", tower_dtype="float32",
    )
    return model, exp


def _np_batch(rng, n, max_len=20, mm_dim=128, vocab=91718):
    seqs = rng.integers(1, vocab, size=(n, max_len))
    lens = rng.integers(0, max_len + 1, size=n)
    mask = np.arange(max_len)[None, :] < lens[:, None]
    return {
        "item_id": rng.integers(1, vocab, size=n).astype(np.int64),
        "likes_level": rng.integers(0, 11, size=n).astype(np.int64),
        "views_level": rng.integers(0, 11, size=n).astype(np.int64),
        "item_emb_d128": rng.normal(size=(n, mm_dim)).astype(np.float32),
        "item_seq": np.where(mask, seqs, 0).astype(np.int64),
    }


def _torch_batch(rng, n, e):
    import torch

    return {k: torch.from_numpy(v) for k, v in _np_batch(rng, n).items()}


def test_imported_checkpoint_prob_parity(ref_model_and_exp, tmp_path):
    import torch

    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.models.registry import get_model
    from ctr_recommendation_tpu.tools.torch_import import load_checkpoint

    model, exp = ref_model_and_exp
    # save/reload through disk with the DataParallel-style prefix, the exact
    # shape Prediction.py:72-78 handles
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    path = tmp_path / "FiBiNET_best.pth"
    torch.save(sd, path)

    params, state = load_checkpoint(str(path), exp)

    rng = np.random.default_rng(42)
    nb = _np_batch(rng, 512)
    with torch.no_grad():
        want = model({k: torch.from_numpy(v) for k, v in nb.items()}).numpy()

    fm = build_feature_map(exp.dataset)
    module = get_model(exp.model.model)
    import jax
    import jax.numpy as jnp

    feats = {k: jnp.asarray(v) for k, v in nb.items()}
    logits, _ = module.apply(
        params, state, fm, exp.model, feats, train=False,
        compute_dtype=jnp.float32,
    )
    got = np.asarray(jax.nn.sigmoid(logits))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_import_rejects_unknown_keys(ref_model_and_exp):
    from ctr_recommendation_tpu.tools.torch_import import import_state_dict

    model, exp = ref_model_and_exp
    sd = dict(model.state_dict())
    sd["mystery.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unconsumed.*mystery"):
        import_state_dict(sd, exp)


def test_import_checks_embedding_dim(ref_model_and_exp):
    from ctr_recommendation_tpu.tools.torch_import import import_state_dict

    model, exp = ref_model_and_exp
    import dataclasses

    bad = exp.replace(model=dataclasses.replace(exp.model, embedding_dim=64))
    with pytest.raises(ValueError, match="embedding_dim"):
        import_state_dict(dict(model.state_dict()), bad)
