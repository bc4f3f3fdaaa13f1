"""Test harness: run everything on a virtual 8-device CPU mesh.

Note on platform selection: this image registers a TPU ("axon") PJRT plugin
via sitecustomize at interpreter start and pins JAX_PLATFORMS=axon, so env
vars set here are too late — and exporting XLA_FLAGS before startup stalls
the plugin. Instead we flip the platform with ``jax.config`` after import and
inject ``xla_force_host_platform_device_count=8`` before the (lazy) CPU
backend initializes. This yields 8 fake CPU devices so sharding/all-to-all
paths are exercised without TPU hardware (SURVEY §4 test-strategy note).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ctr_recommendation_tpu.config import microlens_experiment  # noqa: E402
from ctr_recommendation_tpu.features import build_feature_map  # noqa: E402


@pytest.fixture(scope="session")
def tiny_experiment():
    """Small-vocab MicroLens-shaped experiment for fast tests."""
    exp = microlens_experiment(
        data_root="",
        embedding_dim=16,
        hidden_units=(32, 16),
        batch_size=64,
        epochs=2,
        max_len=8,
        use_pallas=False,
    )
    # shrink vocabs
    from ctr_recommendation_tpu.config.loader import microlens_features
    import dataclasses

    ds = dataclasses.replace(
        exp.dataset,
        features=microlens_features(item_vocab=200, cate_vocab=11, max_len=8, mm_dim=24),
    )
    return exp.replace(dataset=ds)


@pytest.fixture(scope="session")
def tiny_feature_map(tiny_experiment):
    return build_feature_map(tiny_experiment.dataset)


def make_batch(rng: np.random.Generator, n: int, item_vocab=200, max_len=8, mm_dim=24):
    return {
        "user_id": rng.integers(0, 100, size=(n,), dtype=np.int32),
        "likes_level": rng.integers(0, 11, size=(n,), dtype=np.int32),
        "views_level": rng.integers(0, 11, size=(n,), dtype=np.int32),
        "item_id": rng.integers(1, item_vocab, size=(n,), dtype=np.int32),
        "item_emb_d128": rng.normal(size=(n, mm_dim)).astype(np.float32),
        "item_seq": np.where(
            rng.random((n, max_len)) < 0.3,
            0,
            rng.integers(1, item_vocab, size=(n, max_len)),
        ).astype(np.int32),
    }


@pytest.fixture
def tiny_batch():
    return make_batch(np.random.default_rng(0), 64)
