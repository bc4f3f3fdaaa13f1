"""Attention pooling invariants: pad masking, empty-history zeros, shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.ops import attention as A


def _setup(s=8, e=16, heads=2, layers=1):
    params = A.init(jax.random.key(0), e, s, num_heads=heads, num_layers=layers)
    return params, s, e, heads


def test_pad_content_does_not_affect_output():
    params, s, e, heads = _setup()
    ids = np.array([[0, 0, 3, 4, 5, 0, 7, 8]], dtype=np.int32)
    table = jax.random.normal(jax.random.key(1), (16, e))
    emb_a = table[ids]
    # corrupt embeddings at PAD positions only
    noise = 100.0 * jax.random.normal(jax.random.key(2), emb_a.shape)
    pad_mask = (ids == 0)[..., None]
    emb_b = jnp.where(pad_mask, emb_a + noise, emb_a)

    enc_a = A.encode(params, emb_a, jnp.asarray(ids), num_heads=heads)
    enc_b = A.encode(params, emb_b, jnp.asarray(ids), num_heads=heads)
    target = table[jnp.asarray([9])]
    out_a = A.target_pool(params, enc_a, jnp.asarray(ids), target)
    out_b = A.target_pool(params, enc_b, jnp.asarray(ids), target)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5)


def test_empty_history_yields_zeros():
    params, s, e, heads = _setup()
    ids = jnp.zeros((2, s), jnp.int32)  # all pad
    emb = jax.random.normal(jax.random.key(1), (2, s, e))
    enc = A.encode(params, emb, ids, num_heads=heads)
    target = jax.random.normal(jax.random.key(2), (2, e))
    out = A.target_pool(params, enc, ids, target)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_pooled_is_convex_combination_reachable():
    params, s, e, heads = _setup()
    ids = jnp.asarray([[1, 2, 3, 0, 0, 0, 0, 0]], jnp.int32)
    emb = jax.random.normal(jax.random.key(1), (1, s, e))
    enc = A.encode(params, emb, ids, num_heads=heads)
    target = jax.random.normal(jax.random.key(2), (1, e))
    out = A.target_pool(params, enc, ids, target)
    assert out.shape == (1, e)
    assert np.all(np.isfinite(np.asarray(out)))
