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


# ---------------------------------------------------------------- DIN pooling
def _din_naive(params, seq_emb, seq_ids, target, pad_id=0):
    """Per-position loop reference of the local activation unit."""
    b, s, e = seq_emb.shape
    out = np.zeros((b, e), np.float32)
    for i in range(b):
        for j in range(s):
            h = np.asarray(seq_emb[i, j], np.float64)
            t = np.asarray(target[i], np.float64)
            z = np.concatenate([h, h * t, h - t, t])
            layers = params["layers"]
            for layer in layers[:-1]:
                z = z @ np.asarray(layer["lin"]["w"], np.float64) + np.asarray(
                    layer["lin"]["b"], np.float64
                )
                a = np.asarray(layer["alpha"], np.float64)
                z = np.where(z >= 0, z, a * z)
            w = float(
                z @ np.asarray(layers[-1]["lin"]["w"], np.float64)
                + np.asarray(layers[-1]["lin"]["b"], np.float64)
            )
            if int(seq_ids[i, j]) != pad_id:
                out[i] += w * np.asarray(seq_emb[i, j])
    return out


def test_din_pool_matches_naive():
    e, s = 16, 8
    params = A.din_init(jax.random.key(0), e, (8, 4))
    ids = np.array([[1, 2, 0, 4, 0, 6, 7, 0], [0, 0, 0, 0, 0, 0, 0, 0]], np.int32)
    emb = np.asarray(jax.random.normal(jax.random.key(1), (2, s, e)))
    target = np.asarray(jax.random.normal(jax.random.key(2), (2, e)))
    got = A.din_pool(
        params, jnp.asarray(emb), jnp.asarray(ids), jnp.asarray(target)
    )
    want = _din_naive(params, emb, ids, target)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    # all-pad row pools to zeros (reference fallback parity)
    np.testing.assert_allclose(np.asarray(got[1]), 0.0, atol=1e-6)


def test_din_pad_content_does_not_affect_output():
    e, s = 16, 8
    params = A.din_init(jax.random.key(0), e)
    ids = np.array([[0, 2, 3, 0, 5, 0, 7, 8]], np.int32)
    emb_a = jax.random.normal(jax.random.key(1), (1, s, e))
    noise = 100.0 * jax.random.normal(jax.random.key(2), emb_a.shape)
    emb_b = jnp.where((ids == 0)[..., None], emb_a + noise, emb_a)
    target = jax.random.normal(jax.random.key(3), (1, e))
    out_a = A.din_pool(params, emb_a, jnp.asarray(ids), target)
    out_b = A.din_pool(params, emb_b, jnp.asarray(ids), target)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5)
