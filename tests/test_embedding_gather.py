"""Pallas gather kernel parity (fwd via interpret mode, bwd scatter-add)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.ops.pallas.embedding_gather import (
    gather_rows,
    pallas_lookup,
)


def test_gather_rows_matches_take():
    table = jax.random.normal(jax.random.key(0), (96, 128))
    ids = jax.random.randint(jax.random.key(1), (64,), 0, 96)
    got = gather_rows(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]), rtol=1e-6)


def test_gather_rows_grad_scatter_add():
    table = jax.random.normal(jax.random.key(0), (32, 128))
    ids = jnp.asarray([1, 1, 5, 31])

    def loss_kernel(t):
        return jnp.sum(gather_rows(t, ids) * 3.0)

    def loss_plain(t):
        return jnp.sum(t[ids] * 3.0)

    g_got = jax.grad(loss_kernel)(table)
    g_want = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-6)


def test_pallas_lookup_sequence_shape():
    table = jax.random.normal(jax.random.key(0), (40, 128))
    ids = jax.random.randint(jax.random.key(1), (8, 5), 0, 40)
    got = pallas_lookup({"t": table}, "t", ids)
    assert got.shape == (8, 5, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]), rtol=1e-6)
