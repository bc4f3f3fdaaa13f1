"""Sequence pooling over the user click history.

masked_mean reproduces the reference history pooling exactly
(model_fibinet.py:165-174): pad steps (id == pad_id) are zeroed out of the
sum and the divisor is the clamped-at-1 count of real steps.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(seq_emb, seq_ids, pad_id: int = 0):
    """seq_emb: (B, S, E), seq_ids: (B, S) -> (B, E)."""
    mask = (seq_ids != pad_id).astype(seq_emb.dtype)  # (B, S)
    total = jnp.sum(seq_emb * mask[..., None], axis=-2)
    count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    return total / count


def masked_sum(seq_emb, seq_ids, pad_id: int = 0):
    mask = (seq_ids != pad_id).astype(seq_emb.dtype)
    return jnp.sum(seq_emb * mask[..., None], axis=-2)


def masked_mean_t(seq_emb, seq_ids, pad_id: int = 0):
    """Transposed-layout masked mean: seq_emb (S, B, E), seq_ids (S, B) -> (B, E).

    Numerically identical to :func:`masked_mean` on the transposed inputs.
    The (S, B, E) layout exists for TPU memory-layout reasons: a flat
    (S*B, E) embedding gather reshapes to (S, B, E) as a free bitcast
    (same physical row order), whereas reshaping to (B, S, E) forces XLA to
    materialize a full relayout copy of the gathered block (~290 us for an
    84 MB block at MicroLens serving shapes — measured round 3), and the
    reduction over the leading S axis streams the block once instead.
    """
    mask = (seq_ids != pad_id).astype(seq_emb.dtype)  # (S, B)
    total = jnp.sum(seq_emb * mask[..., None], axis=0)
    count = jnp.maximum(jnp.sum(mask, axis=0)[:, None], 1.0)
    return total / count
