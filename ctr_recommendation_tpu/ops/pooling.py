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
