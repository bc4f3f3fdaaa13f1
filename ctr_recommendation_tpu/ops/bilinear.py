"""Bilinear field-pair interaction (FiBiNET).

Parity with the reference ``BilinearInteraction`` (model_fibinet.py:37-89)
but vectorized: the reference loops over all F(F-1)/2 pairs in Python
(model_fibinet.py:75-86, a per-step interpreter hot spot flagged in SURVEY
§3.1); here the pair loop is two static gathers over precomputed (i, j) index
arrays, so XLA sees one projection matmul + one elementwise multiply —
MXU + VPU friendly, no unrolled graph.

  "all":  p_ij = v_i  ⊙ (v_j @ W)        shared W (E, E)
  "each": p_ij = (v_i @ W_i) ⊙ v_j       per-field W_i, i in [0, F-2]

(The reference's "all" branch applies W to the *second* operand — v_i ⊙
(W·v_j), model_fibinet.py:72-79 — while "each" projects the first. Both
reproduced exactly.)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.ops.initializers import xavier_normal


def pair_indices(num_fields: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (i, j) arrays for all ordered pairs i < j, in the reference's
    nested-loop order (model_fibinet.py:75-77)."""
    i_idx, j_idx = np.triu_indices(num_fields, k=1)
    return i_idx.astype(np.int32), j_idx.astype(np.int32)


def init(
    key: jax.Array, emb_dim: int, num_fields: int, bilinear_type: str = "all"
) -> dict:
    if bilinear_type == "all":
        return {"w": xavier_normal(key, (emb_dim, emb_dim))}
    if bilinear_type == "each":
        keys = jax.random.split(key, num_fields - 1)
        w = jnp.stack([xavier_normal(k, (emb_dim, emb_dim)) for k in keys])
        return {"w_each": w}  # (F-1, E, E)
    raise ValueError(f"bilinear_type must be 'all' or 'each', got {bilinear_type!r}")


def apply(params: dict, x: jax.Array, bilinear_type: str = "all") -> jax.Array:
    """x: (B, F, E) -> (B, F(F-1)/2, E) stacked pair interactions."""
    num_fields = x.shape[-2]
    i_idx, j_idx = pair_indices(num_fields)
    # weights cast to the activation dtype (fp32 master copies; without the
    # cast, promotion lifts a bf16 x back to fp32 — see linear_apply)
    if bilinear_type == "all":
        v = x @ params["w"].astype(x.dtype)  # (B, F, E) — one batched MXU matmul
        return x[..., i_idx, :] * v[..., j_idx, :]
    if bilinear_type == "each":
        # project fields 0..F-2 with their own W_i: (B, F-1, E)
        v = jnp.einsum(
            "...fe,fed->...fd", x[..., :-1, :],
            params["w_each"].astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        return v[..., i_idx, :] * x[..., j_idx, :]
    raise ValueError(f"bilinear_type must be 'all' or 'each', got {bilinear_type!r}")
