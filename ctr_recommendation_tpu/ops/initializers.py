"""Parameter initializers matching the reference's torch defaults.

SURVEY §7(c) flags init parity as convergence-critical for reproducing the
epoch-5 AUC peak: torch ``nn.Embedding`` draws N(0,1) with the pad row zeroed
(model_fibinet.py:100), the bilinear W is Xavier-normal (model_fibinet.py:49),
and ``nn.Linear`` uses Kaiming-uniform(a=sqrt(5)) which reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def embedding_init(
    key: jax.Array, vocab_size: int, dim: int, pad_id: int | None = None,
    dtype=jnp.float32, std: float = 1.0,
) -> jax.Array:
    """torch nn.Embedding default: N(0, std) with std=1; pad row zeroed.
    ``std`` < 1 for models whose logits are raw embedding products
    (config.schema ModelConfig.embedding_init_std)."""
    table = std * jax.random.normal(key, (vocab_size, dim), dtype=dtype)
    if pad_id is not None:
        table = table.at[pad_id].set(0.0)
    return table


def xavier_normal(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """torch nn.init.xavier_normal_ for a 2-D (or stacked 3-D) weight."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype=dtype)


def linear_init(
    key: jax.Array, fan_in: int, fan_out: int, use_bias: bool = True, dtype=jnp.float32
) -> dict[str, jax.Array]:
    """torch nn.Linear default init. Weight stored as (fan_in, fan_out) —
    i.e. already transposed for ``x @ w`` — values U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    wkey, bkey = jax.random.split(key)
    params = {
        "w": jax.random.uniform(
            wkey, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=dtype
        )
    }
    if use_bias:
        params["b"] = jax.random.uniform(
            bkey, (fan_out,), minval=-bound, maxval=bound, dtype=dtype
        )
    return params


def linear_apply(params: dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Matmul in the ACTIVATION's dtype: weights are stored fp32 (master
    copies for the optimizer) and cast to x.dtype here — without the cast,
    JAX type promotion silently lifts bf16 activations back to fp32 and the
    whole compute_dtype/tower_dtype="compute" path runs fp32 matmuls."""
    y = x @ params["w"].astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y
