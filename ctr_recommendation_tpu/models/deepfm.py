"""DeepFM: factorization-machine interactions + DNN tower on the shared trunk.

Beyond the reference/BASELINE zoo — the classic CTR baseline family (Guo et
al. 2017), included for completeness. TPU-native formulation over the
(B, F, E) field stack:

* first-order: per-field learned projection ``sum_f <w_f, x_f> + b`` (the
  id-level LR term of classic DeepFM folded into field space — one (F, E)
  weight, a single fused reduction);
* second-order FM: ``0.5 * sum_E((sum_f x_f)^2 - sum_f x_f^2)`` — the
  square-of-sum identity, O(F·E) instead of O(F²·E), one elementwise fusion
  for XLA;
* deep: the shared BatchNorm MLP over the flattened (F·E) stack.

logits = first + second + deep (all logits-space; sigmoid at the loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import mlp as mlp_ops
from ctr_recommendation_tpu.ops.initializers import xavier_normal

SEQ_POOLING = "mean"


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    k_trunk, k_lin, k_mlp = jax.random.split(key, 3)
    f, e = fm.num_fields, cfg.embedding_dim
    params = {
        "trunk": trunk.init(k_trunk, fm, cfg, seq_pooling=SEQ_POOLING),
        "first_order": {
            "w": xavier_normal(k_lin, (f, e)),
            "b": jnp.zeros(()),
        },
    }
    params["mlp"], mlp_state = mlp_ops.init(
        k_mlp, f * e, cfg.hidden_units, out_dim=1, batch_norm=cfg.batch_norm
    )
    return params, {"mlp": mlp_state}


def apply(
    params: dict,
    state: dict,
    fm: FeatureMap,
    cfg: ModelConfig,
    batch: dict[str, jax.Array],
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    compute_dtype=jnp.float32,
    lookup=None,
    weight: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    x = trunk.apply(
        params["trunk"], fm, cfg, batch,
        seq_pooling=SEQ_POOLING, train=train, rng=rng,
        compute_dtype=compute_dtype, lookup=lookup,
    )  # (B, F, E)
    fo = params["first_order"]
    first = jnp.einsum("bfe,fe->b", x.astype(jnp.float32), fo["w"]) + fo["b"]

    xs = x.astype(jnp.float32)
    sum_sq = jnp.square(jnp.sum(xs, axis=1))  # (B, E)
    sq_sum = jnp.sum(jnp.square(xs), axis=1)  # (B, E)
    second = 0.5 * jnp.sum(sum_sq - sq_sum, axis=-1)  # (B,)

    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    b = x.shape[0]
    deep, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], x.reshape(b, -1).astype(td),
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    logits = first + second + deep[..., 0].astype(jnp.float32)
    return logits, {"mlp": mlp_state}
