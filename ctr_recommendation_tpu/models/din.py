"""DIN: Deep Interest Network (Zhou et al., KDD 2018) on the shared trunk.

Beyond the reference/BASELINE zoo — the canonical target-aware
history-pooling CTR family, included for zoo completeness alongside the
SASRec-style transformer pooling (models/sasrec_fibinet.py). Where the
reference mean-pools the click history unconditionally
(model_fibinet.py:165-174), DIN scores each history item against the
CANDIDATE item with a local activation unit (MLP over [h, h*t, h-t, t],
ops/attention.py din_pool) and pools with the raw — deliberately
un-normalized — weights.

Architecture per the paper: embeddings + activation-weighted history sum,
concatenated and fed to a plain DNN tower; no FM/bilinear interaction block.
TPU notes: the activation unit is one (B, S, 4E) x (4E, H) matmul — batched,
bf16, MXU-friendly; no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import mlp as mlp_ops

SEQ_POOLING = "din"


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    k_trunk, k_mlp = jax.random.split(key)
    f, e = fm.num_fields, cfg.embedding_dim
    params = {"trunk": trunk.init(k_trunk, fm, cfg, seq_pooling=SEQ_POOLING)}
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
    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    b = x.shape[0]
    logits, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], x.reshape(b, -1).astype(td),
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    return logits[..., 0].astype(jnp.float32), {"mlp": mlp_state}
