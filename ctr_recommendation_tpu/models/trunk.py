"""Shared embedding trunk: FeatureMap -> (B, F, E) field stack.

Every model in the zoo (FiBiNET, xDeepFM, FinalMLP, SASRec-FiBiNET) shares
this trunk: embedding tables built from the feature map (honoring
share_embedding and pad rows), dense multimodal vectors projected through
Linear -> LayerNorm -> ReLU (model_fibinet.py:105-109), placeholder fields as
zeros (model_fibinet.py:152), and sequence fields pooled by masked mean
(model_fibinet.py:165-174) or SASRec-style target-aware attention
(BASELINE.json configs[4]).

Distributed: the ``tables`` sub-tree is the only part that is row-sharded
over the ``model`` mesh axis; everything else is replicated. The gather here
is a plain ``table[ids]`` — under pjit, GSPMD turns it into the all-gather /
all-to-all exchange; parallel/embedding.py provides the explicit shard_map
lookup used by the distributed train step.
"""

from __future__ import annotations

import zlib
from typing import Callable

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import FeatureType, ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.ops import attention as attn_ops
from ctr_recommendation_tpu.ops import pooling
from ctr_recommendation_tpu.ops.initializers import (
    embedding_init,
    linear_apply,
    linear_init,
)

LN_EPS = 1e-5  # torch nn.LayerNorm default


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig, *, seq_pooling: str = "mean") -> dict:
    e = cfg.embedding_dim
    params: dict = {"tables": {}, "dense": {}}
    key_iter = iter(jax.random.split(key, len(fm.tables) + len(fm.features) + 2))
    from ctr_recommendation_tpu.parallel.embedding import round_up_vocab

    for t in fm.tables:
        # rows padded to a lane-width multiple so any model-parallel degree
        # divides the table evenly (padded rows are never addressed).
        params["tables"][t.name] = embedding_init(
            next(key_iter), round_up_vocab(t.vocab_size), e, pad_id=t.pad_id,
            std=cfg.resolved_init_std(),
        )
    for f in fm.features_of_type(FeatureType.DENSE_EMBEDDING):
        params["dense"][f.name] = {
            "proj": linear_init(next(key_iter), f.dense_dim, e),
            "ln_scale": jnp.ones((e,)),
            "ln_bias": jnp.zeros((e,)),
        }
    if seq_pooling == "attention":
        seq_feats = fm.features_of_type(FeatureType.SEQUENCE)
        params["attn"] = {
            f.name: attn_ops.init(
                next(key_iter),
                e,
                f.max_len,
                num_heads=cfg.attn_num_heads,
                num_layers=cfg.attn_num_layers,
            )
            for f in seq_feats
        }
    elif seq_pooling == "din":
        seq_feats = fm.features_of_type(FeatureType.SEQUENCE)
        params["attn"] = {
            f.name: attn_ops.din_init(
                next(key_iter), e, cfg.din_att_hidden_units
            )
            for f in seq_feats
        }
    return params


def _layer_norm(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def apply(
    params: dict,
    fm: FeatureMap,
    cfg: ModelConfig,
    batch: dict[str, jax.Array],
    *,
    seq_pooling: str = "mean",
    train: bool = False,
    rng: jax.Array | None = None,
    compute_dtype=jnp.float32,
    lookup: Callable[[dict, str, jax.Array], jax.Array] | None = None,
) -> jax.Array:
    """batch dict -> field stack (B, F, E), fields in feature-map order.

    ``lookup(tables, table_name, ids, feature=<feature name>, batch_dim=0)``
    overrides the embedding gather — the distributed path injects the
    shard_map all-to-all lookup here; the sparse-table train step injects
    row-buffer lookups. The ``feature`` kwarg identifies the calling feature
    for lookups that need per-feature routing; ``batch_dim`` names which axis
    of ``ids`` is the (data-sharded) batch axis. Mean-pooled sequence fields
    are looked up TRANSPOSED (ids (S, B), batch_dim=1): the flat (S*B, E)
    gather then reshapes to (S, B, E) as a free bitcast and the pooling
    reduction streams it once, where the (B, S, E) order forces XLA to
    materialize a full relayout copy of the gathered block (measured ~290 us
    per 8192-row batch at MicroLens serving shapes).

    CONTRACT for lookup implementations that pre-gather per feature (the
    merged-scatter train path, training/loop.py _merged_lookup): the ids a
    planned feature passes here are exactly ``batch[f.name]`` — verbatim
    for raw id fields, transposed for mean-pooled sequences — and
    pre-gathered results may be matched to callers by (feature, shape)
    alone. A model variant that remaps/shifts ids before lookup must
    either pass a different ``feature`` name or bypass the plan (it would
    otherwise silently receive embeddings for the unmapped ids).
    """
    if lookup is None:
        lookup = lambda tables, name, ids, feature=None, batch_dim=0: tables[name][ids]

    e = cfg.embedding_dim
    batch_size = None
    for f in fm.features:
        if f.name in batch:
            batch_size = batch[f.name].shape[0]
            break
    if batch_size is None:
        raise ValueError("batch contains none of the feature-map features")

    fields = []
    field_of: dict[str, jax.Array] = {}  # feature name -> its field embedding

    def _append(name: str, value):
        fields.append(value)
        field_of[name] = value

    for f in fm.features:
        if f.type == FeatureType.PLACEHOLDER:
            _append(f.name, jnp.zeros((batch_size, e), dtype=compute_dtype))
        elif f.type == FeatureType.CATEGORICAL:
            ids = batch[f.name].astype(jnp.int32)
            emb = lookup(params["tables"], fm.table_of[f.name], ids, feature=f.name)
            _append(f.name, emb.astype(compute_dtype))
        elif f.type == FeatureType.DENSE_EMBEDDING:
            p = params["dense"][f.name]
            h = linear_apply(p["proj"], batch[f.name].astype(jnp.float32))
            h = _layer_norm(h, p["ln_scale"], p["ln_bias"])
            _append(f.name, jax.nn.relu(h).astype(compute_dtype))
        elif f.type == FeatureType.SEQUENCE and seq_pooling not in (
            "attention",
            "din",
        ):
            # mean pooling: transposed (S, B) lookup — see the docstring
            seq_ids = batch[f.name].astype(jnp.int32)
            seq_emb = lookup(
                params["tables"], fm.table_of[f.name], seq_ids.T,
                feature=f.name, batch_dim=1,
            ).astype(compute_dtype)
            _append(f.name, pooling.masked_mean_t(seq_emb, seq_ids.T, f.pad_id))
        elif f.type == FeatureType.SEQUENCE:
            seq_ids = batch[f.name].astype(jnp.int32)
            seq_emb = lookup(
                params["tables"], fm.table_of[f.name], seq_ids, feature=f.name
            ).astype(compute_dtype)
            # target query = the CATEGORICAL feature sharing this
            # table (item_id for item_seq), reusing its already-gathered
            # field embedding when available (one sharded lookup, not
            # two); else a fresh lookup; else the masked mean. NB: the
            # table NAME itself is not a valid batch key when the
            # sequence feature owns its table.
            target_feat = next(
                (
                    g.name
                    for g in fm.features
                    if g.type == FeatureType.CATEGORICAL
                    and fm.table_of.get(g.name) == fm.table_of[f.name]
                    and g.name in batch
                ),
                None,
            )
            if target_feat is not None and target_feat in field_of:
                target = field_of[target_feat]
            elif target_feat is not None:
                target = lookup(
                    params["tables"], fm.table_of[target_feat],
                    batch[target_feat].astype(jnp.int32), feature=target_feat,
                ).astype(compute_dtype)
            else:
                target = pooling.masked_mean(seq_emb, seq_ids, f.pad_id)
            if seq_pooling == "attention":
                attn_rng = None if rng is None else jax.random.fold_in(
                    rng, zlib.crc32(f.name.encode()) % (2**31)
                )
                drop_active = (
                    train and cfg.attn_dropout > 0.0 and attn_rng is not None
                )
                # fused Pallas encoder: one kernel instead of ~20 HBM
                # passes over (B, S, E). In-kernel dropout needs the TPU
                # PRNG, which interpret mode lacks — non-TPU training
                # with dropout keeps the jnp path (same statistics).
                if cfg.use_pallas and (
                    jax.default_backend() == "tpu" or not drop_active
                ):
                    from ctr_recommendation_tpu.ops.pallas.sasrec_encoder import (
                        fused_encode,
                    )

                    encoded = fused_encode(
                        params["attn"][f.name],
                        seq_emb,
                        seq_ids,
                        num_heads=cfg.attn_num_heads,
                        pad_id=f.pad_id,
                        train=train,
                        dropout_rate=cfg.attn_dropout,
                        rng=attn_rng,
                    )
                else:
                    encoded = attn_ops.encode(
                        params["attn"][f.name],
                        seq_emb,
                        seq_ids,
                        num_heads=cfg.attn_num_heads,
                        pad_id=f.pad_id,
                        train=train,
                        dropout_rate=cfg.attn_dropout,
                        rng=attn_rng,
                    )
                _append(
                    f.name,
                    attn_ops.target_pool(
                        params["attn"][f.name], encoded, seq_ids, target, pad_id=f.pad_id
                    ),
                )
            else:  # "din": local-activation-unit pooling over raw history
                _append(
                    f.name,
                    attn_ops.din_pool(
                        params["attn"][f.name], seq_emb, seq_ids, target,
                        pad_id=f.pad_id,
                    ),
                )
        else:
            raise ValueError(f"unsupported feature type {f.type}")
    return jnp.stack(fields, axis=1)  # (B, F, E)
