"""DLRM-style dot-interaction model (Naumov et al. 2019).

Beyond the reference/BASELINE zoo, included for framework completeness —
the canonical production recommender architecture. Mapped onto the shared
trunk: every field (categorical embeddings, pooled history, the trunk's
Linear+LN+ReLU projection of the frozen multimodal vector — DLRM's "bottom
MLP" analogue for dense inputs) is an E-dim vector; the interaction layer
is all pairwise dots; the top MLP consumes the dense component
concatenated with the dots:

    dots = { <x_i, x_j> : i < j }               (B, P)
    dense = x_dense (the DENSE_EMBEDDING field)  (B, E)   [zeros if absent]
    logits = TopMLP([dense ‖ dots])

TPU notes: one (B, F, F) Gram einsum on the MXU + a static upper-triangle
gather — the classic DLRM interaction without any gather/scatter loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.config.schema import FeatureType, ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import mlp as mlp_ops
from ctr_recommendation_tpu.ops.bilinear import pair_indices

SEQ_POOLING = "mean"


def _dense_field_index(fm: FeatureMap) -> int | None:
    for i, f in enumerate(fm.features):
        if f.type == FeatureType.DENSE_EMBEDDING:
            return i
    return None


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    k_trunk, k_mlp = jax.random.split(key)
    f, e = fm.num_fields, cfg.embedding_dim
    num_pairs = f * (f - 1) // 2
    in_dim = e + num_pairs  # dense component ‖ pairwise dots
    params = {"trunk": trunk.init(k_trunk, fm, cfg, seq_pooling=SEQ_POOLING)}
    params["mlp"], mlp_state = mlp_ops.init(
        k_mlp, in_dim, cfg.hidden_units, out_dim=1, batch_norm=cfg.batch_norm
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
    b, f, e = x.shape
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    gram = jnp.einsum(
        "bfe,bge->bfg", x.astype(td), x.astype(td),
        preferred_element_type=jnp.float32,
    )
    i_idx, j_idx = pair_indices(f)
    dots = gram[:, np.asarray(i_idx), np.asarray(j_idx)]  # (B, P)
    di = _dense_field_index(fm)
    dense = (
        x[:, di, :] if di is not None else jnp.zeros((b, e), dtype=x.dtype)
    )
    h = jnp.concatenate([dense.astype(td), dots.astype(td)], axis=-1)

    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    logits, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], h,
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    return logits[..., 0].astype(jnp.float32), {"mlp": mlp_state}
