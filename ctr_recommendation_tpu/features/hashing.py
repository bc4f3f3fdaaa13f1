"""On-device id hashing (the "hash trick") for unbounded vocabularies.

The reference KeyErrors on item ids unseen in item_info during training
(dataloader.py:104-106) and its table sizes are hardcoded to the dataset's
exact vocab. Declaring ``hash_buckets`` on a feature (config/schema.py
FeatureSpec) instead maps ANY int id — unseen, out-of-range, negative —
into a fixed-size table inside the jitted step:

    h(id) = (uint32(id) * 2654435761) % (buckets - 1) + 1      in [1, buckets)

Knuth's multiplicative hash: one VPU multiply + modulo per id, no host
involvement, deterministic across runs/hosts. Row 0 is reserved so a
sequence pad id (0) maps to itself and the zeroed-pad-row / mask semantics
are untouched (hashed sequences require pad_id 0, enforced at config time).

Applied AFTER the item-info join (which indexes its dense matrix by RAW
item id) and BEFORE the embedding lookup / sparse id remap — see
Trainer._step_impl and inference/predictor.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import FeatureType
from ctr_recommendation_tpu.features.feature_map import FeatureMap

_KNUTH = 2654435761  # 2^32 / golden ratio, odd


def hash_ids(ids: jax.Array, buckets: int, pad_id: int = 0) -> jax.Array:
    """(any int dtype) -> int32 rows in [1, buckets); pad_id maps to itself."""
    h = ids.astype(jnp.uint32) * jnp.uint32(_KNUTH)
    h = (h % jnp.uint32(buckets - 1)).astype(jnp.int32) + 1
    return jnp.where(ids == pad_id, jnp.int32(pad_id), h)


def hash_plan(fm: FeatureMap) -> list[tuple[str, int, int]]:
    """[(feature name, buckets, pad_id)] for features whose table is hashed."""
    plan = []
    for f in fm.features:
        if f.type not in (FeatureType.CATEGORICAL, FeatureType.SEQUENCE):
            continue
        t = fm.table(fm.table_of[f.name])
        if t.hashed:
            plan.append((f.name, t.vocab_size, t.pad_id if t.pad_id is not None else 0))
    return plan


def apply_hashing(feats: dict, plan: list[tuple[str, int, int]]) -> dict:
    if not plan:
        return feats
    out = dict(feats)
    for name, buckets, pad_id in plan:
        if name in out:
            out[name] = hash_ids(out[name], buckets, pad_id)
    return out
