"""Device-resident item feature store.

Shipping the pre-joined (B, 128) multimodal matrix with every batch makes the
input pipeline host-transfer bound (each 4096-row batch carries ~2 MB of
vectors that already live in item_info). Instead the dense matrix is uploaded
to HBM ONCE and the per-batch join becomes a gather *inside the jitted step*:
batches carry only ids; HBM traffic replaces PCIe/tunnel traffic.

Tolerant semantics preserved (Prediction.py:39-42): unknown-but-in-range ids
hit rows the host store already zero-filled; out-of-range ids are masked to
zeros explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.data.item_store import ItemStore


class DeviceItemStore:
    def __init__(self, emb: jax.Array):
        self.emb = emb  # (max_id + 1, dim) float32, zeros at unknown rows

    @classmethod
    def from_host(cls, store: ItemStore, sharding=None) -> "DeviceItemStore":
        emb = jnp.asarray(store.emb)
        if sharding is not None:
            emb = jax.device_put(emb, sharding)
        return cls(emb)

    @property
    def dim(self) -> int:
        return self.emb.shape[1]

    def lookup(self, ids: jax.Array) -> jax.Array:
        """jit-safe gather with zeros for out-of-range ids."""
        v = self.emb.shape[0]
        idx = jnp.clip(ids, 0, v - 1)
        rows = self.emb[idx]
        oob = (ids < 0) | (ids >= v)
        return jnp.where(oob[..., None], 0.0, rows)


def device_join(
    feats: dict, mm_tables: dict, join_plan: list[tuple[str, str]]
) -> dict:
    """In-jit item join (shared by Trainer and Predictor): dense features
    gathered from the device-resident item matrix by id, zeros for
    out-of-range ids (tolerant semantics, Prediction.py:39-42)."""
    for dense_name, id_key in join_plan:
        if dense_name in feats or dense_name not in mm_tables:
            continue
        feats[dense_name] = DeviceItemStore(mm_tables[dense_name]).lookup(
            feats[id_key].astype(jnp.int32)
        )
    return feats


def dense_join_plan(feature_map) -> list[tuple[str, str]]:
    """[(dense_feature_name, id_feature_name)] pairs for the on-device join —
    dense features joined on the categorical feature sharing their source
    tag (item_emb_d128 joins on item_id for MicroLens)."""
    from ctr_recommendation_tpu.config.schema import FeatureType

    plans = []
    for f in feature_map.features_of_type(FeatureType.DENSE_EMBEDDING):
        if f.source is None:
            # no source tag -> no join key; the dense feature must arrive in
            # the batch itself (never silently join on an unrelated id column)
            continue
        id_key = None
        for g in feature_map.features:
            if g.type == FeatureType.CATEGORICAL and g.source == f.source:
                id_key = g.name
                break
        if id_key is not None:
            plans.append((f.name, id_key))
    return plans
