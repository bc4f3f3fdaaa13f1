"""Batched scoring path.

The reference's inference driver (src/Prediction.py) rebuilt the model,
loaded the best checkpoint, and looped a DataLoader at batch 8192 with a
per-batch pandas join (~163K rows/s including that join, SURVEY §6). Here:

* BatchNorm folded into the tower linears (ops/mlp.fold_batch_norm) so the
  serving forward is pure matmul+ReLU;
* the item_info join is a device gather (ItemStore loaded once);
* unknown items resolve to zero vectors (Prediction.py:39-42 semantics);
* optionally the whole interaction+tower runs as the fused Pallas scoring
  kernel (ops/pallas/scoring.py).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.config.schema import ExperimentConfig
from ctr_recommendation_tpu.features.feature_map import build_feature_map
from ctr_recommendation_tpu.models.registry import get_model
from ctr_recommendation_tpu.ops import mlp as mlp_ops


def build_scan_scorer(score, batch_size: int, num_batches: int, prologue=None):
    """ONE jitted program scoring ``num_batches`` fixed-size batches as a
    lax.scan over slices — the device program shared by the bulk
    score_table path and the pipelined chunk path. ``prologue(data)``
    optionally transforms the input (the wire unpack) before slicing.
    Callers must cache the returned function: rebuilding a jit closure per
    call re-traces and re-loads the executable (~1-2 s through remote
    setups for a ~55 ms scan — the round-4 bug)."""

    @jax.jit
    def score_all(params, model_state, mm_tables, data):
        if prologue is not None:
            data = prologue(data)

        def body(_, i):
            batch = {
                k: jax.lax.dynamic_slice_in_dim(v, i * batch_size, batch_size)
                for k, v in data.items()
            }
            return None, score(params, model_state, mm_tables, batch)

        _, probs = jax.lax.scan(
            body, None, jnp.arange(num_batches, dtype=jnp.int32)
        )
        return probs.reshape(-1)

    return score_all


class Predictor:
    def __init__(
        self,
        experiment: ExperimentConfig,
        params: dict,
        model_state: dict,
        *,
        fold_bn: bool = True,
        item_store=None,
    ):
        self.exp = experiment
        self.fm = build_feature_map(experiment.dataset)
        self.module = get_model(experiment.model.model)
        self.params = params
        self.model_state = model_state
        self._fold_bn = fold_bn

        if fold_bn and "mlp" in params and "mlp" in model_state:
            folded = dict(params)
            folded["mlp"] = mlp_ops.fold_batch_norm(params["mlp"], model_state["mlp"])
            self.params = folded
            self.model_state = dict(model_state)
            self.model_state["mlp"] = {
                "layers": [{} for _ in folded["mlp"]["layers"]]
            }

        fm, cfg = self.fm, experiment.model
        # Serving dtypes MIRROR the trainer's eval step exactly so the
        # evaluate CLI reproduces the AUC/logloss the trainer selected on:
        # the trunk always runs at train.compute_dtype; the model pins its
        # own tower to fp32 when tower_dtype="float32" (models/*.py td), and
        # the fused kernel gets the matching tower dtype below.
        compute_dtype = jnp.dtype(experiment.train.compute_dtype)
        tower_dtype = (
            jnp.dtype(jnp.float32)
            if cfg.tower_dtype == "float32"
            else compute_dtype
        )

        # device-resident item join (see data/device_store.py); the matrix is
        # uploaded ONCE and shared by every plan entry
        from ctr_recommendation_tpu.data.device_store import (
            DeviceItemStore,
            dense_join_plan,
            device_join as _device_join,
        )

        self._join_plan = dense_join_plan(fm)
        self._mm_tables: dict[str, jax.Array] = {}
        if item_store is not None and self._join_plan:
            emb = DeviceItemStore.from_host(item_store).emb
            for dense_name, _ in self._join_plan:
                self._mm_tables[dense_name] = emb

        join_plan = self._join_plan
        from ctr_recommendation_tpu.features.hashing import apply_hashing, hash_plan

        hplan = hash_plan(fm)

        def device_join(feats, mm_tables):
            # join by RAW ids first, then hash for the embedding lookup —
            # mirrors Trainer._device_join exactly
            return apply_hashing(_device_join(feats, mm_tables, join_plan), hplan)

        use_fused = (
            cfg.use_pallas
            and self._fold_bn
            and cfg.model in ("fibinet", "mm_fibinet", "sasrec_fibinet")
            and len(cfg.hidden_units) == 2
            and "mlp" in self.params
        )
        if use_fused:
            from ctr_recommendation_tpu.models import trunk as trunk_mod
            from ctr_recommendation_tpu.ops.pallas.scoring import fused_score

            seq_pooling = self.module.SEQ_POOLING

            @jax.jit
            def score(params, model_state, mm_tables, batch):
                batch = device_join(dict(batch), mm_tables)
                x = trunk_mod.apply(
                    params["trunk"], fm, cfg, batch,
                    seq_pooling=seq_pooling, train=False,
                    compute_dtype=compute_dtype,
                )
                return fused_score(
                    params["senet"], params["bilinear"], params["mlp"], x,
                    bilinear_type=cfg.bilinear_type,
                    compute_dtype=tower_dtype,
                )

        else:

            @jax.jit
            def score(params, model_state, mm_tables, batch):
                batch = device_join(dict(batch), mm_tables)
                logits, _ = self.module.apply(
                    params, model_state, fm, cfg, batch,
                    train=False, compute_dtype=compute_dtype,
                )
                return jax.nn.sigmoid(logits)

        self._score = score
        # score_table's scan program, cached per (batch_size, num_batches,
        # column spec). Rebuilding a fresh jax.jit closure on every call
        # (round ≤4 behavior) re-traced + re-loaded the executable each
        # time — ~1-2 s of pure host/tunnel overhead per call vs the ~55 ms
        # the 47x8192 scan actually runs on device.
        self._bulk_cache: dict[tuple, object] = {}

    def _bulk_scorer(self, batch_size: int, num_batches: int, cols: dict):
        key = (
            batch_size,
            num_batches,
            tuple(sorted((k, v.shape[1:], str(v.dtype)) for k, v in cols.items())),
        )
        fn = self._bulk_cache.get(key)
        if fn is None:
            fn = self._bulk_cache[key] = build_scan_scorer(
                self._score, batch_size, num_batches
            )
        return fn

    def __call__(self, batch: dict[str, np.ndarray]) -> jax.Array:
        feats = {
            k: v
            for k, v in batch.items()
            if k not in (self.fm.label, "__weight__")
        }
        return self._score(self.params, self.model_state, self._mm_tables, feats)

    def predict_all(self, batches: Iterator[dict]) -> np.ndarray:
        out = []
        for batch in batches:
            probs = np.asarray(self(batch))
            w = np.asarray(batch.get("__weight__", np.ones(len(probs))))
            out.append(probs[w > 0])
        return np.concatenate(out) if out else np.zeros((0,), np.float32)

    def score_table(self, table, batch_size: int = 8192) -> np.ndarray:
        """Bulk-score a whole TableData split as ONE device program: columns
        uploaded once, a jitted lax.scan slices fixed-size batches and runs
        the (fused-kernel) scoring step per slice — no per-batch host
        dispatch. This is the reference-workload path bench.py measures
        (47x8192 rows; ~7.4M rows/s on the chip vs the reference's 163K)."""
        import jax.numpy as jnp

        from ctr_recommendation_tpu.config.schema import FeatureType

        n = table.num_rows
        if n == 0:
            return np.zeros((0,), np.float32)
        num_batches = -(-n // batch_size)
        padded = num_batches * batch_size
        # only model-read columns go over the wire: PLACEHOLDER fields
        # contribute a zeros embedding and read no column (trunk.py), and
        # DENSE_EMBEDDING columns are joined on device from the ItemStore
        dead = {
            f.name
            for f in self.fm.features
            if f.type in (FeatureType.PLACEHOLDER, FeatureType.DENSE_EMBEDDING)
        }
        cols = {}
        for k, v in table.columns.items():
            if k == self.fm.label or k in dead or k == "__weight__":
                continue
            pad = padded - n
            if pad:
                v = np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
            cols[k] = jax.device_put(v)

        score_all = self._bulk_scorer(batch_size, num_batches, cols)
        probs = score_all(self.params, self.model_state, self._mm_tables, cols)
        return np.asarray(probs[:n])
