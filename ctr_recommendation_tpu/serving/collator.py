"""Request rows -> fixed-shape scoring batches.

Online requests arrive as JSON rows ({"item_id": 7, "item_seq": [3, 9], ...}).
The device program wants the same columnar batch the offline path feeds the
Predictor (data/parquet.py batch contract): int32 (B,) categoricals, (B, S)
left-padded sequences, optional (B, D) dense vectors, plus a ``__weight__``
mask marking pad rows. To keep jit compilation bounded, the collator rounds
every batch up to a fixed menu of bucket sizes — each bucket compiles once
and is reused forever.
"""

from __future__ import annotations

import numpy as np

from ctr_recommendation_tpu.config.schema import FeatureType
from ctr_recommendation_tpu.data.parquet import _pad_sequences
from ctr_recommendation_tpu.features.feature_map import FeatureMap

DEFAULT_BUCKETS = (16, 64, 256, 1024, 4096, 8192)


class RequestCollator:
    """Collate request rows into the Predictor's columnar batch contract."""

    def __init__(self, fm: FeatureMap, buckets: tuple[int, ...] = DEFAULT_BUCKETS):
        if not buckets or any(b <= 0 for b in buckets):
            raise ValueError(f"invalid bucket sizes: {buckets}")
        self.fm = fm
        self.buckets = tuple(sorted(set(buckets)))
        # model-visible input columns (PLACEHOLDER fields contribute a zeros
        # embedding and read no column; LABEL/META never reach the model)
        self.features = tuple(
            f
            for f in fm.features
            if f.type
            in (
                FeatureType.CATEGORICAL,
                FeatureType.SEQUENCE,
                FeatureType.DENSE_EMBEDDING,
            )
        )

    @property
    def max_batch(self) -> int:
        return self.buckets[-1]

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"request of {n} rows exceeds the largest bucket "
            f"{self.buckets[-1]}; split it client-side or raise --max-batch"
        )

    def collate(self, rows: list[dict]) -> tuple[dict[str, np.ndarray], int]:
        """rows -> (columnar batch padded to a bucket, n_valid).

        DENSE_EMBEDDING columns may be omitted entirely (the Predictor's
        device-side item join fills them from the id column, the tolerant
        Prediction.py:39-42 semantics); if ANY row supplies one, every row
        must, so a batch never silently mixes client vectors with joins.
        """
        n = len(rows)
        if n == 0:
            raise ValueError("empty request: no rows to score")
        padded = self.bucket_for(n)
        batch: dict[str, np.ndarray] = {}
        for f in self.features:
            if f.type == FeatureType.CATEGORICAL:
                col = np.zeros((padded,), np.int32)
                for i, r in enumerate(rows):
                    col[i] = int(r.get(f.name, 0))
                batch[f.name] = col
            elif f.type == FeatureType.SEQUENCE:
                seqs = [r.get(f.name) or [] for r in rows]
                seqs += [[] for _ in range(padded - n)]
                batch[f.name] = _pad_sequences(seqs, f.max_len, f.pad_id or 0)
            else:  # DENSE_EMBEDDING
                present = [f.name in r for r in rows]
                if not any(present):
                    continue  # device join fills it from the source id
                if not all(present):
                    raise ValueError(
                        f"column {f.name!r}: supplied by only "
                        f"{sum(present)}/{n} rows — send it on every row or "
                        "on none (server-side join)"
                    )
                col = np.zeros((padded, f.dense_dim), np.float32)
                for i, r in enumerate(rows):
                    v = np.asarray(r[f.name], np.float32)
                    if v.shape != (f.dense_dim,):
                        raise ValueError(
                            f"column {f.name!r} row {i}: expected "
                            f"{f.dense_dim} floats, got shape {v.shape}"
                        )
                    col[i] = v
                batch[f.name] = col
        w = np.zeros((padded,), np.float32)
        w[:n] = 1.0
        batch["__weight__"] = w
        return batch, n
