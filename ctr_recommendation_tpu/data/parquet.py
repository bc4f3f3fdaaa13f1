"""Parquet input: columnar load + fixed-shape batch assembly.

Replaces the reference's row-major path (whole-parquet -> one dense 2-D numpy
array -> torch DataLoader workers -> per-batch pandas join, dataloader.py:10-121)
with a columnar design:

* the split is read column-wise via pyarrow (one pass, no per-row Python);
* list columns (``item_seq``) are padded/truncated ONCE at load into a dense
  (N, max_len) int32 matrix keeping the LAST max_len events
  (dataloader.py:113-115 semantics);
* the item_info join happens on device via :class:`ItemStore` (a gather), not
  per-batch pandas;
* batches are fixed-shape numpy slices — partial tails are padded and carry a
  ``__weight__`` mask so jit never sees a new shape.

Per-host sharding for multi-host training: ``TableData.shard(k, n)`` takes
every n-th row, so each host streams a disjoint 1/n of the split
(SURVEY §5.8: per-host loading feeding make_array_from_process_local_data).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from ctr_recommendation_tpu.config.schema import FeatureType
from ctr_recommendation_tpu.features.feature_map import FeatureMap


@dataclasses.dataclass
class TableData:
    """One split, fully columnar: name -> (N,) or (N, S) numpy array."""

    columns: dict[str, np.ndarray]
    num_rows: int

    def shard(self, index: int, count: int) -> "TableData":
        if count <= 1:
            return self
        cols = {k: v[index::count] for k, v in self.columns.items()}
        n = len(next(iter(cols.values()))) if cols else 0
        return TableData(cols, n)

    def take(self, idx: np.ndarray) -> dict[str, np.ndarray]:
        return {k: v[idx] for k, v in self.columns.items()}


def _pad_sequences(seqs, max_len: int, pad_id: int) -> np.ndarray:
    """list-of-lists -> (N, max_len) keeping the LAST max_len entries,
    left-padded with pad_id (pooling masks pads, so side is irrelevant to
    the mean; attention uses the mask too)."""
    n = len(seqs)
    out = np.full((n, max_len), pad_id, dtype=np.int32)
    for r, s in enumerate(seqs):
        s = np.asarray(s, dtype=np.int64)
        if s.size > max_len:
            s = s[-max_len:]
        if s.size:
            out[r, max_len - s.size :] = s
    return out


def _pad_list_column(col, max_len: int, pad_id: int) -> np.ndarray:
    """Pad a pyarrow list column via the native C++ kernel when possible
    (data/native/pad_seq.cc — operates on the raw arrow values/offsets
    buffers), else the Python row loop."""
    import pyarrow as pa

    from ctr_recommendation_tpu.data import native

    try:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if isinstance(arr, (pa.ListArray, pa.LargeListArray)) and arr.null_count == 0:
            offsets = np.asarray(arr.offsets, dtype=np.int64)
            values = np.asarray(arr.values, dtype=np.int64)
            return native.pad_sequences_from_offsets(values, offsets, max_len, pad_id)
    except Exception:
        pass
    return _pad_sequences(col.to_pylist(), max_len, pad_id)


def load_split(
    path: str,
    feature_map: FeatureMap,
    *,
    include_label: bool = True,
    columns: list[str] | None = None,
) -> TableData:
    """Read one parquet split into fixed-shape columnar arrays."""
    import pyarrow.parquet as pq

    wanted = columns or [
        f.name
        for f in feature_map.features
        if f.type != FeatureType.DENSE_EMBEDDING  # joined from ItemStore
    ]
    if include_label:
        wanted = wanted + [feature_map.label]

    pf = pq.ParquetFile(path)
    available = set(pf.schema_arrow.names)
    wanted = [c for c in wanted if c in available]
    table = pf.read(columns=wanted)

    spec_by_name = {f.name: f for f in feature_map.features}
    cols: dict[str, np.ndarray] = {}
    for name in wanted:
        col = table.column(name)
        spec = spec_by_name.get(name)
        if spec is not None and spec.type == FeatureType.SEQUENCE:
            cols[name] = _pad_list_column(col, spec.max_len, spec.pad_id)
        elif name == feature_map.label:
            cols[name] = col.to_numpy(zero_copy_only=False).astype(np.float32)
        else:
            arr = col.to_numpy(zero_copy_only=False)
            if arr.dtype == object:  # list column not declared as sequence
                arr = np.asarray([np.asarray(v) for v in arr])
            if np.issubdtype(arr.dtype, np.integer):
                arr = arr.astype(np.int32)
            else:
                arr = arr.astype(np.float32)
            cols[name] = arr
    return TableData(cols, table.num_rows)


def iter_batches(
    data: TableData,
    feature_map: FeatureMap,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = False,
    pad_final: bool = True,
    item_store=None,
    strict_items: bool = False,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield fixed-shape batch dicts (+ ``__weight__`` validity mask).

    Shuffling is a seeded full permutation per epoch (seed, epoch) — the
    deterministic analogue of the reference's torch DataLoader shuffle under
    seed 2025 (SURVEY §7 hard part (d)).
    """
    n = data.num_rows
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        order = rng.permutation(n)
    else:
        order = np.arange(n)

    # per-feature source pairing, same rule as the device-side join
    # (data/device_store.dense_join_plan): each dense feature joins on the
    # categorical sharing ITS source tag — never on an unrelated id column.
    # (A schema with dense features from several sources needs one store per
    # source; like the device path, the single store serves every pair.)
    from ctr_recommendation_tpu.data.device_store import dense_join_plan

    join_plan = dense_join_plan(feature_map) if item_store is not None else []

    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                return
            if pad_final:
                pad = np.zeros(batch_size - len(idx), dtype=idx.dtype)
                weight = np.concatenate(
                    [np.ones(len(idx), np.float32), np.zeros(len(pad), np.float32)]
                )
                idx = np.concatenate([idx, pad])
            else:
                weight = np.ones(len(idx), np.float32)
        else:
            weight = np.ones(batch_size, np.float32)
        batch = data.take(idx)
        for dense_name, id_key in join_plan:
            batch[dense_name] = item_store.lookup(batch[id_key], strict=strict_items)
        batch["__weight__"] = weight
        yield batch
