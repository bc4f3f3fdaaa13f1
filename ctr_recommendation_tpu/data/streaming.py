"""Streaming parquet input for splits too large to hold in host RAM.

``load_split`` (data/parquet.py) materializes a whole split columnar-style —
right for MicroLens-scale (~4M rows). For production-scale logs the streaming
reader iterates arrow record batches row-group by row-group:

* row groups are assigned round-robin per host (disjoint coverage), and their
  order is shuffled per (seed, epoch);
* rows inside a shuffle window (``shuffle_buffer`` batches) are permuted, so
  shuffling is local-window rather than global — the standard streaming
  trade-off;
* emitted batches have identical structure to ``iter_batches`` (fixed
  shapes, ``__weight__`` masks, native-padded sequences).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ctr_recommendation_tpu.config.schema import FeatureType
from ctr_recommendation_tpu.data.parquet import _pad_list_column
from ctr_recommendation_tpu.features.feature_map import FeatureMap


def _record_batch_to_columns(rb, feature_map: FeatureMap, include_label: bool):
    spec_by_name = {f.name: f for f in feature_map.features}
    cols: dict[str, np.ndarray] = {}
    for name in rb.schema.names:
        spec = spec_by_name.get(name)
        is_label = name == feature_map.label
        if spec is None and not is_label:
            continue
        if is_label and not include_label:
            continue
        col = rb.column(name)
        if spec is not None and spec.type == FeatureType.SEQUENCE:
            cols[name] = _pad_list_column(col, spec.max_len, spec.pad_id)
        elif is_label:
            cols[name] = col.to_numpy(zero_copy_only=False).astype(np.float32)
        elif spec is not None and spec.type == FeatureType.DENSE_EMBEDDING:
            cols[name] = np.asarray(col.to_pylist(), dtype=np.float32)
        else:
            arr = col.to_numpy(zero_copy_only=False)
            cols[name] = arr.astype(
                np.int32 if np.issubdtype(arr.dtype, np.integer) else np.float32
            )
    return cols


def common_step_count(path: str, batch_size: int, host_count: int = 1) -> int:
    """Per-epoch batch count every host can safely run in lockstep.

    Round-robin row-group assignment gives hosts different row counts, so
    their ``stream_batches(drop_last=True)`` iterators yield different batch
    counts — and under multi-controller training a host that exits its batch
    loop early deadlocks the others inside the next step's collectives. All
    row-group sizes live in the (shared) parquet footer, so every host can
    deterministically compute min_h floor(rows_h / batch_size) and truncate
    its iterator to it (cli/train.py does this via itertools.islice)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    rows_per_host = [0] * max(host_count, 1)
    for g in range(md.num_row_groups):
        rows_per_host[g % host_count] += md.row_group(g).num_rows
    return min(r // batch_size for r in rows_per_host)


def stream_batches(
    path: str,
    feature_map: FeatureMap,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    shuffle_buffer: int = 8,
    host_index: int = 0,
    host_count: int = 1,
    include_label: bool = True,
    item_store=None,
    drop_last: bool = False,
    strict_items: bool = False,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield fixed-shape batch dicts without loading the split into RAM."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    groups = [g for g in range(pf.num_row_groups) if g % host_count == host_index]
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, host_index]))
    if shuffle:
        rng.shuffle(groups)

    # per-feature source pairing, same rule as the device-side join
    # (data/device_store.dense_join_plan)
    from ctr_recommendation_tpu.data.device_store import dense_join_plan

    join_plan = dense_join_plan(feature_map) if item_store is not None else []

    # project to the columns the feature map actually consumes — decoding
    # every column of a production-scale log per row group is wasted IO/CPU
    spec_names = {f.name for f in feature_map.features}
    wanted = [
        c
        for c in pf.schema_arrow.names
        if c in spec_names or (include_label and c == feature_map.label)
    ]

    window: dict[str, list[np.ndarray]] = {}
    window_rows = 0
    target_window = max(batch_size * shuffle_buffer, batch_size)

    def flush(final: bool):
        nonlocal window, window_rows
        if not window_rows:
            return
        cols = {k: np.concatenate(v) for k, v in window.items()}
        n = window_rows
        order = rng.permutation(n) if shuffle else np.arange(n)
        emit_until = n if final else (n // batch_size) * batch_size
        for start in range(0, emit_until, batch_size):
            idx = order[start : start + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    break
                pad = np.zeros(batch_size - len(idx), idx.dtype)
                weight = np.concatenate(
                    [np.ones(len(idx), np.float32), np.zeros(len(pad), np.float32)]
                )
                idx = np.concatenate([idx, pad])
            else:
                weight = np.ones(batch_size, np.float32)
            batch = {k: v[idx] for k, v in cols.items()}
            for dense_name, jk in join_plan:
                batch[dense_name] = item_store.lookup(
                    batch[jk], strict=strict_items
                )
            batch["__weight__"] = weight
            yield batch
        # carry the un-emitted tail into the next window
        if final:
            window, window_rows = {}, 0
        else:
            keep = order[emit_until:]
            window = {k: [v[keep]] for k, v in cols.items()}
            window_rows = len(keep)

    for g in groups:
        for rb in pf.iter_batches(
            batch_size=batch_size * 4, row_groups=[g], columns=wanted
        ):
            cols = _record_batch_to_columns(rb, feature_map, include_label)
            for k, v in cols.items():
                window.setdefault(k, []).append(v)
            window_rows += rb.num_rows
            if window_rows >= target_window:
                yield from flush(final=False)
    yield from flush(final=True)
