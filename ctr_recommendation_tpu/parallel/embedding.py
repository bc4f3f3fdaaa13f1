"""Row-sharded embedding lookup over the device mesh.

The centerpiece of the distributed design (SURVEY §2.3 "Embedding-table
parallel" row; BASELINE.json north star: "row-sharded across a multi-host TPU
mesh with all-to-all gather of looked-up rows"). Tables live row-sharded
P(model, None) across the mesh; lookups for ids sharded P(data) run under
``shard_map`` with one of two exchange strategies:

``all_to_all`` (default) — capacity-bucketed id routing:
    1. sort the local flat ids by owner shard (owner = id // rows_per);
    2. pack them into a static (mp, cap) send buffer,
       cap = ceil(capacity_factor * n / mp);
    3. ``lax.all_to_all`` the id buffer over the model axis, so each shard
       receives exactly the ids it owns;
    4. local gather from the shard's (rows_per, E) slice;
    5. ``lax.all_to_all`` the gathered rows back and unpermute.
    Per device this moves ~capacity_factor * n * E floats point-to-point
    (one way) instead of an all-reduce of the full n*E buffer (~2x the
    bytes), and each shard gathers only the rows it serves instead of
    every shard re-gathering the whole batch (the ×mp redundancy of the
    psum strategy). Correctness under skew is guaranteed: bucket overflow
    beyond cap is detected with a psum'd scalar (identical on every
    device, so all shards branch together) and only then does a
    ``lax.cond``-gated mask-gather-psum fallback pay the all-reduce.

``psum`` — mask-gather-psum: every shard gathers all n ids (zeros for rows
    it does not own) and a ``psum`` over the model axis assembles full rows.
    Simple and latency-optimal for tiny lookups; kept as the overflow
    fallback and for micro-batches where the sort isn't worth it.

Backward passes are automatic for both: the transpose of gather is
scatter-add into the owning shard, the transpose of all_to_all is the
reversed all_to_all, and the transpose of psum is identity — sparse
gradients land on the owning shard without custom VJPs.

Uneven vocabs: shard_map needs equal local shapes, so tables are padded to a
multiple of ``VOCAB_ROUND`` rows at init (ctr_recommendation_tpu/models/trunk.py
uses round_up via this module); padded rows are never addressed by real ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

# Tables are padded to a multiple of this many rows so any model-parallel
# degree up to 128 divides them evenly (and it matches the TPU lane width).
VOCAB_ROUND = 128

# Send-buffer slack over the perfectly-balanced n/mp ids per owner shard.
# Uniform ids give Binomial(n, 1/mp) bucket counts that concentrate tightly
# around n/mp (std sqrt(n/mp)), so 1.25x is many sigma of headroom while
# keeping the row exchange at 1.25*n*E floats one-way — under the ~2*n*E the
# psum all-reduce moves. Zipf-skewed batches that overflow a bucket are
# caught by the cond-gated psum fallback (correct, just not faster).
DEFAULT_CAPACITY_FACTOR = 1.25


def round_up_vocab(vocab_size: int, multiple: int = VOCAB_ROUND) -> int:
    return ((vocab_size + multiple - 1) // multiple) * multiple


def _psum_lookup_local(tbl, flat_ids, *, rows_per, model_axis):
    """Mask-gather-psum body (runs inside shard_map): every shard gathers all
    ids, contributing zeros for rows it does not own; psum assembles rows."""
    midx = jax.lax.axis_index(model_axis)
    local = flat_ids - midx * rows_per
    ok = (local >= 0) & (local < rows_per)
    rows = tbl[jnp.clip(local, 0, rows_per - 1)]
    rows = jnp.where(ok[..., None], rows, jnp.zeros((), rows.dtype))
    return jax.lax.psum(rows, model_axis)


def _all_to_all_lookup_local(
    tbl, flat_ids, *, rows_per, mp, cap, model_axis, want=None
):
    """Capacity-bucketed all-to-all body (runs inside shard_map).

    flat_ids: (n,) int32 local ids. Returns (n, E) rows.

    ``want``: optional (n,) bool — ids NOT wanted (pad positions) are kept
    out of the exchange entirely and return zero rows. Out-of-range ids are
    always unwanted and return zeros, matching the psum path's ownership
    mask (without this the clipped gather would serve an arbitrary real row
    for an invalid id).
    """
    n = flat_ids.shape[0]
    v = rows_per * mp
    valid = (flat_ids >= 0) & (flat_ids < v)
    want = valid if want is None else (want & valid)

    # owner = id // rows_per is monotone in id, so sorting by id makes the
    # buckets contiguous; unwanted ids get sort key v -> owner mp, PAST the
    # last bucket, so they consume no capacity and no wire bytes.
    key = jnp.where(want, flat_ids, jnp.asarray(v, flat_ids.dtype))
    order = jnp.argsort(key)
    sorted_ids = key[order]
    sorted_owner = sorted_ids // rows_per  # in [0, mp]; mp == unwanted
    # rank of each id within its owner bucket
    bucket_start = jnp.searchsorted(sorted_owner, jnp.arange(mp, dtype=sorted_owner.dtype))
    owner_c = jnp.clip(sorted_owner, 0, mp - 1)
    pos = jnp.arange(n) - bucket_start[owner_c]
    in_bucket = sorted_owner < mp
    fits = in_bucket & (pos < cap)

    # (mp, cap) send buffer; overflow/unwanted positions are dropped
    # (owner mp and slot cap are both out of range for mode="drop")
    send_ids = jnp.zeros((mp, cap), dtype=flat_ids.dtype)
    send_ids = send_ids.at[sorted_owner, jnp.where(fits, pos, cap)].set(
        sorted_ids, mode="drop"
    )
    # route ids to their owners: each shard receives the (peer, cap) requests
    recv_ids = jax.lax.all_to_all(send_ids, model_axis, split_axis=0, concat_axis=0)

    midx = jax.lax.axis_index(model_axis)
    local = recv_ids - midx * rows_per  # all owned by this shard (or padding)
    rows = tbl[jnp.clip(local, 0, rows_per - 1)]  # (mp, cap, E)
    # send the served rows back to their requesters
    recv_rows = jax.lax.all_to_all(rows, model_axis, split_axis=0, concat_axis=0)

    # unpermute: sorted position k was served by (owner[k], pos[k])
    out_sorted = recv_rows[owner_c, jnp.clip(pos, 0, cap - 1)]  # (n, E)

    # Overflow correctness: if ANY shard overflowed a bucket, all shards
    # (the psum'd count is identical everywhere) take the psum fallback for
    # the overflowed ids. Cold path — costs nothing when buckets fit.
    need_fb = in_bucket & ~fits
    total_overflow = jax.lax.psum(jnp.sum(need_fb), model_axis)

    def _with_fallback(args):
        out_sorted, sorted_ids, fits, need_fb = args
        fb = _psum_lookup_local(
            tbl,
            jnp.where(need_fb, sorted_ids, jnp.zeros((), sorted_ids.dtype)),
            rows_per=rows_per,
            model_axis=model_axis,
        )
        zero = jnp.zeros((), out_sorted.dtype)
        out = jnp.where(fits[..., None], out_sorted, zero)
        return jnp.where(need_fb[..., None], fb, out)

    out_sorted = jax.lax.cond(
        total_overflow > 0,
        _with_fallback,
        lambda args: jnp.where(args[2][..., None], args[0], jnp.zeros((), args[0].dtype)),
        (out_sorted, sorted_ids, fits, need_fb),
    )
    inv = jnp.argsort(order)
    return out_sorted[inv]


def sharded_lookup(
    table: jax.Array,
    ids: jax.Array,
    mesh: Mesh,
    *,
    model_axis: str = "model",
    data_axis: str = "data",
    method: str = "all_to_all",
    capacity_factor: float = DEFAULT_CAPACITY_FACTOR,
    batch_dim: int = 0,
    pad_id: int | None = None,
) -> jax.Array:
    """table (V, E) sharded P(model, None); ids sharded P(data) on axis
    ``batch_dim`` (the trunk looks mean-pooled sequences up transposed as
    (S, B) with batch_dim=1 — see models/trunk.py). Returns rows
    (ids.shape..., E) sharded P(data) on the same axis.

    ``pad_id``: when set, pad ids skip the all_to_all exchange and return
    zero rows. This is EXACT, not an approximation: the pad row is zeroed at
    init and receives no gradient (torch padding_idx parity,
    ops/initializers.py embedding_init), so its row is zero for the table's
    whole life. Padded sequences concentrate 30-70% of ids on the pad-owning
    shard — without exclusion that shard's bucket overflows on essentially
    every real batch and the psum fallback runs every step on top of the
    exchange."""
    mp = mesh.shape[model_axis]
    if mp == 1:
        return table[ids]
    v = table.shape[0]
    if v % mp:
        raise ValueError(
            f"table rows {v} not divisible by model-parallel degree {mp}; "
            "pad with round_up_vocab()"
        )
    rows_per = v // mp
    id_axes = [None] * ids.ndim
    id_axes[batch_dim] = data_axis
    id_spec = P(*id_axes)
    out_spec = P(*id_axes, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis, None), id_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    def _lookup(tbl, ids_):
        shape = ids_.shape
        flat = ids_.reshape(-1).astype(jnp.int32)
        if method == "psum":
            rows = _psum_lookup_local(
                tbl, flat, rows_per=rows_per, model_axis=model_axis
            )
        elif method == "all_to_all":
            n = flat.shape[0]
            cap = max(1, -(-int(capacity_factor * n) // mp))
            want = None if pad_id is None else (flat != pad_id)
            rows = _all_to_all_lookup_local(
                tbl, flat, rows_per=rows_per, mp=mp, cap=cap,
                model_axis=model_axis, want=want,
            )
        else:
            raise ValueError(f"unknown lookup method {method!r}")
        return rows.reshape(*shape, -1)

    return _lookup(table, ids)


def exchange_stats(
    ids,
    *,
    vocab_rows: int,
    dp: int,
    mp: int,
    capacity_factor: float = DEFAULT_CAPACITY_FACTOR,
    pad_id: int | None = None,
) -> dict:
    """Host-side mirror of the all_to_all routing math for ONE batch of ids:
    what the dryrun/monitoring reports without instrumenting the jitted
    path. Returns the chosen strategy, per-data-shard bucket capacity, the
    max wanted-ids-per-bucket observed, and the overflow count (ids that
    would take the cond-gated psum fallback). Mirrors
    _all_to_all_lookup_local exactly: ids are flattened per data shard
    (batch axis split dp ways), owner = id // rows_per, pad ids excluded."""
    import numpy as np

    ids = np.asarray(ids)
    if mp == 1:
        return {
            "strategy": "local_gather",
            "capacity": None,
            "max_bucket": None,
            "overflow": 0,
        }
    rows_per = vocab_rows // mp
    per_shard = np.array_split(ids, dp, axis=0)
    n_local = per_shard[0].reshape(-1).shape[0]
    cap = max(1, -(-int(capacity_factor * n_local) // mp))
    overflow = 0
    max_bucket = 0
    for shard_ids in per_shard:
        flat = shard_ids.reshape(-1)
        want = (flat >= 0) & (flat < rows_per * mp)
        if pad_id is not None:
            want &= flat != pad_id
        owners = flat[want] // rows_per
        counts = np.bincount(owners, minlength=mp)
        max_bucket = max(max_bucket, int(counts.max()) if len(counts) else 0)
        overflow += int(np.maximum(counts - cap, 0).sum())
    return {
        "strategy": "all_to_all",
        "capacity": cap,
        "max_bucket": max_bucket,
        "overflow": overflow,
    }


# Tables at or below this many (padded) rows skip the exchange entirely:
# a plain gather lets GSPMD all-gather the whole small table (KBs) once,
# which is far cheaper than bucketing/psum-ing B*E rows of lookups. The
# MicroLens category table (11 rows padded to 128) lives here.
SMALL_TABLE_ROWS = 1024


def make_sharded_lookup(
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    *,
    method: str = "all_to_all",
    capacity_factor: float = DEFAULT_CAPACITY_FACTOR,
    feature_map=None,
    small_table_rows: int = SMALL_TABLE_ROWS,
):
    """A ``lookup(tables, name, ids)`` closure for models.trunk.apply.

    ``feature_map``: when given, each table's pad id (features/feature_map.py
    TableSpec.pad_id) routes pad positions OUT of the all_to_all exchange —
    see ``sharded_lookup(pad_id=...)``. Without it, padded sequence batches
    overflow the pad-owning shard's bucket every step."""

    def lookup(
        tables: dict, name: str, ids: jax.Array, feature=None, batch_dim=0
    ) -> jax.Array:
        tbl = tables[name]
        if tbl.shape[0] <= small_table_rows:
            return tbl[ids]
        pad_id = None
        if feature_map is not None:
            try:
                pad_id = feature_map.table(name).pad_id
            except (KeyError, StopIteration):
                pad_id = None
        return sharded_lookup(
            tbl,
            ids,
            mesh,
            model_axis=model_axis,
            data_axis=data_axis,
            method=method,
            capacity_factor=capacity_factor,
            batch_dim=batch_dim,
            pad_id=pad_id,
        )

    return lookup
