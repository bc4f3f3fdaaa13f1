"""Row-sharded embedding lookup over the device mesh.

The centerpiece of the distributed design (SURVEY §2.3 "Embedding-table
parallel" row): tables live row-sharded P(model, None) across the mesh; a
lookup for ids sharded P(data) runs under ``shard_map`` as

    mask-gather-psum:  each model shard gathers the rows it owns (others
    contribute zeros) and a ``psum`` over the model axis assembles full rows.

Per lookup this moves |B|·E floats over ICI per model shard — for CTR shapes
(E=128, B≤16k) that is well under ICI bandwidth and much simpler than
dynamic-bucket all-to-all (which needs static per-shard capacities; a later
optimization). The backward pass is automatic: the transpose of gather is
scatter-add into the local shard, and the transpose of psum is identity, so
sparse gradients land on the owning shard without custom VJPs.

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


def round_up_vocab(vocab_size: int, multiple: int = VOCAB_ROUND) -> int:
    return ((vocab_size + multiple - 1) // multiple) * multiple


def sharded_lookup(
    table: jax.Array,
    ids: jax.Array,
    mesh: Mesh,
    *,
    model_axis: str = "model",
    data_axis: str = "data",
) -> jax.Array:
    """table (V, E) sharded P(model, None); ids (B, ...) sharded P(data).
    Returns rows (B, ..., E) sharded P(data)."""
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
    id_spec = P(data_axis, *([None] * (ids.ndim - 1)))
    out_spec = P(data_axis, *([None] * ids.ndim))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis, None), id_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    def _lookup(tbl, ids_):
        midx = jax.lax.axis_index(model_axis)
        local = ids_ - midx * rows_per
        ok = (local >= 0) & (local < rows_per)
        rows = tbl[jnp.clip(local, 0, rows_per - 1)]
        rows = jnp.where(ok[..., None], rows, jnp.zeros((), rows.dtype))
        return jax.lax.psum(rows, model_axis)

    return _lookup(table, ids)


def make_sharded_lookup(mesh: Mesh, model_axis: str = "model", data_axis: str = "data"):
    """A ``lookup(tables, name, ids)`` closure for models.trunk.apply."""

    def lookup(tables: dict, name: str, ids: jax.Array) -> jax.Array:
        return sharded_lookup(
            tables[name], ids, mesh, model_axis=model_axis, data_axis=data_axis
        )

    return lookup
