"""Pallas embedding row-gather kernel.

The lookup hot path (BASELINE.json north star: "lookup ... kernels at
speed-of-light per chip"). Uses ``PrefetchScalarGridSpec``: the ids arrive
before the kernel body runs, so each grid step's BlockSpec index_map selects
``table[ids[i]]`` directly and Mosaic's pipeline machinery double-buffers the
row DMAs HBM->VMEM back-to-back — a continuous gather stream with no gather
HLO in the middle.

Backward is the standard scatter-add (``table.at[ids].add(g)``), attached via
custom_vjp so the kernel is usable inside the training step.

For E=128 rows (512 B each) this is DMA-latency amortized by pipelining;
measure against XLA's native gather with benchmarks/bench_gather.py and pick
per shape — the trunk takes an injectable ``lookup`` either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_kernel(ids_ref, row_ref, out_ref):
    out_ref[:] = row_ref[:]


def _gather_impl(table: jax.Array, ids: jax.Array) -> jax.Array:
    b = ids.shape[0]
    v, e = table.shape
    ids_clipped = jnp.clip(ids.astype(jnp.int32), 0, v - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, e), lambda i, ids_ref: (ids_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, e), lambda i, ids_ref: (i, 0)),
    )
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((b, e), table.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * b * e * table.dtype.itemsize, transcendentals=0
        ),
    )(ids_clipped, table)


@jax.custom_vjp
def gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table (V, E), ids (B,) int -> rows (B, E). OOB ids clamp (callers
    validate ids; the embedding trunk never produces OOB)."""
    return _gather_impl(table, ids)


def _fwd(table, ids):
    # the table rides along as a residual only for its aval (no copy is made)
    return _gather_impl(table, ids), (table, ids)


def _bwd(res, g):
    table, ids = res
    v = table.shape[0]
    grad = jnp.zeros_like(table).at[jnp.clip(ids.astype(jnp.int32), 0, v - 1)].add(
        g.astype(table.dtype)
    )
    return grad, None


gather_rows.defvjp(_fwd, _bwd)


def pallas_lookup(tables: dict, name: str, ids: jax.Array) -> jax.Array:
    """trunk-compatible lookup using the kernel; sequences flatten to one
    gather then reshape."""
    table = tables[name]
    if ids.ndim == 1:
        return gather_rows(table, ids)
    flat = ids.reshape(-1)
    rows = gather_rows(table, flat)
    return rows.reshape(*ids.shape, table.shape[-1])
