"""Pallas embedding row-gather kernel.

The lookup hot path (BASELINE.json north star: "lookup ... kernels at
speed-of-light per chip"). The table stays in HBM (memory_space=ANY); ids
arrive via scalar prefetch (SMEM); each grid step owns a (TILE_B, E) output
block in VMEM and streams its rows with up to ``NBUF`` outstanding row DMAs
HBM->VMEM (double-buffered — the pallas_guide.md pipeline pattern), so DMA
latency is hidden behind the previous rows' transfers.

A plain BlockSpec-indexed gather (block (1, E) selected by id) is NOT legal
on hardware — Mosaic requires the sublane dim divisible by 8 — hence the
manual-DMA design.

Backward is the standard scatter-add (``table.at[ids].add(g)``) attached via
custom_vjp so the kernel is usable inside the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256
NBUF = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, tile_b):
    i = pl.program_id(0)
    base = i * tile_b

    def dma(r):
        gid = ids_ref[base + r]
        return pltpu.make_async_copy(
            table_ref.at[gid], out_ref.at[r], sems.at[r % NBUF]
        )

    for r0 in range(min(NBUF, tile_b)):
        dma(r0).start()

    def body(r, carry):
        dma(r).wait()

        @pl.when(r + NBUF < tile_b)
        def _():
            dma(r + NBUF).start()

        return carry

    jax.lax.fori_loop(0, tile_b, body, 0)


def _gather_impl(table: jax.Array, ids: jax.Array) -> jax.Array:
    b = ids.shape[0]
    v, e = table.shape
    tile_b = min(TILE_B, max(8, 1 << (b - 1).bit_length()))
    pad_b = (-b) % tile_b
    ids_clipped = jnp.clip(ids.astype(jnp.int32), 0, v - 1)
    if pad_b:
        ids_clipped = jnp.pad(ids_clipped, (0, pad_b))
    padded_b = b + pad_b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(padded_b // tile_b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec((tile_b, e), lambda i, ids_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile_b=tile_b),
        out_shape=jax.ShapeDtypeStruct((padded_b, e), table.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * padded_b * e * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(ids_clipped, table)
    return out[:b] if pad_b else out


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
