"""Sparse (touched-rows-only) embedding-table updates.

The reference — like most torch CTR code — keeps dense ``nn.Embedding``
tables and lets Adam stream the FULL table + both moment buffers through HBM
every step (~140 MB/step for the 91718x128 MicroLens table). The TPU-native
answer (BASELINE.json north star: "sparse optimizer state (AdamW/Adagrad)"):

1. collect every id a batch looks up per table, ``jnp.unique`` them with a
   static size (the total id count, so jit shapes stay fixed; the tail is
   filled with ``vocab_rows``, an out-of-range sentinel);
2. gather only those rows and differentiate with respect to the GATHERED
   rows — duplicates are segment-summed by the scatter-add transpose of the
   ``rows[searchsorted(uids, ids)]`` remap, so the row gradient is exactly
   the dense table gradient restricted to its nonzero rows;
3. update only the touched rows of the table and of the optimizer state
   (``.at[uids].add/set`` with mode="drop" so sentinel slots vanish).

HBM traffic per step becomes O(ids * E) instead of O(vocab * E) — the win
grows with vocab size, which is the regime the north star names (multi-host
row-sharded tables).

Semantics vs the dense path:

* ``adagrad``  — per-element (V, E) accumulator, exactly optax
  ``scale_by_rss``: untouched rows have zero grad, so their accumulator and
  value are bit-identical to the dense path when weight_decay == 0 (tested).
  With weight_decay > 0, decay is applied lazily (touched rows only) — the
  standard sparse-optimizer trade.
* ``rowwise_adagrad`` — (V, 1) accumulator over the row-mean squared grad
  (the classic TPU embedding-optimizer layout): 128x less optimizer memory;
  no dense twin.
* ``adam`` — lazy Adam: (V, E) mu/nu updated at touched rows with
  global-step bias correction. Identical to dense Adam while every row is
  touched every step (tested); untouched rows skip their momentum decay.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import TrainConfig

TABLE_OPTIMIZERS = ("adagrad", "rowwise_adagrad", "adam")


def _uniquify_sentinels(uids: jax.Array, vocab_rows: int) -> jax.Array:
    """Spread the unique buffer's fill slots (all ``vocab_rows``) across
    ``vocab_rows, vocab_rows+1, ...`` so the array is GENUINELY unique — the
    ``.at[uids].set/add`` calls in :class:`TableOptimizer` promise
    ``unique_indices=True``, whose behavior is undefined for duplicate
    indices even out-of-range ones. The spread stays sorted and entirely
    out of range, so ``mode='drop'`` still discards every sentinel slot."""
    idx = jnp.arange(uids.size, dtype=uids.dtype)
    first = jnp.searchsorted(uids, jnp.asarray(vocab_rows, uids.dtype))
    return jnp.where(uids >= vocab_rows, vocab_rows + (idx - first), uids)


def dedup_ids(ids: jax.Array, vocab_rows: int) -> jax.Array:
    """Sorted unique ids with static shape ``ids.size``; the tail is padded
    with unique out-of-range sentinels ``vocab_rows, vocab_rows+1, ...``
    (keeps the array sorted AND unique, so scatter calls may promise
    ``unique_indices=True``)."""
    flat = ids.reshape(-1).astype(jnp.int32)
    # distinct real ids can't exceed the vocab, so the buffer is capped there
    # (matters when batch * seq_len >> vocab)
    uids = jnp.unique(flat, size=min(flat.size, vocab_rows), fill_value=vocab_rows)
    return _uniquify_sentinels(uids, vocab_rows)


def dedup_ids_inverse(
    ids: jax.Array, vocab_rows: int
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`dedup_ids` but also returns the inverse map (position of
    each input element in the unique array) — the remap the train step bakes
    into the batch so the in-loss lookup is a plain ``rows[idx]`` gather with
    no per-lookup ``searchsorted`` binary search."""
    flat = ids.reshape(-1).astype(jnp.int32)
    uids, inv = jnp.unique(
        flat, size=min(flat.size, vocab_rows), fill_value=vocab_rows,
        return_inverse=True,
    )
    return _uniquify_sentinels(uids, vocab_rows), inv.astype(jnp.int32)


def gather_rows(table: jax.Array, uids: jax.Array) -> jax.Array:
    """Rows for unique ids; sentinel slots gather a clipped row whose value
    is never used (nothing maps to them) and whose updates are dropped."""
    return table[jnp.clip(uids, 0, table.shape[0] - 1)]


@dataclasses.dataclass(frozen=True)
class TableOptimizer:
    """Touched-rows-only optimizer for the embedding tables."""

    kind: str  # "adagrad" | "rowwise_adagrad" | "adam"
    schedule: Callable[[jax.Array], jax.Array]
    weight_decay: float = 0.0
    # Accumulator starts at ZERO (torch.optim.Adagrad's default
    # initial_accumulator_value): the first update of a row is then
    # lr * g/sqrt(g^2) = lr * sign-ish — the normalized bootstrap embeddings
    # need. The earlier optax-default 0.1 floor was the round-3 "-0.08 AUC"
    # bug: CTR embedding grads are ~1e-3-1e-4, so sum(g^2) stays far below
    # 0.1 for the whole run and every update collapsed to lr * g * 3.16 —
    # the tables moved ~1e-6/20 steps vs Adam's ~6e-2 (measured; the
    # masked-dense `acc > 0` guard keeps untouched rows exactly fixed
    # either way). optim.py's dense "adagrad" chain uses the same 0.0.
    rss_init: float = 0.0
    rss_eps: float = 1e-10  # matches optim.py scale_by_rss(eps=1e-10) / torch
    b1: float = 0.9
    b2: float = 0.999
    adam_eps: float = 1e-8

    def init(self, tables: dict[str, jax.Array]) -> dict[str, Any]:
        if self.kind == "adagrad":
            return {
                name: {"acc": jnp.full_like(t, self.rss_init)}
                for name, t in tables.items()
            }
        if self.kind == "rowwise_adagrad":
            return {
                name: {"acc": jnp.full((t.shape[0], 1), self.rss_init, t.dtype)}
                for name, t in tables.items()
            }
        if self.kind == "adam":
            return {
                name: {"mu": jnp.zeros_like(t), "nu": jnp.zeros_like(t)}
                for name, t in tables.items()
            }
        raise ValueError(f"unknown table optimizer {self.kind!r}")

    def update(
        self,
        tables: dict[str, jax.Array],
        tstate: dict[str, Any],
        uids: dict[str, jax.Array],
        row_grads: dict[str, jax.Array],
        step: jax.Array,
    ) -> tuple[dict[str, jax.Array], dict[str, Any]]:
        """step = number of completed steps (the schedule/bias-correction
        count is step + 1, matching optax's safe_increment)."""
        lr = self.schedule(step)
        count = (step + 1).astype(jnp.float32)
        new_tables, new_state = {}, {}
        for name, table in tables.items():
            u, g = uids[name], row_grads[name]
            st = tstate[name]
            rows = gather_rows(table, u)
            if self.kind in ("adagrad", "rowwise_adagrad"):
                acc_rows = gather_rows(st["acc"], u)
                if self.kind == "rowwise_adagrad":
                    acc_rows = acc_rows + jnp.mean(g * g, axis=-1, keepdims=True)
                else:
                    acc_rows = acc_rows + g * g
                upd = jnp.where(acc_rows > 0, jax.lax.rsqrt(acc_rows + self.rss_eps), 0.0) * g
                # dense-chain parity (optim.py "adagrad"): decay is added
                # AFTER the rss scaling, before the lr scaling
                if self.weight_decay:
                    upd = upd + self.weight_decay * rows
                new_state[name] = {"acc": st["acc"].at[u].set(
                    acc_rows, mode="drop", indices_are_sorted=True, unique_indices=True
                )}
            elif self.kind == "adam":
                # dense-chain parity (optim.py "adam" / torch Adam): L2 decay
                # joins the gradient BEFORE the moments
                if self.weight_decay:
                    g = g + self.weight_decay * rows
                mu_rows = self.b1 * gather_rows(st["mu"], u) + (1 - self.b1) * g
                nu_rows = self.b2 * gather_rows(st["nu"], u) + (1 - self.b2) * g * g
                mu_hat = mu_rows / (1 - self.b1**count)
                nu_hat = nu_rows / (1 - self.b2**count)
                upd = mu_hat / (jnp.sqrt(nu_hat) + self.adam_eps)
                new_state[name] = {
                    "mu": st["mu"].at[u].set(
                        mu_rows, mode="drop",
                        indices_are_sorted=True, unique_indices=True,
                    ),
                    "nu": st["nu"].at[u].set(
                        nu_rows, mode="drop",
                        indices_are_sorted=True, unique_indices=True,
                    ),
                }
            else:  # pragma: no cover
                raise ValueError(self.kind)
            # uids are sorted AND unique (real ids deduped, sentinel tail
            # spread by _uniquify_sentinels): the flags let XLA emit a
            # vectorized collision-free scatter instead of the serialized
            # general form (~40% faster at MicroLens id counts, measured
            # round 3).
            new_tables[name] = table.at[u].add(
                (-lr * upd).astype(table.dtype), mode="drop",
                indices_are_sorted=True, unique_indices=True,
            )
        return new_tables, new_state


    def update_dense(
        self,
        tables: dict[str, jax.Array],
        tstate: dict[str, Any],
        dense_grads: dict[str, jax.Array],
        step: jax.Array,
    ) -> tuple[dict[str, jax.Array], dict[str, Any]]:
        """Masked-dense execution strategy: same lazy touched-rows-only
        semantics, computed as full-table elementwise ops gated by
        ``touched = any(|g| > 0)`` per row — no sort, no searchsorted, no
        extra scatters. This is the fast path when the vocab is comparable
        to the batch's id count (e.g. MicroLens: ~86K ids/step vs 92K rows),
        where the gathered-rows path's dedup sort + scatter traffic exceeds
        the full-table elementwise cost. Rows whose gradient is exactly zero
        are treated as untouched (they carry no gradient information; this
        only skips their lazy decay, and is bit-identical for wd=0)."""
        lr = self.schedule(step)
        count = (step + 1).astype(jnp.float32)
        new_tables, new_state = {}, {}
        for name, table in tables.items():
            g = dense_grads[name]
            st = tstate[name]
            touched = jnp.any(g != 0, axis=-1, keepdims=True)  # (V, 1)
            if self.kind in ("adagrad", "rowwise_adagrad"):
                if self.kind == "rowwise_adagrad":
                    acc = st["acc"] + jnp.mean(g * g, axis=-1, keepdims=True)
                else:
                    acc = st["acc"] + g * g
                upd = jnp.where(acc > 0, jax.lax.rsqrt(acc + self.rss_eps), 0.0) * g
                if self.weight_decay:
                    upd = upd + jnp.where(touched, self.weight_decay * table, 0.0)
                new_state[name] = {"acc": acc}
            elif self.kind == "adam":
                if self.weight_decay:
                    g = g + jnp.where(touched, self.weight_decay * table, 0.0)
                mu = jnp.where(touched, self.b1 * st["mu"] + (1 - self.b1) * g, st["mu"])
                nu = jnp.where(
                    touched, self.b2 * st["nu"] + (1 - self.b2) * g * g, st["nu"]
                )
                mu_hat = mu / (1 - self.b1**count)
                nu_hat = nu / (1 - self.b2**count)
                upd = jnp.where(touched, mu_hat / (jnp.sqrt(nu_hat) + self.adam_eps), 0.0)
                new_state[name] = {"mu": mu, "nu": nu}
            else:  # pragma: no cover
                raise ValueError(self.kind)
            new_tables[name] = table - (lr * upd).astype(table.dtype)
        return new_tables, new_state


def multi_feature_lookup(table: jax.Array, *ids: jax.Array):
    """Per-feature gathers from one table whose BACKWARD is a single merged
    scatter-add.

    Forward: one plain ``table[ids_k]`` per feature — the layouts XLA
    already gathers at ~300 GB/s (the caller passes sequence ids in the
    trunk's transposed (S, B) order). Backward: concatenate the cotangents
    (row-major per segment, matching ``ids_k.reshape(-1)``) and emit ONE
    scatter-add into a zeros table. TPU v5e dispatches scatters at a flat
    ~10 ns/row regardless of payload (docs/PERFORMANCE.md round-3 scatter
    study), so N features sharing a table cost one scatter's dispatch
    instead of N — the round-4 roofline measured the split scatters at
    815 + 300 us/step vs ~785 us merged at MicroLens shapes (item_id +
    item_seq, 86016 rows). The cotangent concatenate fuses into the
    scatter's operand read. Integer id cotangents are None (ids are
    non-differentiable)."""

    tshape, tdtype = table.shape, table.dtype  # static; legal in bwd

    @jax.custom_vjp
    def f(table, *ids):
        return tuple(table[i] for i in ids)

    def fwd(table, *ids):
        return f(table, *ids), ids

    def bwd(ids_res, cots):
        flat_ids = jnp.concatenate([i.reshape(-1) for i in ids_res])
        flat_cot = jnp.concatenate(
            [c.reshape(-1, c.shape[-1]).astype(tdtype) for c in cots]
        )
        dtable = jnp.zeros(tshape, tdtype).at[flat_ids].add(flat_cot)
        return (dtable,) + (None,) * len(ids_res)

    f.defvjp(fwd, bwd)
    return f(table, *ids)


# Per-table execution strategy: the gathered-rows path pays a dedup sort and
# ~3 extra large scatter/gathers, which only amortize when the table is much
# larger than the batch's id count. Below this vocab/ids ratio the
# masked-dense strategy (full-table elementwise, no sort/scatter) is faster.
GATHERED_MIN_VOCAB_RATIO = 4.0


def choose_strategy(vocab_rows: int, flat_ids: int) -> str:
    return (
        "gathered"
        if vocab_rows > GATHERED_MIN_VOCAB_RATIO * flat_ids
        else "masked_dense"
    )


def make_table_optimizer(cfg: TrainConfig, schedule) -> TableOptimizer | None:
    if cfg.table_optimizer == "dense":
        return None
    if cfg.table_optimizer not in TABLE_OPTIMIZERS:
        raise ValueError(
            f"unknown table_optimizer {cfg.table_optimizer!r}; "
            f"expected 'dense' or one of {TABLE_OPTIMIZERS}"
        )
    scale = cfg.resolved_table_lr_scale()
    if scale != 1.0:
        # schedule shape (OneCycle warmup/anneal) preserved, amplitude
        # scaled — the adagrad family's 1/sqrt(touches) step decay needs a
        # higher embedding lr to track Adam's trajectory (schema.py note)
        base = schedule
        schedule = lambda step: scale * base(step)  # noqa: E731
    return TableOptimizer(
        kind=cfg.table_optimizer,
        schedule=schedule,
        weight_decay=cfg.weight_decay,
    )


def remap_batch(
    fm,
    feats: dict[str, jax.Array],
    tables: dict[str, jax.Array],
    only: set[str] | None = None,
) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """Dedup every table's batch ids ONCE and rewrite the id features to
    row-buffer indices, so the in-loss lookup is a plain gather.

    A pad id (0) is force-included at the head of each table's id stream:
    ``uids`` is sorted and ids are clamped non-negative below, so
    ``uids[0] == 0`` and the remap maps 0 -> 0 — preserving the ``ids == 0``
    mask semantics that sequence pooling and attention rely on
    (models/trunk.py uses the raw ids as the pad mask). Only valid while
    every sequence pad_id is 0, which Trainer.__init__ asserts. Negative ids
    (a common missing-value sentinel in upstream joins) are clamped to the
    pad id 0 — WITHOUT the clamp a single -1 would occupy ``uids[0]`` and
    shift the pad remap to slot 1, corrupting the pad mask for the whole
    batch; treating them as pad is the tolerant semantics the rest of the
    pipeline uses for invalid ids.

    Returns (remapped feats, uids per table).
    """
    from ctr_recommendation_tpu.config.schema import FeatureType

    plan: dict[str, list] = {}
    flats: dict[str, list[jax.Array]] = {}
    for f in fm.features:
        if f.type not in (FeatureType.CATEGORICAL, FeatureType.SEQUENCE):
            continue
        if f.name not in feats:
            continue
        t = fm.table_of[f.name]
        if only is not None and t not in only:
            continue
        if t not in flats:
            flats[t] = [jnp.zeros((1,), jnp.int32)]  # force-include pad id 0
            plan[t] = []
        ids = jnp.maximum(feats[f.name].astype(jnp.int32), 0)
        start = sum(a.size for a in flats[t])
        flats[t].append(ids.reshape(-1))
        plan[t].append((f.name, start, ids.shape))

    out = dict(feats)
    uids: dict[str, jax.Array] = {}
    for t, arrs in flats.items():
        flat = jnp.concatenate(arrs)
        u, inv = dedup_ids_inverse(flat, tables[t].shape[0])
        uids[t] = u
        for fname, start, shape in plan[t]:
            n = 1
            for s in shape:
                n *= s
            out[fname] = inv[start : start + n].reshape(shape)
    return out, uids
