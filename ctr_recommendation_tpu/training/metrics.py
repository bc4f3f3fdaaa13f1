"""Evaluation metrics, computed on device.

The reference pulls every valid batch to host numpy and calls sklearn
(train_fibinet.py:140-145, utils.py:18-32). Here AUC and logloss run on the
TPU over accumulated device arrays:

* ``auc``: exact tie-aware Mann-Whitney rank AUC — matches
  ``sklearn.roc_auc_score`` to float precision (SURVEY §7 hard part (e)
  requires ~1e-4 agreement so best-checkpoint selection is identical); falls
  back to 0.5 when only one class is present (utils.py:23-27 behavior).
* ``binned_auc``: O(bins) streaming histogram AUC for very large eval sets.
* ``logloss``: clipped binary cross-entropy matching sklearn's log_loss
  (utils.py:29-32; eps 1e-15).

All take an optional per-example ``weight`` so padded tail batches drop out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def auc(labels: jax.Array, scores: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """Exact ROC AUC with average ranks for ties (weights must be 0/1)."""
    labels = labels.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    n = labels.shape[0]
    if weight is None:
        weight = jnp.ones_like(labels)
    weight = weight.astype(jnp.float32)
    # Push masked-out entries to -inf so they take the lowest ranks and get
    # zero weight in the sums.
    neg_inf = jnp.finfo(jnp.float32).min
    s = jnp.where(weight > 0, scores, neg_inf)

    order = jnp.argsort(s)
    sorted_s = s[order]
    # rank position (1-based) of each sorted element
    pos = jnp.arange(1, n + 1, dtype=jnp.float32)
    # tie groups: average rank within equal-score runs
    # segment ids increase when the score changes
    new_group = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_s[1:] != sorted_s[:-1]).astype(jnp.int32)]
    )
    group = jnp.cumsum(new_group) - 1  # 0-based group index per sorted elem
    num_groups = n  # upper bound
    group_sum = jax.ops.segment_sum(pos, group, num_segments=num_groups)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(pos), group, num_segments=num_groups)
    avg_rank_per_group = group_sum / jnp.maximum(group_cnt, 1.0)
    ranks_sorted = avg_rank_per_group[group]
    ranks = jnp.zeros_like(ranks_sorted).at[order].set(ranks_sorted)

    w_pos = weight * labels
    w_neg = weight * (1.0 - labels)
    n_pos = jnp.sum(w_pos)
    n_neg = jnp.sum(w_neg)
    # With masked entries ranked lowest, their exclusion just shifts positive
    # ranks by a constant = number of masked entries *below*; correct by
    # ranking only within valid mass: subtract the masked count.
    n_masked = jnp.sum(1.0 - weight)
    rank_sum_pos = jnp.sum(w_pos * (ranks - n_masked))
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.5)


@functools.partial(jax.jit, static_argnames=("num_bins",))
def binned_auc_update(
    hist_pos: jax.Array,
    hist_neg: jax.Array,
    labels: jax.Array,
    probs: jax.Array,
    weight: jax.Array | None = None,
    *,
    num_bins: int = 8192,
):
    """Accumulate score histograms for streaming AUC (probs in [0,1])."""
    labels = labels.astype(jnp.float32)
    if weight is None:
        weight = jnp.ones_like(labels)
    bins = jnp.clip((probs * num_bins).astype(jnp.int32), 0, num_bins - 1)
    hist_pos = hist_pos.at[bins].add(weight * labels)
    hist_neg = hist_neg.at[bins].add(weight * (1.0 - labels))
    return hist_pos, hist_neg


@jax.jit
def binned_auc_finalize(hist_pos: jax.Array, hist_neg: jax.Array) -> jax.Array:
    """AUC from score histograms (trapezoidal over bins; ties averaged)."""
    n_pos = jnp.sum(hist_pos)
    n_neg = jnp.sum(hist_neg)
    # P(neg < pos) + 0.5 P(neg == pos), summing over positive bins
    cum_neg_below = jnp.concatenate(
        [jnp.zeros((1,)), jnp.cumsum(hist_neg)[:-1]]
    )
    u = jnp.sum(hist_pos * (cum_neg_below + 0.5 * hist_neg))
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.5)


@jax.jit
def group_auc_device(
    labels: jax.Array, scores: jax.Array, group_codes: jax.Array
) -> jax.Array:
    """gAUC on device: impression-weighted mean of per-group tie-aware AUC
    over groups containing both classes, fully vectorized with segment ops
    (no per-group Python loop — the round-3 host-numpy version walked every
    group serially, the one metric off-device in an otherwise on-device
    eval stack).

    The variable group sizes that are "hostile to jit" become one lexsort:
    stable-argsort by score, then stable-argsort by group, gives rows
    grouped with scores ascending inside each group. Within-group 1-based
    positions follow from segment-min of the global position; equal-score
    runs are rank-averaged via segment-min/max over run ids; the per-group
    Mann-Whitney U then reduces with segment_sum. ``group_codes`` must be
    dense int codes in [0, n) (factorize arbitrary keys on host first —
    :func:`group_auc` does).

    Returns 0.5 when no group has both classes (global-AUC fallback parity,
    utils.py:23-27 behavior).
    """
    n = labels.shape[0]
    f32 = jnp.float32
    labels = labels.astype(f32)
    scores = scores.astype(f32)
    g_in = group_codes.astype(jnp.int32)
    # lexsort (group major, score minor): jnp.argsort is stable
    o1 = jnp.argsort(scores)
    o2 = jnp.argsort(g_in[o1])
    order = o1[o2]
    g = g_in[order]
    l = labels[order]
    s = scores[order]

    pos = jnp.arange(n, dtype=jnp.int32)
    one = jnp.ones((1,), jnp.bool_)
    grp_start = jnp.concatenate([one, g[1:] != g[:-1]])
    seg = jnp.cumsum(grp_start.astype(jnp.int32)) - 1  # dense per-row group seg
    seg_first = jax.ops.segment_min(pos, seg, num_segments=n)
    rank = (pos - seg_first[seg] + 1).astype(f32)  # 1-based within group

    run_start = jnp.concatenate([one, (s[1:] != s[:-1]) | (g[1:] != g[:-1])])
    run = jnp.cumsum(run_start.astype(jnp.int32)) - 1
    run_lo = jax.ops.segment_min(rank, run, num_segments=n)
    run_hi = jax.ops.segment_max(rank, run, num_segments=n)
    avg_rank = 0.5 * (run_lo + run_hi)[run]  # tie-averaged within-group rank

    ones = jnp.ones_like(l)
    n_tot = jax.ops.segment_sum(ones, seg, num_segments=n)
    n_pos = jax.ops.segment_sum(l, seg, num_segments=n)
    n_neg = n_tot - n_pos
    u = jax.ops.segment_sum(avg_rank * l, seg, num_segments=n) - n_pos * (
        n_pos + 1.0
    ) / 2.0
    valid = (n_pos > 0) & (n_neg > 0)
    auc_g = jnp.where(valid, u / jnp.maximum(n_pos * n_neg, 1.0), 0.0)
    num = jnp.sum(jnp.where(valid, n_tot * auc_g, 0.0))
    den = jnp.sum(jnp.where(valid, n_tot, 0.0))
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.5)


def group_auc(labels, scores, groups) -> float:
    """gAUC over arbitrary group keys: factorize the key column on host
    (np.unique inverse — the only host step), run
    :func:`group_auc_device`."""
    import numpy as np

    groups = np.asarray(groups)
    if groups.size == 0:
        return 0.5
    _, codes = np.unique(groups, return_inverse=True)
    return float(
        group_auc_device(
            jnp.asarray(np.asarray(labels, np.float32)),
            jnp.asarray(np.asarray(scores, np.float32)),
            jnp.asarray(codes.astype(np.int32)),
        )
    )


@jax.jit
def logloss(labels: jax.Array, probs: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    labels = labels.astype(jnp.float32)
    # eps must be representable around 1.0 in fp32: 1 - 1e-15 rounds to 1.0
    # and log(0) = -inf; 1e-7 is the float32-safe analogue of sklearn's clip.
    p = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    ll = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    if weight is None:
        return jnp.mean(ll)
    w = weight.astype(jnp.float32)
    return jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
