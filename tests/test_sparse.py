"""Sparse (touched-rows-only) embedding-table optimizer (training/sparse.py).

Equivalence contract (VERDICT r1 item 3): the sparse path must reproduce the
dense optax chain exactly on the rows a batch touches —
* adagrad: bit-parity with `scale_by_rss` at weight_decay=0 (untouched rows
  have zero grad, so dense leaves them unchanged too);
* adam: parity with `scale_by_adam` while every row is touched every step
  (lazy Adam skips momentum decay of untouched rows by design);
* untouched rows (and their optimizer state) must be bit-identical before
  and after a step.
Plus end-to-end: a Trainer with table_optimizer=adagrad matches the dense
Trainer trajectory, and the mp>1 sharded path still runs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctr_recommendation_tpu.training import sparse as sparse_lib
from ctr_recommendation_tpu.training.loop import Trainer
from tests.conftest import make_batch


def test_dedup_ids_sorted_unique_sentinel():
    ids = jnp.array([[5, 3, 5], [0, 9, 3]], dtype=jnp.int32)
    u = sparse_lib.dedup_ids(ids, vocab_rows=16)
    # sentinel tail is spread (16, 17, ...) so the buffer is GENUINELY
    # unique — the scatter calls promise unique_indices=True
    np.testing.assert_array_equal(np.asarray(u), [0, 3, 5, 9, 16, 17])
    assert len(np.unique(np.asarray(u))) == u.size
    # capped at vocab when batch ids outnumber the vocab
    big = jnp.zeros((100,), jnp.int32)
    assert sparse_lib.dedup_ids(big, vocab_rows=8).shape == (8,)


def test_row_lookup_matches_dense_gather():
    key = jax.random.key(0)
    table = jax.random.normal(key, (16, 4))
    ids = jnp.array([3, 7, 3, 1], dtype=jnp.int32)
    u, inv = sparse_lib.dedup_ids_inverse(ids, 16)
    rows = sparse_lib.gather_rows(table, u)
    np.testing.assert_array_equal(np.asarray(rows[inv]), np.asarray(table[ids]))


def test_row_grads_equal_dense_table_grads():
    """d(loss)/d(rows) scattered back == d(loss)/d(table): the inverse-remap
    gather's transpose segment-sums duplicates exactly like the dense
    gather's scatter-add."""
    key = jax.random.key(1)
    V, E = 12, 4
    table = jax.random.normal(key, (V, E))
    ids = jnp.array([2, 2, 5, 7, 5, 2], dtype=jnp.int32)
    tgt = jax.random.normal(jax.random.key(2), (ids.size, E))

    def dense_loss(t):
        return jnp.sum((t[ids] - tgt) ** 2)

    u, inv = sparse_lib.dedup_ids_inverse(ids, V)
    rows0 = sparse_lib.gather_rows(table, u)

    def row_loss(rows):
        return jnp.sum((rows[inv] - tgt) ** 2)

    dense_g = jax.grad(dense_loss)(table)
    row_g = jax.grad(row_loss)(rows0)
    scattered = jnp.zeros_like(table).at[u].add(row_g, mode="drop")
    np.testing.assert_allclose(np.asarray(scattered), np.asarray(dense_g), atol=1e-6)


def test_remap_batch_clamps_negative_ids_to_pad(tiny_feature_map):
    """A stray -1 id must be treated as pad, not shift the pad remap off
    slot 0 (which would corrupt the whole batch's pad mask)."""
    rng = np.random.default_rng(21)
    feats = make_batch(rng, 16)
    feats["item_seq"] = feats["item_seq"].copy()
    feats["item_seq"][0, 0] = -1
    tables = {
        "item_id": jax.random.normal(jax.random.key(0), (256, 8)),
        "likes_level": jax.random.normal(jax.random.key(1), (128, 8)),
    }
    remapped, uids = sparse_lib.remap_batch(tiny_feature_map, feats, tables)
    # pad remap invariant holds: remap(0) == 0, and the -1 became pad
    assert int(remapped["item_seq"][0, 0]) == 0
    pad_mask_want = np.asarray(np.maximum(feats["item_seq"], 0) == 0)
    np.testing.assert_array_equal(
        np.asarray(remapped["item_seq"] == 0), pad_mask_want
    )


def _run_optax(tx, table, grads_seq):
    st = tx.init(table)
    for g in grads_seq:
        upd, st = tx.update(g, st, table)
        table = optax.apply_updates(table, upd)
    return table


def _run_sparse(opt, table, uids_seq, rowgrads_seq):
    st = opt.init({"t": table})
    tables = {"t": table}
    for step, (u, rg) in enumerate(zip(uids_seq, rowgrads_seq)):
        tables, st = opt.update(
            tables, st, {"t": u}, {"t": rg}, jnp.asarray(step, jnp.int32)
        )
    return tables["t"], st


@pytest.mark.parametrize("partial_touch", [False, True])
def test_sparse_adagrad_matches_dense(partial_touch):
    """Sparse adagrad == scale_by_rss on every row: untouched rows have zero
    grad, which leaves the rss accumulator AND the row unchanged in the dense
    chain too, so parity holds even when only some rows are touched."""
    V, E, steps = 10, 4, 4
    key = jax.random.key(3)
    table = jax.random.normal(key, (V, E))
    sched = optax.constant_schedule(0.05)
    tx = optax.chain(
        optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10),
        optax.scale_by_learning_rate(sched),
    )
    opt = sparse_lib.TableOptimizer(kind="adagrad", schedule=sched)

    rng = np.random.default_rng(0)
    uids_seq, rowgrads_seq, dense_seq = [], [], []
    for _ in range(steps):
        n = rng.integers(3, V) if partial_touch else V
        ids = jnp.asarray(rng.choice(V, size=n, replace=False).astype(np.int32))
        u = sparse_lib.dedup_ids(ids, V)
        rg = jnp.where(
            (u < V)[:, None], jax.random.normal(jax.random.key(int(n)), (u.size, E)), 0.0
        )
        uids_seq.append(u)
        rowgrads_seq.append(rg)
        dense_seq.append(jnp.zeros_like(table).at[u].add(rg, mode="drop"))

    dense_out = _run_optax(tx, table, dense_seq)
    sparse_out, _ = _run_sparse(opt, table, uids_seq, rowgrads_seq)
    np.testing.assert_allclose(np.asarray(sparse_out), np.asarray(dense_out), atol=1e-6)


def test_sparse_adam_matches_dense_when_all_touched():
    """Lazy Adam == optax adam while every row is touched every step (the
    only regime where momentum-decay skipping is invisible)."""
    V, E, steps = 8, 4, 5
    table = jax.random.normal(jax.random.key(4), (V, E))
    sched = optax.cosine_onecycle_schedule(50, 0.01)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(sched),
    )
    opt = sparse_lib.TableOptimizer(kind="adam", schedule=sched)

    u = jnp.arange(V, dtype=jnp.int32)
    grads = [
        jax.random.normal(jax.random.key(10 + s), (V, E)) for s in range(steps)
    ]
    dense_out = _run_optax(tx, table, grads)
    sparse_out, _ = _run_sparse(opt, table, [u] * steps, grads)
    np.testing.assert_allclose(
        np.asarray(sparse_out), np.asarray(dense_out), atol=1e-6
    )


def test_untouched_rows_bitwise_unchanged():
    V, E = 10, 4
    table = jax.random.normal(jax.random.key(5), (V, E))
    sched = optax.constant_schedule(0.1)
    for kind in ("adagrad", "rowwise_adagrad", "adam"):
        opt = sparse_lib.TableOptimizer(kind=kind, schedule=sched)
        st = opt.init({"t": table})
        ids = jnp.array([1, 4], dtype=jnp.int32)
        u = sparse_lib.dedup_ids(ids, V)
        rg = jnp.ones((u.size, E))
        new_tables, new_st = opt.update(
            {"t": table}, st, {"t": u}, {"t": rg}, jnp.asarray(0)
        )
        untouched = np.setdiff1d(np.arange(V), np.asarray(ids))
        np.testing.assert_array_equal(
            np.asarray(new_tables["t"][untouched]), np.asarray(table[untouched])
        )
        for k, v in new_st["t"].items():
            np.testing.assert_array_equal(
                np.asarray(v[untouched]), np.asarray(st["t"][k][untouched])
            )
        # touched rows DID move
        assert not np.allclose(
            np.asarray(new_tables["t"][np.asarray(ids)]),
            np.asarray(table[np.asarray(ids)]),
        )


def _sparse_exp(tiny_experiment, table_optimizer, *, weight_decay=0.0):
    tc = dataclasses.replace(
        tiny_experiment.train,
        optimizer="adagrad",
        table_optimizer=table_optimizer,
        weight_decay=weight_decay,
        learning_rate=5e-3,
        # parity tests compare against the dense chain at the SAME lr; the
        # adagrad-family production default is 10x (resolved_table_lr_scale)
        table_lr_scale=1.0,
    )
    return tiny_experiment.replace(train=tc)


def _labeled(batch, rng):
    b = dict(batch)
    b["label"] = (rng.random(len(b["item_id"])) < 0.5).astype(np.float32)
    return b


def test_trainer_sparse_matches_dense_end_to_end(tiny_experiment):
    """Full Trainer trajectory: adagrad tables sparse vs dense, wd=0 —
    identical params after 3 steps (same grads, same clip, same schedule)."""
    rng = np.random.default_rng(7)
    batches = [_labeled(make_batch(rng, 64), rng) for _ in range(3)]

    results = []
    for table_opt in ("dense", "adagrad"):
        exp = _sparse_exp(tiny_experiment, table_opt)
        tr = Trainer(exp, total_steps=10, log_fn=lambda s: None)
        key = jax.random.key(0)
        for b in batches:
            tr.state, m = tr._train_step(tr.state, tr.put_batch(b), key)
        results.append(jax.tree.map(np.asarray, tr.state.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5), *results
    )


def test_table_lr_scale_family_default():
    """The adagrad family defaults to a 10x table lr (1/sqrt(touches) decay
    starves high-frequency rows at a shared lr — measured full-scale AUC
    0.699 vs 0.774, docs/PERFORMANCE.md); adam/dense stay at 1x; an
    explicit value always wins."""
    import dataclasses as dc

    from ctr_recommendation_tpu.config.schema import TrainConfig

    base = TrainConfig()
    assert base.table_lr_scale is None
    for opt, expect in [("rowwise_adagrad", 10.0), ("adagrad", 10.0),
                        ("adam", 1.0), ("dense", 1.0)]:
        tc = dc.replace(base, table_optimizer=opt)
        assert tc.resolved_table_lr_scale() == expect
    tc = dc.replace(base, table_optimizer="rowwise_adagrad", table_lr_scale=3.0)
    assert tc.resolved_table_lr_scale() == 3.0
    # the resolved scale reaches the TableOptimizer schedule
    opt = sparse_lib.make_table_optimizer(
        dc.replace(base, table_optimizer="rowwise_adagrad"), lambda s: 1.0
    )
    assert float(opt.schedule(0)) == 10.0


def test_fused_table_gather_matches_per_feature(tiny_experiment):
    """The merged-backward path (item_id + item_seq share the item table;
    loop.py _multi_feature_plan) must reproduce the per-feature-gather
    trajectory exactly — same grads into the table, same clip, same
    update — for the sparse table optimizers AND the dense optax chain
    (the default config trains through the dense path)."""
    rng = np.random.default_rng(11)
    batches = [_labeled(make_batch(rng, 64), rng) for _ in range(4)]

    for table_opt in ("rowwise_adagrad", "adam", "dense"):
        results = []
        for fused in (True, False):
            exp = _sparse_exp(tiny_experiment, table_opt)
            tr = Trainer(exp, total_steps=10, log_fn=lambda s: None)
            tr._fuse_table_gather = fused
            key = jax.random.key(0)
            losses = []
            for b in batches:
                tr.state, m = tr._train_step(tr.state, tr.put_batch(b), key)
                losses.append(float(m["loss"]))
            results.append((losses, jax.tree.map(np.asarray, tr.state.params)))
        np.testing.assert_allclose(results[0][0], results[1][0],
                                   rtol=1e-6, atol=1e-7)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            results[0][1], results[1][1],
        )


def test_trainer_sparse_mp_sharded_runs(tiny_experiment):
    """Sparse tables + model-parallel row sharding (GSPMD handles the
    dedup/gather/scatter on the sharded table): step runs, loss finite,
    matches the single-device sparse step."""
    from ctr_recommendation_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(8)
    batch = _labeled(make_batch(rng, 64), rng)

    exp = _sparse_exp(tiny_experiment, "rowwise_adagrad")
    mesh_cfg = dataclasses.replace(exp.mesh, data_parallel=2, model_parallel=4)
    exp_mp = exp.replace(mesh=mesh_cfg)

    tr1 = Trainer(exp, total_steps=10, log_fn=lambda s: None)
    trm = Trainer(exp_mp, mesh=make_mesh(mesh_cfg), total_steps=10, log_fn=lambda s: None)
    key = jax.random.key(0)
    s1, m1 = tr1._train_step(tr1.state, tr1.put_batch(batch), key)
    sm, mm = trm._train_step(trm.state, trm.put_batch(batch), key)
    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(mm["loss"]), atol=1e-5)
    # atol: the adagrad update g/sqrt(sum g^2 + 1e-10) normalizes away the
    # gradient's magnitude (rss_init=0, torch semantics), so fp32
    # reduction-order differences between the sharded and single-device
    # grads are amplified to ~1e-4 on the lr-sized first step
    np.testing.assert_allclose(
        np.asarray(sm.params["trunk"]["tables"]["item_id"]),
        np.asarray(s1.params["trunk"]["tables"]["item_id"]),
        atol=5e-4,
    )


def test_sparse_state_checkpoint_roundtrip(tiny_experiment, tmp_path):
    """table_opt_state rides the full-state checkpoint: save after one step,
    restore into a fresh Trainer, trees identical."""
    rng = np.random.default_rng(9)
    batch = _labeled(make_batch(rng, 64), rng)
    exp = _sparse_exp(tiny_experiment, "adagrad")
    tr = Trainer(exp, total_steps=5, checkpoint_dir=str(tmp_path), log_fn=lambda s: None)
    tr.state, _ = tr._train_step(tr.state, tr.put_batch(batch), jax.random.key(0))
    tr.ckpt.save(1, tr.state)

    tr2 = Trainer(exp, total_steps=5, checkpoint_dir=str(tmp_path), log_fn=lambda s: None)
    restored = tr2.ckpt.restore(1, tr2.state)
    assert int(restored.step) == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.table_opt_state, tr.state.table_opt_state,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, tr.state.params,
    )


def test_remap_batch_preserves_pad_mask_and_values(tiny_feature_map):
    """remap_batch: remapped ids gather identical rows, and remap(0) == 0 so
    the `ids == 0` pad mask is bit-identical pre/post remap."""
    from ctr_recommendation_tpu.features import build_feature_map

    fm = tiny_feature_map
    rng = np.random.default_rng(11)
    feats = make_batch(rng, 32)
    tables = {
        "item_id": jax.random.normal(jax.random.key(0), (256, 8)),
        "likes_level": jax.random.normal(jax.random.key(1), (128, 8)),
    }
    remapped, uids = sparse_lib.remap_batch(fm, feats, tables)
    rows = {n: sparse_lib.gather_rows(tables[n], uids[n]) for n in uids}
    # pad-mask parity on the sequence feature
    np.testing.assert_array_equal(
        np.asarray(remapped["item_seq"] == 0), np.asarray(feats["item_seq"] == 0)
    )
    # value parity: rows[remap(ids)] == table[ids] for every id feature
    for fname, tname in fm.table_of.items():
        got = np.asarray(rows[tname][remapped[fname]])
        want = np.asarray(tables[tname][feats[fname].astype(np.int32)])
        np.testing.assert_array_equal(got, want)
    # non-id features untouched
    np.testing.assert_array_equal(
        np.asarray(remapped["item_emb_d128"]), feats["item_emb_d128"]
    )


@pytest.mark.parametrize("force", ["gathered", "masked_dense"])
def test_trainer_both_strategies_match_dense(tiny_experiment, monkeypatch, force):
    """Both execution strategies (gathered rows / masked dense) reproduce the
    dense optax trajectory — same contract, different HBM profiles."""
    monkeypatch.setattr(
        sparse_lib, "GATHERED_MIN_VOCAB_RATIO",
        0.0 if force == "gathered" else 1e12,
    )
    rng = np.random.default_rng(13)
    batches = [_labeled(make_batch(rng, 64), rng) for _ in range(2)]
    results = []
    for table_opt in ("dense", "adagrad"):
        exp = _sparse_exp(tiny_experiment, table_opt)
        tr = Trainer(exp, total_steps=10, log_fn=lambda s: None)
        key = jax.random.key(0)
        for b in batches:
            tr.state, _ = tr._train_step(tr.state, tr.put_batch(b), key)
        results.append(jax.tree.map(np.asarray, tr.state.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5), *results
    )


def test_sparse_with_attention_pooling_model(tiny_experiment):
    """sasrec_fibinet routes an extra target-aware lookup through the trunk;
    the sparse step must still match the dense trajectory (the remapped
    item_id feature serves both the field embedding and the attention
    target)."""
    rng = np.random.default_rng(17)
    batches = [_labeled(make_batch(rng, 64), rng) for _ in range(2)]
    results = []
    for table_opt in ("dense", "adagrad"):
        exp = _sparse_exp(tiny_experiment, table_opt)
        exp = exp.replace(model=dataclasses.replace(exp.model, model="sasrec_fibinet"))
        tr = Trainer(exp, total_steps=10, log_fn=lambda s: None)
        key = jax.random.key(0)
        for b in batches:
            tr.state, m = tr._train_step(tr.state, tr.put_batch(b), key)
        assert np.isfinite(float(m["loss"]))
        results.append(jax.tree.map(np.asarray, tr.state.params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=3e-5), *results
    )


@pytest.mark.parametrize("table_opt", ["rowwise_adagrad", "adagrad"])
def test_adagrad_tables_actually_train(tiny_experiment, table_opt):
    """Regression for the round-3 -0.08 AUC finding: with the optax-default
    rss floor of 0.1 the adagrad-family updates collapsed to lr * g * 3.16
    for CTR-scale gradients and the embedding tables were effectively FROZEN
    (mean |dtable| ~1e-6 over 20 steps vs lazy-adam's ~6e-2). With
    rss_init=0 (torch semantics) the first touch of a row is a normalized
    lr-sized step — the table must move by at least 1e-3 mean-abs."""
    rng = np.random.default_rng(12)
    exp = _sparse_exp(tiny_experiment, table_opt)
    tr = Trainer(exp, total_steps=30, log_fn=lambda s: None)
    t0 = np.asarray(tr.state.params["trunk"]["tables"]["item_id"]).copy()
    key = jax.random.key(0)
    for _ in range(20):
        b = _labeled(make_batch(rng, 64), rng)
        tr.state, _ = tr._train_step(tr.state, tr.put_batch(b), key)
    t1 = np.asarray(tr.state.params["trunk"]["tables"]["item_id"])
    moved = np.abs(t1 - t0).mean()
    assert moved > 1e-3, f"tables frozen under {table_opt}: mean|dtable|={moved:.2e}"
