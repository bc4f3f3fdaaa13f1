"""CheckpointManager: crash-safe best export + persisted best metric.

Covers the resume semantics the reference lacks entirely (SURVEY §5.4) and
the round-1 advisor findings: the best-tracker must survive --resume (a
worse post-preemption epoch must not overwrite the best export), and a crash
mid-save_best must not lose the previous export.
"""

import os

import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.training.checkpoint import CheckpointManager


def _tree(value: float):
    params = {"w": jnp.full((4, 4), value), "b": jnp.zeros((4,))}
    mstate = {"bn": {"mean": jnp.zeros((4,))}}
    return params, mstate


def test_best_metric_persists_and_restores(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    assert mgr.best_metric() is None

    p1, s1 = _tree(1.0)
    mgr.save_best(p1, s1, metric=0.91, step=100)
    assert abs(mgr.best_metric() - 0.91) < 1e-9

    p2, s2 = _tree(2.0)
    mgr.save_best(p2, s2, metric=0.95, step=200)
    assert abs(mgr.best_metric() - 0.95) < 1e-9

    # a fresh manager over the same dir (i.e. post-restart) sees the metric
    mgr2 = CheckpointManager(str(tmp_path), max_to_keep=2)
    assert abs(mgr2.best_metric() - 0.95) < 1e-9
    rp, rs = mgr2.restore_best(*_tree(0.0))
    np.testing.assert_allclose(np.asarray(rp["w"]), 2.0)


def test_save_best_crash_window_keeps_previous_export(tmp_path):
    """Simulate a crash after the old export was moved aside but before the
    new one was renamed in: restore must fall back to the previous best."""
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    p1, s1 = _tree(3.0)
    mgr.save_best(p1, s1, metric=0.90, step=1)
    export = os.path.join(str(tmp_path), "best", "export")
    os.rename(export, export + ".old")  # the mid-swap crash state

    rp, _ = mgr.restore_best(*_tree(0.0))
    np.testing.assert_allclose(np.asarray(rp["w"]), 3.0)

    # and the next save_best recovers cleanly
    p2, s2 = _tree(4.0)
    mgr.save_best(p2, s2, metric=0.93, step=2)
    rp2, _ = mgr.restore_best(*_tree(0.0))
    np.testing.assert_allclose(np.asarray(rp2["w"]), 4.0)
    assert not os.path.exists(export + ".old")
    assert not os.path.exists(export + ".tmp")


def test_trainer_seed_best_from_export(tmp_path):
    """Trainer._seed_best picks up the persisted metric (max and min modes)."""
    import dataclasses

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.loader import microlens_features
    from ctr_recommendation_tpu.training import Trainer

    exp = microlens_experiment(
        data_root=str(tmp_path),
        embedding_dim=8,
        hidden_units=(16,),
        batch_size=8,
        max_len=4,
        use_pallas=False,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    exp = exp.replace(
        dataset=dataclasses.replace(
            exp.dataset,
            features=microlens_features(item_vocab=32, cate_vocab=11, max_len=4, mm_dim=8),
        )
    )
    trainer = Trainer(exp, steps_per_epoch=1, log_fn=lambda s: None)
    trainer.ckpt.save_best(
        trainer.state.params, trainer.state.model_state, metric=0.88, step=5
    )
    assert abs(trainer._seed_best(-np.inf) - 0.88) < 1e-9
    # an in-memory best better than the persisted one wins
    assert abs(trainer._seed_best(0.93) - 0.93) < 1e-9


def test_checkpoint_every_cadence(tmp_path):
    """checkpoint_every=2 over 5 epochs saves resume points at {2, 4, 5}
    (final epoch always saved) and --resume continues from the latest."""
    import dataclasses

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.config.loader import microlens_features
    from ctr_recommendation_tpu.training import Trainer
    from __graft_entry__ import _fake_batch

    exp = microlens_experiment(
        data_root="", embedding_dim=8, hidden_units=(16, 8), batch_size=64,
        epochs=5, max_len=4, use_pallas=False,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2,
    )
    exp = exp.replace(
        dataset=dataclasses.replace(
            exp.dataset,
            features=microlens_features(
                item_vocab=64, cate_vocab=11, max_len=4, mm_dim=8
            ),
        )
    )
    n = 256
    raw = _fake_batch(np.random.default_rng(0), n, 64, 4, 8)

    class _S:
        columns = raw
        num_rows = n

    tr = Trainer(exp, steps_per_epoch=n // 64, log_fn=lambda s: None)
    tr.fit_on_device(_S(), _S())
    steps = set(tr.ckpt._mgr.all_steps())
    assert 5 in steps and 4 in steps and 1 not in steps and 3 not in steps

    tr2 = Trainer(exp, steps_per_epoch=n // 64, log_fn=lambda s: None)
    hist = tr2.fit_on_device(_S(), _S(), resume=True)
    # already complete: resume from epoch 5 runs zero further epochs
    assert hist == []
