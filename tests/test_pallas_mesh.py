"""Pallas kernels under a multi-device mesh (VERDICT r2 item 2).

A pallas_call has no SPMD partitioning rule; the kernels wrap themselves in
custom_partitioning (batch-sharded x, replicated weights) so ``use_pallas``
survives dp>1 instead of being silently disabled. These tests run both
kernels inside jit over the 8-fake-CPU-device mesh (conftest) with the batch
sharded over 'data' and assert numerics against the pure-jnp reference —
including the adversarial case where inputs arrive with WRONG shardings and
the partitioner must reshard.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ctr_recommendation_tpu.ops import bilinear as bilinear_ops
from ctr_recommendation_tpu.ops import mlp
from ctr_recommendation_tpu.ops import senet as senet_ops
from ctr_recommendation_tpu.ops.interaction import senet_bilinear_concat_reference
from ctr_recommendation_tpu.ops.pallas.interaction import fused_senet_bilinear_concat
from ctr_recommendation_tpu.ops.pallas.scoring import fused_score


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))


def _interaction_setup(btype, b=64, f=6, e=16):
    k = jax.random.key(0)
    ks = jax.random.split(k, 3)
    sp = senet_ops.init(ks[0], f, reduction=2, use_bias=True)
    bp = bilinear_ops.init(ks[1], e, f, btype)
    x = jax.random.normal(ks[2], (b, f, e), jnp.float32)
    return sp, bp, x


@pytest.mark.parametrize("btype", ["all", "each"])
def test_fused_interaction_on_data_sharded_mesh(btype):
    mesh = _mesh()
    sp, bp, x = _interaction_setup(btype)
    want = np.asarray(
        senet_bilinear_concat_reference(sp, bp, x, bilinear_type=btype)
    )

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    repl = NamedSharding(mesh, P())
    sp_s = jax.device_put(sp, jax.tree.map(lambda _: repl, sp))
    bp_s = jax.device_put(bp, jax.tree.map(lambda _: repl, bp))

    @jax.jit
    def run(sp_, bp_, x_):
        return fused_senet_bilinear_concat(
            sp_, bp_, x_, bilinear_type=btype, block_b=16
        )

    got = run(sp_s, bp_s, xs)
    assert got.sharding.spec[0] == "data", got.sharding
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("btype", ["all", "each"])
def test_fused_interaction_grads_on_data_sharded_mesh(btype):
    """The hand-written Pallas backward under a dp mesh: dx comes back
    batch-sharded, weight grads are psum'd across shards inside the
    custom_partitioning lowering — values must match the single-device jnp
    reference VJP."""
    mesh = _mesh()
    sp, bp, x = _interaction_setup(btype, b=64, f=6, e=16)

    def loss(fn):
        def inner(sp_, bp_, x_):
            return jnp.sum(fn(sp_, bp_, x_) ** 2)

        return inner

    ref_fn = loss(
        lambda s_, b_, x_: senet_bilinear_concat_reference(
            s_, b_, x_, bilinear_type=btype
        )
    )
    ker_fn = loss(
        lambda s_, b_, x_: fused_senet_bilinear_concat(
            s_, b_, x_, bilinear_type=btype, block_b=16
        )
    )
    want = jax.grad(ref_fn, argnums=(0, 1, 2))(sp, bp, x)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    repl = NamedSharding(mesh, P())
    sp_s = jax.device_put(sp, jax.tree.map(lambda _: repl, sp))
    bp_s = jax.device_put(bp, jax.tree.map(lambda _: repl, bp))
    got = jax.jit(jax.grad(ker_fn, argnums=(0, 1, 2)))(sp_s, bp_s, xs)
    assert got[2].sharding.spec[0] == "data", got[2].sharding
    for a, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), rtol=2e-4, atol=2e-4)


def test_fused_interaction_reshards_adversarial_input():
    """x arriving sharded on its FIELD dim (not batch) must still compute
    correctly — the partition rule forces (batch, replicated) layouts."""
    mesh = _mesh()
    sp, bp, x = _interaction_setup("all", b=32, f=8, e=16)
    want = np.asarray(senet_bilinear_concat_reference(sp, bp, x, bilinear_type="all"))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model", None)))

    got = jax.jit(
        lambda s_, b_, x_: fused_senet_bilinear_concat(
            s_, b_, x_, bilinear_type="all", block_b=16
        )
    )(sp, bp, xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("btype", ["all", "each"])
def test_fused_score_on_data_sharded_mesh(btype):
    mesh = _mesh()
    b, f, e = 64, 6, 16
    sp, bp, x = _interaction_setup(btype, b=b, f=f, e=e)
    cdim = (f + f * (f - 1) // 2) * e
    params, state = mlp.init(jax.random.key(7), cdim, (32, 16), out_dim=1,
                             batch_norm=True)
    concat = senet_bilinear_concat_reference(sp, bp, x, bilinear_type=btype)
    # move BN stats off init, then fold (same recipe as test_scoring_kernel)
    _, state = mlp.apply(params, state, concat, train=True)
    folded = mlp.fold_batch_norm(params, state)
    want_logits, _ = mlp.apply(params, state, concat, train=False)
    want = np.asarray(jax.nn.sigmoid(want_logits[:, 0]))

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))

    @jax.jit
    def run(sp_, bp_, m_, x_):
        return fused_score(sp_, bp_, m_, x_, bilinear_type=btype, block_b=16)

    got = run(sp, bp, folded, xs)
    assert got.sharding.spec and got.sharding.spec[0] == "data", got.sharding
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_trainer_eval_keeps_pallas_on_multidevice_mesh(tiny_experiment, tiny_batch):
    """The round-2 Trainer silently flipped use_pallas=False on any
    multi-device mesh; now the jitted eval step must keep the kernel and
    match the jnp path's probabilities."""
    from ctr_recommendation_tpu.training import Trainer

    exp_on = tiny_experiment.replace(
        model=dataclasses.replace(tiny_experiment.model, use_pallas=True),
        train=dataclasses.replace(
            tiny_experiment.train, checkpoint_dir="/tmp/pallas_mesh_on"
        ),
    )
    exp_off = tiny_experiment.replace(
        train=dataclasses.replace(
            tiny_experiment.train, checkpoint_dir="/tmp/pallas_mesh_off"
        ),
    )
    assert not exp_off.model.use_pallas

    t_on = Trainer(exp_on, steps_per_epoch=1, log_fn=lambda s: None)
    assert t_on.exp.model.use_pallas, "Trainer must not silently disable pallas"
    assert len(t_on.mesh.devices.flat) == 8
    t_off = Trainer(exp_off, steps_per_epoch=1, log_fn=lambda s: None)

    batch = dict(tiny_batch)
    batch["label"] = np.zeros(len(batch["item_id"]), np.float32)
    p_on = t_on._eval_step(t_on.state.params, t_on.state.model_state,
                           t_on.put_batch(batch))
    p_off = t_off._eval_step(t_off.state.params, t_off.state.model_state,
                             t_off.put_batch(batch))
    # both paths run the tower in bf16 (tower_dtype="compute"); kernel vs
    # XLA fusion round differently at bf16 — probabilities agree to ~1e-3
    np.testing.assert_allclose(np.asarray(p_on), np.asarray(p_off),
                               rtol=1e-3, atol=1e-3)
