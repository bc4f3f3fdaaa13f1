"""Op numerics: parity against naive per-pair loop implementations (the
reference's formulation, model_fibinet.py:60-89) and against torch-cpu for
init-sensitive pieces; Pallas kernel vs jnp reference parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctr_recommendation_tpu.ops import bilinear, cin, interaction, mlp, pooling, senet


def _naive_bilinear_all(x, w):
    """Literal transcription of the reference math: p_ij = v_i ⊙ (x@W)_j."""
    b, f, e = x.shape
    v = x @ w
    out = []
    for i in range(f):
        for j in range(i + 1, f):
            out.append(x[:, i, :] * v[:, j, :])
    return jnp.stack(out, axis=1)


def _naive_bilinear_each(x, w_each):
    b, f, e = x.shape
    out = []
    for i in range(f):
        for j in range(i + 1, f):
            out.append((x[:, i, :] @ w_each[i]) * x[:, j, :])
    return jnp.stack(out, axis=1)


@pytest.mark.parametrize("btype", ["all", "each"])
def test_bilinear_matches_naive_pair_loop(btype):
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (32, 6, 16))
    params = bilinear.init(key, 16, 6, btype)
    got = bilinear.apply(params, x, btype)
    if btype == "all":
        want = _naive_bilinear_all(x, params["w"])
    else:
        want = _naive_bilinear_each(x, params["w_each"])
    assert got.shape == (32, 15, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_senet_matches_torch():
    torch = pytest.importorskip("torch")
    key = jax.random.key(0)
    params = senet.init(key, 6, reduction=2)
    x = np.random.default_rng(0).normal(size=(8, 6, 16)).astype(np.float32)

    # torch version with identical weights
    tx = torch.tensor(x)
    z = tx.mean(dim=-1)
    w1 = torch.tensor(np.asarray(params["fc1"]["w"]))
    b1 = torch.tensor(np.asarray(params["fc1"]["b"]))
    w2 = torch.tensor(np.asarray(params["fc2"]["w"]))
    b2 = torch.tensor(np.asarray(params["fc2"]["b"]))
    wt = torch.sigmoid(torch.relu(z @ w1 + b1) @ w2 + b2)
    want = (tx * wt.unsqueeze(-1)).numpy()

    got = np.asarray(senet.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_masked_mean_matches_reference_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 5, size=(16, 8))
    emb_table = rng.normal(size=(5, 12)).astype(np.float32)
    seq_emb = emb_table[ids]

    # reference: model_fibinet.py:165-174
    t_emb = torch.tensor(seq_emb)
    t_ids = torch.tensor(ids)
    mask = t_ids == 0
    masked = t_emb * (~mask.unsqueeze(-1)).float()
    want = (masked.sum(1) / (~mask).float().sum(1, keepdim=True).clamp(min=1)).numpy()

    got = np.asarray(pooling.masked_mean(jnp.asarray(seq_emb), jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_masked_mean_t_matches_untransposed():
    """The transposed (S, B, E) layout (free-bitcast gather path,
    models/trunk.py) is numerically identical to masked_mean."""
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 5, size=(16, 8))
    ids[3, :] = 0  # one fully-padded history
    emb_table = rng.normal(size=(5, 12)).astype(np.float32)
    seq_emb = emb_table[ids]  # (B, S, E)

    want = np.asarray(pooling.masked_mean(jnp.asarray(seq_emb), jnp.asarray(ids)))
    got = np.asarray(
        pooling.masked_mean_t(
            jnp.asarray(seq_emb.transpose(1, 0, 2)), jnp.asarray(ids.T)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_batchnorm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 32)).astype(np.float32)
    params, state = mlp.init(jax.random.key(0), 32, [32], batch_norm=True)
    # isolate the BN: overwrite linear with identity
    params["layers"][0]["linear"]["w"] = jnp.eye(32)
    params["layers"][0]["linear"]["b"] = jnp.zeros(32)

    tbn = torch.nn.BatchNorm1d(32, momentum=0.1, eps=1e-5)
    tbn.train()
    want = torch.relu(tbn(torch.tensor(x))).detach().numpy()

    got_pre, new_state = mlp.apply(params, state, jnp.asarray(x), train=True)
    # compare hidden layer output: rerun manually
    h = jnp.asarray(x)
    from ctr_recommendation_tpu.ops.mlp import _batch_norm

    hbn, st = _batch_norm(params["layers"][0], state["layers"][0], h, True)
    got = np.asarray(jax.nn.relu(hbn))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st["bn_mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st["bn_var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_bn_folding_matches_eval_forward():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    params, state = mlp.init(jax.random.key(0), 24, [16, 8], batch_norm=True)
    # push some non-trivial running stats
    _, state = mlp.apply(params, state, x, train=True)
    want, _ = mlp.apply(params, state, x, train=False)
    folded = mlp.fold_batch_norm(params, state)
    got, _ = mlp.apply(folded, {"layers": [{} for _ in folded["layers"]]}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_cin_shapes_and_grad():
    x = jax.random.normal(jax.random.key(0), (8, 6, 16))
    params = cin.init(jax.random.key(1), 6, (8, 4))
    out = cin.apply(params, x)
    assert out.shape == (8, 1)
    g = jax.grad(lambda p: jnp.sum(cin.apply(p, x) ** 2))(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


@pytest.mark.parametrize("btype", ["all", "each"])
def test_pallas_interaction_parity(btype):
    """Fused kernel (interpret mode on CPU) == jnp reference, fwd and bwd."""
    from ctr_recommendation_tpu.ops.pallas.interaction import (
        fused_senet_bilinear_concat,
    )

    key = jax.random.key(0)
    f, e, b = 6, 128, 48  # non-multiple of block to exercise padding
    sp = senet.init(jax.random.key(1), f, 2)
    bp = bilinear.init(jax.random.key(2), e, f, btype)
    x = jax.random.normal(key, (b, f, e))

    want = interaction.senet_bilinear_concat_reference(sp, bp, x, bilinear_type=btype)
    got = fused_senet_bilinear_concat(sp, bp, x, bilinear_type=btype, block_b=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def loss_ref(sp_, bp_, x_):
        return jnp.sum(
            interaction.senet_bilinear_concat_reference(sp_, bp_, x_, bilinear_type=btype) ** 2
        )

    def loss_fused(sp_, bp_, x_):
        return jnp.sum(
            fused_senet_bilinear_concat(sp_, bp_, x_, bilinear_type=btype, block_b=16) ** 2
        )

    g_want = jax.grad(loss_ref, argnums=(0, 1, 2))(sp, bp, x)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(sp, bp, x)
    for a, b_ in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("btype", ["all", "each"])
@pytest.mark.parametrize("use_bias", [True, False])
def test_pallas_interaction_bwd_random_cotangent(btype, use_bias):
    """The hand-written Pallas backward (ops/pallas/interaction.py
    _bwd_kernel) vs jax.vjp of the jnp reference under an ARBITRARY
    cotangent (grad-of-scalar-loss only exercises structured cotangents),
    with and without SENet biases (the no-bias tree must receive no bias
    cotangent). VERDICT r3 item 2 done-criterion: parity <= 1e-5 fp32."""
    from ctr_recommendation_tpu.ops.pallas.interaction import (
        fused_senet_bilinear_concat,
    )

    f, e, b = 6, 32, 37  # non-multiple batch exercises the bwd pad path
    sp = senet.init(jax.random.key(1), f, 2, use_bias=use_bias)
    bp = bilinear.init(jax.random.key(2), e, f, btype)
    x = jax.random.normal(jax.random.key(3), (b, f, e), jnp.float32)
    g = jax.random.normal(
        jax.random.key(4), (b, (f + f * (f - 1) // 2) * e), jnp.float32
    )

    _, vjp_ref = jax.vjp(
        lambda s_, b_, x_: interaction.senet_bilinear_concat_reference(
            s_, b_, x_, bilinear_type=btype
        ),
        sp, bp, x,
    )
    _, vjp_ker = jax.vjp(
        lambda s_, b_, x_: fused_senet_bilinear_concat(
            s_, b_, x_, bilinear_type=btype, block_b=16
        ),
        sp, bp, x,
    )
    want, got = vjp_ref(g), vjp_ker(g)
    assert jax.tree_util.tree_structure(want) == jax.tree_util.tree_structure(got)
    for a, w_ in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w_), rtol=1e-5, atol=1e-5)


def test_crossnet_matches_naive_loop():
    from ctr_recommendation_tpu.ops import crossnet

    x0 = jax.random.normal(jax.random.key(0), (8, 24))
    params = crossnet.init(jax.random.key(1), 24, num_layers=3)
    got = crossnet.apply(params, x0)
    x = x0
    for layer in params["layers"]:
        x = x0 * (x @ layer["w"] + layer["b"]) + x
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_ops_stay_in_activation_dtype():
    """fp32 master weights must be cast to the activation dtype at every
    matmul — without the cast, promotion silently lifts bf16 activations
    back to fp32 and the compute_dtype/tower_dtype='compute' path runs
    fp32 end to end (caught in round 2: the 'bf16 tower' was fp32)."""
    import jax
    import jax.numpy as jnp

    from ctr_recommendation_tpu.ops import bilinear as bl
    from ctr_recommendation_tpu.ops import senet as sn
    from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init

    key = jax.random.key(0)
    lp = linear_init(key, 8, 4)
    x = jnp.ones((3, 8), jnp.bfloat16)
    assert linear_apply(lp, x).dtype == jnp.bfloat16

    sp = sn.init(key, 6, 2)
    xs = jnp.ones((3, 6, 8), jnp.bfloat16)
    assert sn.apply(sp, xs).dtype == jnp.bfloat16

    for btype in ("all", "each"):
        bp = bl.init(key, 8, 6, btype)
        assert bl.apply(bp, xs, btype).dtype == jnp.bfloat16

    from ctr_recommendation_tpu.ops import mlp

    mp_params, mp_state = mlp.init(key, 8, (16,), out_dim=1, batch_norm=True)
    out, _ = mlp.apply(mp_params, mp_state, x, train=False)
    assert out.dtype == jnp.bfloat16


def test_cin_last_layer_p_factorization_matches_direct():
    """The P-factorized last layer (apply's shipped form) == the direct
    materialize-then-pool contraction, forward and gradients."""
    b, f, e = 48, 5, 16
    x = jax.random.normal(jax.random.key(0), (b, f, e), jnp.float32)
    params = cin.init(jax.random.key(1), f, (8, 4))
    params["out"]["w"] = jax.random.normal(jax.random.key(2), params["out"]["w"].shape)

    def direct_apply(p, x0):
        from ctr_recommendation_tpu.ops.initializers import linear_apply
        x_prev = x0
        pooled = []
        for w in p["filters"]:
            x_prev = jnp.einsum("bie,bje,hij->bhe", x_prev, x0, w)
            pooled.append(jnp.sum(x_prev, axis=-1))
        return linear_apply(p["out"], jnp.concatenate(pooled, axis=-1))

    ref = direct_apply(params, x)
    got = cin.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    g_ref = jax.grad(lambda p, xx: jnp.sum(direct_apply(p, xx) ** 2), argnums=(0, 1))(params, x)
    g_got = jax.grad(lambda p, xx: jnp.sum(cin.apply(p, xx) ** 2), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_got[1]), np.asarray(g_ref[1]), rtol=2e-3, atol=2e-3)
    for wr, wk in zip(g_ref[0]["filters"], g_got[0]["filters"]):
        np.testing.assert_allclose(np.asarray(wk), np.asarray(wr), rtol=2e-3, atol=2e-3)


def test_cin_single_layer_bf16_stays_bf16():
    b, f, e = 32, 4, 16
    x = jax.random.normal(jax.random.key(0), (b, f, e), jnp.bfloat16)
    params = cin.init(jax.random.key(1), f, (8,))
    out = cin.apply(params, x)
    assert out.dtype == jnp.bfloat16
