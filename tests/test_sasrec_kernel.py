"""Fused SASRec-encoder Pallas kernel vs the jnp path (ops/attention.py).

Kernel-vs-jnp parity in interpret mode on CPU (the SURVEY §4 pattern used
by every kernel in ops/pallas/): forward and hand-derived backward must
match autodiff of the reference encoder to float tolerance with dropout
off. Dropout uses the in-kernel TPU PRNG and is exercised on real TPU
only (interpret mode lacks prng_seed; trunk gates the fused path
accordingly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctr_recommendation_tpu.ops import attention as attn
from ctr_recommendation_tpu.ops.pallas.sasrec_encoder import fused_encode


def _setup(b=24, s=20, e=128, heads=2, layers=1, seed=0, all_pad_row=True):
    params = attn.init(jax.random.key(seed), e, s, num_heads=heads, num_layers=layers)
    rng = np.random.default_rng(seed)
    ids = np.where(
        rng.random((b, s)) < 0.4, 0, rng.integers(1, 500, (b, s))
    ).astype(np.int32)
    if all_pad_row:
        ids[0] = 0
    x = jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32))
    return params, x, jnp.asarray(ids)


@pytest.mark.parametrize("layers", [1, 2])
def test_forward_parity(layers):
    params, x, ids = _setup(layers=layers)
    ref = attn.encode(params, x, ids, num_heads=2)
    got = fused_encode(params, x, ids, num_heads=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)
    # the all-pad row encodes to zeros (reference fallback parity)
    assert np.abs(np.asarray(got)[0]).max() == 0.0


def test_forward_parity_bf16():
    params, x, ids = _setup()
    xb = x.astype(jnp.bfloat16)
    ref = attn.encode(params, xb, ids, num_heads=2)
    got = fused_encode(params, xb, ids, num_heads=2)
    # bf16 stream: kernel runs LN/softmax fp32, jnp path computes them in
    # bf16 — compare at bf16-appropriate tolerance
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


@pytest.mark.parametrize("layers", [1, 2])
def test_backward_parity(layers):
    params, x, ids = _setup(layers=layers)

    def loss(fn):
        return lambda p, xx: jnp.sum(
            jnp.tanh(fn(p, xx, ids, num_heads=2)) * 0.5
        )

    gr = jax.grad(loss(attn.encode), argnums=(0, 1))(params, x)
    gf = jax.grad(loss(fused_encode), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale + 1e-7,
            err_msg="gradient mismatch",
        )


def test_odd_batch_padding():
    """Batch not a multiple of the tile: padded rows must not leak."""
    params, x, ids = _setup(b=23)
    ref = attn.encode(params, x, ids, num_heads=2)
    got = fused_encode(params, x, ids, num_heads=2, block_b=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)


def test_model_level_parity(tiny_experiment, tiny_feature_map, tiny_batch):
    """sasrec_fibinet eval logits: use_pallas on == off (the trunk routes
    the attention branch through the fused encoder when on)."""
    import dataclasses

    from ctr_recommendation_tpu.models import build_model

    fm = tiny_feature_map
    exp_off = tiny_experiment.replace(
        model=dataclasses.replace(
            tiny_experiment.model, model="sasrec_fibinet", use_pallas=False
        )
    )
    exp_on = exp_off.replace(
        model=dataclasses.replace(exp_off.model, use_pallas=True)
    )
    module, params, state = build_model(fm, exp_off.model, jax.random.key(1))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    out_off, _ = module.apply(params, state, fm, exp_off.model, batch, train=False)
    out_on, _ = module.apply(params, state, fm, exp_on.model, batch, train=False)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=2e-5
    )


def test_model_level_grad_parity_no_dropout(tiny_experiment, tiny_feature_map, tiny_batch):
    """Train-mode gradients with attn_dropout=0 (the dropout-free fused
    path runs on CPU): pallas on == off through the full model."""
    import dataclasses

    from ctr_recommendation_tpu.models import build_model

    fm = tiny_feature_map
    base = dataclasses.replace(
        tiny_experiment.model, model="sasrec_fibinet", attn_dropout=0.0,
        net_dropout=0.0,
    )
    module, params, state = build_model(fm, base, jax.random.key(2))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    labels = jnp.asarray(
        (np.random.default_rng(0).random(len(batch["item_id"])) < 0.5).astype(
            np.float32
        )
    )

    def loss_fn(cfg):
        def f(p):
            logits, _ = module.apply(
                p, state, fm, cfg, batch, train=True, rng=jax.random.key(0)
            )
            return jnp.mean(
                jnp.maximum(logits, 0) - logits * labels
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )

        return f

    g_off = jax.grad(loss_fn(dataclasses.replace(base, use_pallas=False)))(params)
    g_on = jax.grad(loss_fn(dataclasses.replace(base, use_pallas=True)))(params)
    for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3 * scale + 1e-7
        )
