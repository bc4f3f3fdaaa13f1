"""Fused Pallas scoring kernel == unfused eval forward (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctr_recommendation_tpu.ops import bilinear, interaction, mlp, senet
from ctr_recommendation_tpu.ops.pallas.scoring import fused_score


@pytest.mark.parametrize("btype", ["all", "each"])
def test_fused_score_matches_reference(btype):
    f, e, b = 6, 128, 40
    sp = senet.init(jax.random.key(1), f, 2)
    bp = bilinear.init(jax.random.key(2), e, f, btype)
    cdim = (f + f * (f - 1) // 2) * e
    mp_params, mp_state = mlp.init(jax.random.key(3), cdim, [64, 32], batch_norm=True)
    x = jax.random.normal(jax.random.key(0), (b, f, e))

    # move BN stats off init, then fold
    h = interaction.senet_bilinear_concat_reference(sp, bp, x, bilinear_type=btype)
    _, mp_state = mlp.apply(mp_params, mp_state, h, train=True)
    folded = mlp.fold_batch_norm(mp_params, mp_state)

    logits_ref, _ = mlp.apply(mp_params, mp_state, h, train=False)
    want = np.asarray(jax.nn.sigmoid(logits_ref[:, 0]))

    got = np.asarray(fused_score(sp, bp, folded, x, bilinear_type=btype, block_b=16))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
