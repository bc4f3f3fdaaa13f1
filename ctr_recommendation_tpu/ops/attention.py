"""SASRec-style self-attention pooling over the click history.

Scope from BASELINE.json configs[4]: replace the reference's masked mean
pooling (model_fibinet.py:165-174) with (a) learned positional embeddings +
N pre-LayerNorm transformer blocks (MHSA + pointwise FFN) over the ≤20-step
history, then (b) target-aware attention pooling: the candidate item's
embedding queries the encoded history, and the attention-weighted sum becomes
the Hist field fed into the FiBiNET interaction stack.

Seq len ≤ 20 and E = 128, so one fused dot-product attention is optimal —
no flash/ring machinery (SURVEY §5.7). Padding steps are masked with -inf
before softmax; a fully-empty history yields a zeros vector (parity with the
reference's zeros fallback, model_fibinet.py:176).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init

_NEG_INF = -1e9


def init(
    key: jax.Array,
    emb_dim: int,
    max_len: int,
    num_heads: int = 2,
    num_layers: int = 1,
) -> dict:
    if emb_dim % num_heads:
        raise ValueError(f"emb_dim {emb_dim} not divisible by num_heads {num_heads}")
    # 1 pos_emb + 4 per block (qkv/proj/ffn1/ffn2) + 1 pool_q
    keys = jax.random.split(key, 1 + 4 * num_layers + 1)
    params: dict = {
        "pos_emb": 0.02 * jax.random.normal(keys[0], (max_len, emb_dim)),
        "blocks": [],
    }
    ki = 1
    for _ in range(num_layers):
        block = {
            "qkv": linear_init(keys[ki], emb_dim, 3 * emb_dim),
            "proj": linear_init(keys[ki + 1], emb_dim, emb_dim),
            "ln1_scale": jnp.ones((emb_dim,)),
            "ln1_bias": jnp.zeros((emb_dim,)),
            "ffn1": linear_init(keys[ki + 2], emb_dim, 4 * emb_dim),
            "ffn2": linear_init(keys[ki + 3], 4 * emb_dim, emb_dim),
            "ln2_scale": jnp.ones((emb_dim,)),
            "ln2_bias": jnp.zeros((emb_dim,)),
        }
        ki += 4
        params["blocks"].append(block)
    params["pool_q"] = linear_init(keys[ki], emb_dim, emb_dim)
    return params


def _layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _mhsa(block, h, pad_mask, num_heads):
    b, s, e = h.shape
    d = e // num_heads
    qkv = linear_apply(block["qkv"], h).reshape(b, s, 3, num_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, S, H, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(h.dtype)
    logits = jnp.where(pad_mask[:, None, None, :], _NEG_INF, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, e)
    return linear_apply(block["proj"], out)


def encode(
    params: dict,
    seq_emb: jax.Array,
    seq_ids: jax.Array,
    *,
    num_heads: int,
    pad_id: int = 0,
    train: bool = False,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """seq_emb (B, S, E), seq_ids (B, S) -> encoded history (B, S, E)."""
    s = seq_emb.shape[-2]
    pad_mask = seq_ids == pad_id  # (B, S) True at padding
    h = seq_emb + params["pos_emb"][:s].astype(seq_emb.dtype)
    h = jnp.where(pad_mask[..., None], 0.0, h)
    for li, block in enumerate(params["blocks"]):
        hn = _layer_norm(h, block["ln1_scale"], block["ln1_bias"]).astype(h.dtype)
        a = _mhsa(block, hn, pad_mask, num_heads)
        if train and dropout_rate > 0.0 and rng is not None:
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(
                jax.random.fold_in(rng, 2 * li), keep, a.shape
            )
            a = jnp.where(mask, a / keep, 0.0)
        h = h + a
        hn = _layer_norm(h, block["ln2_scale"], block["ln2_bias"]).astype(h.dtype)
        f = linear_apply(block["ffn2"], jax.nn.relu(linear_apply(block["ffn1"], hn)))
        if train and dropout_rate > 0.0 and rng is not None:
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(
                jax.random.fold_in(rng, 2 * li + 1), keep, f.shape
            )
            f = jnp.where(mask, f / keep, 0.0)
        h = h + f
        h = jnp.where(pad_mask[..., None], 0.0, h)
    return h


def din_init(
    key: jax.Array, emb_dim: int, hidden_units: tuple[int, ...] = (64, 32)
) -> dict:
    """DIN local activation unit (Zhou et al. 2018, "Deep Interest Network").

    An MLP scores each history position against the candidate item from the
    interaction vector ``[h, h*t, h-t, t]`` (4E wide). Hidden layers use
    PReLU (the paper's alternative to Dice that needs no running statistics);
    the last layer is a plain linear to one logit per position.
    """
    dims = (4 * emb_dim, *hidden_units, 1)
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i in range(len(dims) - 1):
        layer = {"lin": linear_init(keys[i], dims[i], dims[i + 1])}
        if i < len(dims) - 2:  # hidden layers get a PReLU slope
            layer["alpha"] = jnp.full((dims[i + 1],), 0.25)
        layers.append(layer)
    return {"layers": layers}


def din_pool(
    params: dict,
    seq_emb: jax.Array,
    seq_ids: jax.Array,
    target_emb: jax.Array,
    *,
    pad_id: int = 0,
) -> jax.Array:
    """DIN attention pooling: sum_s w_s * h_s with w from the local
    activation unit. Deliberately NOT softmax-normalized — the paper keeps
    the raw activation weights "to retain the intensity of user interests"
    (§4.3); padding positions contribute zero weight, so an all-pad history
    pools to zeros (reference fallback parity, model_fibinet.py:176).

    seq_emb (B, S, E), seq_ids (B, S), target_emb (B, E) -> (B, E).
    """
    t = jnp.broadcast_to(target_emb[:, None, :], seq_emb.shape)
    z = jnp.concatenate([seq_emb, seq_emb * t, seq_emb - t, t], axis=-1)
    layers = params["layers"]
    for layer in layers[:-1]:
        z = linear_apply(layer["lin"], z)
        alpha = layer["alpha"].astype(z.dtype)
        z = jnp.where(z >= 0, z, alpha * z)  # PReLU
    w = linear_apply(layers[-1]["lin"], z)[..., 0]  # (B, S)
    w = jnp.where(seq_ids == pad_id, 0.0, w).astype(seq_emb.dtype)
    return jnp.einsum("bs,bse->be", w, seq_emb)


def target_pool(
    params: dict,
    encoded: jax.Array,
    seq_ids: jax.Array,
    target_emb: jax.Array,
    *,
    pad_id: int = 0,
) -> jax.Array:
    """Target-aware pooling: candidate item queries the encoded history.

    encoded (B, S, E), target_emb (B, E) -> (B, E). All-pad rows -> zeros.
    """
    e = encoded.shape[-1]
    q = linear_apply(params["pool_q"], target_emb)  # (B, E)
    logits = jnp.einsum("be,bse->bs", q, encoded) / jnp.sqrt(e).astype(encoded.dtype)
    pad_mask = seq_ids == pad_id
    logits = jnp.where(pad_mask, _NEG_INF, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    pooled = jnp.einsum("bs,bse->be", attn, encoded)
    any_real = jnp.any(~pad_mask, axis=-1, keepdims=True)
    return jnp.where(any_real, pooled, 0.0)
