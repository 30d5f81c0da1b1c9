"""Functional transformer building blocks (params as pytrees, stacked layers).

TPU-first design notes:
  * Residual-block parameters are *stacked* along a leading layer axis and the
    tower runs as one ``lax.scan`` — one compiled block regardless of depth,
    uniform HLO for XLA to pipeline, and natural slice-wise gradient masking
    for the reference's "train only the top-N resblocks" freezing policy
    (reference: debias_clip/model/model.py:291-334 walks ``named_parameters``;
    here freezing is a per-layer mask on the stacked leaves).
  * Attention dispatches to the fused Pallas kernel on TPU
    (``ops.attention``), plain XLA elsewhere.
  * Params are stored fp32; ``dtype`` selects the compute precision.  fp32 is
    the parity mode (the reference upcasts everything to fp32,
    reference: debias_clip/model/model.py:136,170); bf16 is the speed mode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import attention

Params = Dict[str, Any]


def quick_gelu(x: jax.Array) -> jax.Array:
    """QuickGELU: x * sigmoid(1.702 x) — OpenAI CLIP's MLP activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm in fp32 (stability), result cast back to input dtype."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
    return y + p["bias"].astype(x.dtype)


def init_linear(rng, d_in: int, d_out: int, std: Optional[float] = None) -> Params:
    if std is None:
        std = d_in ** -0.5
    return {
        "kernel": jax.random.normal(rng, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def init_layer_norm(d: int) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


# ---------------------------------------------------------------------------
# Residual attention blocks (stacked over layers)
# ---------------------------------------------------------------------------


def init_resblocks(rng, layers: int, width: int) -> Params:
    """Stacked parameters for ``layers`` pre-LN residual attention blocks.

    Initialization follows OpenAI CLIP's scheme: attn in-proj std w^-0.5,
    out-proj and MLP proj std scaled by (2L)^-0.5, MLP fc std (2w)^-0.5,
    biases zero.
    """
    attn_std = width ** -0.5
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    k = jax.random.split(rng, 4)

    def nrm(key, shape, std):
        return jax.random.normal(key, shape, jnp.float32) * std

    return {
        "ln_1": {
            "scale": jnp.ones((layers, width), jnp.float32),
            "bias": jnp.zeros((layers, width), jnp.float32),
        },
        "attn": {
            "wqkv": nrm(k[0], (layers, width, 3 * width), attn_std),
            "bqkv": jnp.zeros((layers, 3 * width), jnp.float32),
            "wo": nrm(k[1], (layers, width, width), proj_std),
            "bo": jnp.zeros((layers, width), jnp.float32),
        },
        "ln_2": {
            "scale": jnp.ones((layers, width), jnp.float32),
            "bias": jnp.zeros((layers, width), jnp.float32),
        },
        "mlp": {
            "w1": nrm(k[2], (layers, width, 4 * width), fc_std),
            "b1": jnp.zeros((layers, 4 * width), jnp.float32),
            "w2": nrm(k[3], (layers, 4 * width, width), proj_std),
            "b2": jnp.zeros((layers, width), jnp.float32),
        },
    }


def multi_head_attention(
    p: Params,
    x: jax.Array,
    heads: int,
    mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Packed-QKV multi-head self-attention. x: [B, S, D].

    Default path keeps heads in [B, S, H, hd] layout end-to-end
    (ops.attention.attention_bshd): XLA fuses the head split into the score
    einsum instead of materializing [B, H, S, hd] transposes — measured -22%
    on the ViT-B/16 tower (v5e, batch 256).  The Pallas kernel (opt-in)
    needs the [B, H, S, hd] layout, so that branch transposes."""
    from ..ops.attention import attention_bshd

    b, s, d = x.shape
    hd = d // heads
    qkv = jnp.dot(x, p["wqkv"].astype(x.dtype)) + p["bqkv"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    if use_pallas:
        def heads_first(t):
            return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

        o = attention(heads_first(q), heads_first(k), heads_first(v), mask,
                      use_pallas=use_pallas)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    else:
        def heads_last(t):
            return t.reshape(b, s, heads, hd)

        o = attention_bshd(heads_last(q), heads_last(k), heads_last(v), mask)
        o = o.reshape(b, s, d)
    return jnp.dot(o, p["wo"].astype(x.dtype)) + p["bo"].astype(x.dtype)


def resblock(
    p: Params,
    x: jax.Array,
    heads: int,
    mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    act=quick_gelu,
) -> jax.Array:
    """One pre-LN residual attention block."""
    x = x + multi_head_attention(p["attn"], layer_norm(p["ln_1"], x), heads,
                                 mask=mask, use_pallas=use_pallas)
    h = linear({"kernel": p["mlp"]["w1"], "bias": p["mlp"]["b1"]},
               layer_norm(p["ln_2"], x))
    h = act(h)
    h = linear({"kernel": p["mlp"]["w2"], "bias": p["mlp"]["b2"]}, h)
    return x + h


def transformer(
    p: Params,
    x: jax.Array,
    heads: int,
    mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    act=quick_gelu,
    remat: bool = False,
) -> jax.Array:
    """Run stacked resblocks via lax.scan. x: [B, S, D] (batch-first)."""

    def body(carry, layer_p):
        y = resblock(layer_p, carry, heads, mask=mask, use_pallas=use_pallas, act=act)
        return y, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, p)
    return x


def causal_mask(s: int) -> jax.Array:
    """CLIP's additive causal mask: -inf above the diagonal, [S, S]."""
    return jnp.where(
        jnp.tril(jnp.ones((s, s), jnp.bool_)), 0.0, -jnp.inf
    ).astype(jnp.float32)


def init_mlp(rng, sizes, final_bias: bool = True) -> Params:
    """Plain MLP param stack (used by the Adversary).

    Torch ``nn.Linear`` default init (uniform ±1/sqrt(fan_in)) for behavioral
    parity with the reference adversary (debias_clip/model/model.py:348-358).
    """
    layers = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for i, (d_in, d_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        bound = d_in ** -0.5
        kk, kb = jax.random.split(keys[i])
        layers.append({
            "kernel": jax.random.uniform(kk, (d_in, d_out), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
        })
    return {"layers": layers}
