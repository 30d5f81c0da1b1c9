"""Int8 inference for the ModifiedResNet vision tower (CLIP RN50/101/50x4).

Completes the precision ladder across ALL tower families (ViT and video:
ops/quant.py).  The reference runs these archs via the external ``clip``
package in fp (reference: debias_clip/model/model.py:85-92); on TPU the
MXU executes s8×s8→s32 convolutions at ~2× the bf16 rate, and XLA lowers
``conv_general_dilated`` on int8 operands directly.

Design:
  * **BN folding** — inference-mode BatchNorm (frozen-encoder semantics,
    models/resnet.py::batch_norm) is a per-channel affine, folded into the
    preceding conv: ``w' = w · γ/√(σ²+ε)`` per OUTPUT channel plus an f32
    bias.  Per-output-channel weight quantization then absorbs the folded
    scales exactly — no extra quantization error from folding.
  * **1×1 convs run as per-row dynamic int8 matmuls** (a pixel = a row)
    through the existing ``ops.quant.int8_matmul`` machinery — conv1/conv3/
    downsample of every bottleneck and the attention-pool projections.
  * **3×3 convs** (stem + bottleneck conv2) run as s8×s8→s32
    ``conv_general_dilated`` with a dynamic per-image activation scale.
  * Residual adds, ReLUs, avg-pools and the attention-pool core stay fp
    (bf16/f32), mirroring the ViT policy (softmax/LN/residuals fp).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.layers import Params
from ..models.resnet import _BN_EPS, avg_pool
from .quant import int8_matmul, quantize_weight


def fold_bn(conv_p: Params, bn_p: Params):
    """(conv kernel, inference BN) → (folded f32 kernel, f32 bias)."""
    inv = jax.lax.rsqrt(bn_p["var"].astype(jnp.float32) + _BN_EPS)
    s = bn_p["scale"].astype(jnp.float32) * inv
    w = conv_p["kernel"].astype(jnp.float32) * s
    b = (bn_p["bias"].astype(jnp.float32)
         - bn_p["mean"].astype(jnp.float32) * s)
    return w, b


def quantize_conv_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8: [kh, kw, ci, co] → q int8 +
    scale [co] fp32."""
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def int8_conv(x: jax.Array, wq: Dict[str, jax.Array],
              bias: Optional[jax.Array] = None, stride: int = 1,
              padding: int = 0) -> jax.Array:
    """Dynamic-activation int8 conv: per-image activation scale, s8×s8→s32
    MXU conv, dequantize with (image_scale × channel_scale)."""
    x32 = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq["q"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s_x * wq["scale"]
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def _q1x1(w: jax.Array):
    """Folded 1×1 conv kernel [1, 1, ci, co] → int8 matmul layout
    (quantize_weight on [ci, co]: per-row pixel scales at run time)."""
    return quantize_weight(w[0, 0])


def quantize_resnet_visual(visual: Params) -> Params:
    """Quantize a ModifiedResNet visual tree (models/resnet.py layout):
    every conv+BN pair folds to one int8 conv/matmul + f32 bias; the
    attention-pool projections quantize like transformer matmuls."""
    out = {}
    for i in (1, 2, 3):  # 3×3 stem convs
        w, b = fold_bn(visual[f"conv{i}"], visual[f"bn{i}"])
        out[f"conv{i}"] = quantize_conv_weight(w)
        out[f"bias{i}"] = b
    for stage in range(1, 5):
        blocks = []
        for blk in visual[f"layer{stage}"]:
            w1, b1 = fold_bn(blk["conv1"], blk["bn1"])
            w2, b2 = fold_bn(blk["conv2"], blk["bn2"])
            w3, b3 = fold_bn(blk["conv3"], blk["bn3"])
            q = {
                "conv1": _q1x1(w1), "bias1": b1,
                "conv2": quantize_conv_weight(w2), "bias2": b2,
                "conv3": _q1x1(w3), "bias3": b3,
            }
            if "downsample" in blk:
                wd, bd = fold_bn(blk["downsample"]["conv"],
                                 blk["downsample"]["bn"])
                q["downsample"] = {"conv": _q1x1(wd), "bias": bd}
            blocks.append(q)
        out[f"layer{stage}"] = blocks
    ap = visual["attnpool"]
    out["attnpool"] = {
        "positional_embedding": ap["positional_embedding"],
        **{name: {"w": quantize_weight(ap[name]["kernel"]),
                  "bias": ap[name]["bias"]}
           for name in ("q_proj", "k_proj", "v_proj", "c_proj")},
    }
    return out


def bottleneck_q(p: Params, x: jax.Array, stride: int) -> jax.Array:
    """Int8 bottleneck, structurally identical to models/resnet.py::
    bottleneck (anti-aliased downsampling, zero-init bn3 folded in)."""
    out = jax.nn.relu(int8_matmul(x, p["conv1"], p["bias1"]))
    out = jax.nn.relu(int8_conv(out, p["conv2"], p["bias2"], padding=1))
    if stride > 1:
        out = avg_pool(out, stride)
    out = int8_matmul(out, p["conv3"], p["bias3"])
    if "downsample" in p:
        identity = x
        if stride > 1:
            identity = avg_pool(identity, stride)
        identity = int8_matmul(identity, p["downsample"]["conv"],
                               p["downsample"]["bias"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attn_pool_q(p: Params, x: jax.Array, heads: int) -> jax.Array:
    """Int8 attention pool: the 4 projections run int8, the single-query
    attention core fp (models/resnet.py::attn_pool structure)."""
    import math

    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    mean = jnp.mean(x, axis=1, keepdims=True)
    x = jnp.concatenate([mean, x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)[None]

    def proj(pp, t):
        return int8_matmul(t, pp["w"], pp["bias"])

    q = proj(p["q_proj"], x[:, :1])
    k = proj(p["k_proj"], x)
    v = proj(p["v_proj"], x)
    hd = c // heads
    q = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(probs.dtype)).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return int8_matmul(o, p["c_proj"]["w"], p["c_proj"]["bias"])


def encode_image_resnet_q(params_q: Params, images: jax.Array, cfg,
                          dtype=jnp.bfloat16) -> jax.Array:
    """Int8 ModifiedResNet forward: [B, H, W, 3] → [B, embed_dim].
    Mirrors models/resnet.py::encode_image_resnet's structure exactly."""
    p = params_q
    x = images.astype(dtype)
    x = jax.nn.relu(int8_conv(x, p["conv1"], p["bias1"], stride=2, padding=1))
    x = jax.nn.relu(int8_conv(x, p["conv2"], p["bias2"], padding=1))
    x = jax.nn.relu(int8_conv(x, p["conv3"], p["bias3"], padding=1))
    x = avg_pool(x, 2)
    for stage_i in range(4):
        for bi, block in enumerate(p[f"layer{stage_i + 1}"]):
            stride = 2 if (stage_i > 0 and bi == 0) else 1
            x = bottleneck_q(block, x, stride)
    return attn_pool_q(p["attnpool"], x, cfg.heads)
