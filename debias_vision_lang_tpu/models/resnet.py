"""ModifiedResNet vision tower (CLIP RN50 / RN101 / RN50x4).

The reference supports these archs via the external ``clip`` package
(reference: debias_clip/model/model.py:85-92).  CLIP's "modified" ResNet:
3-conv stem (each conv + BN + ReLU) followed by avg-pool, anti-aliased
downsampling (avg-pool before every strided conv), and an attention-pool
head instead of global average pooling.

TPU notes: NHWC layout throughout (XLA's native conv layout on TPU), BN as an
inference-mode affine transform (the encoders are frozen during debias
training, reference: debias_clip/model/model.py:145 defaults), explicit
(1,1)-style paddings to match torch's conv arithmetic exactly.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.config import VisionConfig
from .layers import Params

_BN_EPS = 1e-5


def init_conv(rng, kh: int, kw: int, c_in: int, c_out: int) -> Params:
    fan_in = kh * kw * c_in
    std = math.sqrt(2.0 / fan_in)
    return {"kernel": std * jax.random.normal(rng, (kh, kw, c_in, c_out), jnp.float32)}


def init_bn(c: int, zero_scale: bool = False) -> Params:
    return {
        "scale": (jnp.zeros if zero_scale else jnp.ones)((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def conv(p: Params, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(p: Params, x: jax.Array) -> jax.Array:
    """Inference-mode BN with running stats (frozen-encoder semantics)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + _BN_EPS)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
            ).astype(x.dtype)
    return x * scale + bias


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


# ---------------------------------------------------------------------------
# Bottleneck
# ---------------------------------------------------------------------------

EXPANSION = 4


def init_bottleneck(rng, c_in: int, planes: int, stride: int) -> Params:
    k = jax.random.split(rng, 4)
    p = {
        "conv1": init_conv(k[0], 1, 1, c_in, planes),
        "bn1": init_bn(planes),
        "conv2": init_conv(k[1], 3, 3, planes, planes),
        "bn2": init_bn(planes),
        "conv3": init_conv(k[2], 1, 1, planes, planes * EXPANSION),
        # CLIP zero-inits the last BN scale of each bottleneck
        "bn3": init_bn(planes * EXPANSION, zero_scale=True),
    }
    if stride > 1 or c_in != planes * EXPANSION:
        p["downsample"] = {
            "conv": init_conv(k[3], 1, 1, c_in, planes * EXPANSION),
            "bn": init_bn(planes * EXPANSION),
        }
    return p


def bottleneck(p: Params, x: jax.Array, stride: int) -> jax.Array:
    # stride is static structure (2 for the first block of stages 2-4), kept
    # out of the params pytree so tree ops see only arrays.
    out = jax.nn.relu(batch_norm(p["bn1"], conv(p["conv1"], x)))
    out = jax.nn.relu(batch_norm(p["bn2"], conv(p["conv2"], out, padding=1)))
    if stride > 1:  # anti-aliased downsampling: pool, then 1x1 conv
        out = avg_pool(out, stride)
    out = batch_norm(p["bn3"], conv(p["conv3"], out))
    if "downsample" in p:
        identity = x
        if stride > 1:
            identity = avg_pool(identity, stride)
        identity = batch_norm(p["downsample"]["bn"], conv(p["downsample"]["conv"], identity))
    else:
        identity = x
    return jax.nn.relu(out + identity)


# ---------------------------------------------------------------------------
# Attention pool head
# ---------------------------------------------------------------------------


def init_attn_pool(rng, spacial_dim: int, embed_dim: int, out_dim: int) -> Params:
    k = jax.random.split(rng, 5)
    std = embed_dim ** -0.5

    def lin(key, d_in, d_out):
        return {
            "kernel": std * jax.random.normal(key, (d_in, d_out), jnp.float32),
            "bias": jnp.zeros((d_out,), jnp.float32),
        }

    return {
        "positional_embedding": std
        * jax.random.normal(k[0], (spacial_dim * spacial_dim + 1, embed_dim), jnp.float32),
        "q_proj": lin(k[1], embed_dim, embed_dim),
        "k_proj": lin(k[2], embed_dim, embed_dim),
        "v_proj": lin(k[3], embed_dim, embed_dim),
        "c_proj": lin(k[4], embed_dim, out_dim),
    }


def attn_pool(p: Params, x: jax.Array, heads: int) -> jax.Array:
    """CLIP AttentionPool2d: mean token as the (single) query over [mean; HW].

    x: [B, H, W, C] → [B, out_dim].
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    mean = jnp.mean(x, axis=1, keepdims=True)
    x = jnp.concatenate([mean, x], axis=1)  # [B, HW+1, C]
    x = x + p["positional_embedding"].astype(x.dtype)[None]

    def proj(pp, t):
        return jnp.dot(t, pp["kernel"].astype(t.dtype)) + pp["bias"].astype(t.dtype)

    q = proj(p["q_proj"], x[:, :1])  # only the mean token queries
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
    return proj(p["c_proj"], o)


# ---------------------------------------------------------------------------
# Full tower
# ---------------------------------------------------------------------------


def init_modified_resnet_params(rng, cfg: VisionConfig) -> Params:
    width = cfg.width  # stem width (64 for RN50/101, 80 for RN50x4)
    stages: Sequence[int] = cfg.layers
    k = jax.random.split(rng, 8)
    p = {
        "conv1": init_conv(k[0], 3, 3, 3, width // 2),
        "bn1": init_bn(width // 2),
        "conv2": init_conv(k[1], 3, 3, width // 2, width // 2),
        "bn2": init_bn(width // 2),
        "conv3": init_conv(k[2], 3, 3, width // 2, width),
        "bn3": init_bn(width),
    }
    c_in = width
    for stage_i, (blocks, stride) in enumerate(zip(stages, (1, 2, 2, 2))):
        planes = width * (2 ** stage_i)
        stage = []
        keys = jax.random.split(k[3 + stage_i], blocks)
        for bi in range(blocks):
            stage.append(init_bottleneck(keys[bi], c_in, planes, stride if bi == 0 else 1))
            c_in = planes * EXPANSION
        p[f"layer{stage_i + 1}"] = stage
    embed_dim = width * 32
    p["attnpool"] = init_attn_pool(
        k[7], cfg.image_size // 32, embed_dim, cfg.embed_dim
    )
    return p


def encode_image_resnet(
    params: Params,
    images: jax.Array,
    cfg: VisionConfig,
    *,
    dtype=jnp.float32,
    use_pallas: Optional[bool] = None,  # accepted for API uniformity
    remat: bool = False,
) -> jax.Array:
    """[B, H, W, 3] NHWC → [B, embed_dim]."""
    del use_pallas, remat
    p = params
    x = images.astype(dtype)
    x = jax.nn.relu(batch_norm(p["bn1"], conv(p["conv1"], x, stride=2, padding=1)))
    x = jax.nn.relu(batch_norm(p["bn2"], conv(p["conv2"], x, padding=1)))
    x = jax.nn.relu(batch_norm(p["bn3"], conv(p["conv3"], x, padding=1)))
    x = avg_pool(x, 2)
    for stage_i in range(4):
        for bi, block in enumerate(p[f"layer{stage_i + 1}"]):
            stride = 2 if (stage_i > 0 and bi == 0) else 1
            x = bottleneck(block, x, stride)
    return attn_pool(p["attnpool"], x, cfg.heads)
