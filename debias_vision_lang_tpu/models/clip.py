"""CLIP dual encoder — functional JAX implementation (ViT + text transformer).

Replaces the external ``clip`` package the reference imports
(reference: debias_clip/model/model.py:4,112).  The text tower is exposed
*piecewise* — ``embed_tokens`` / ``add_positional`` / ``run_transformer`` /
``final_norm`` / ``project_eot`` — because prompt injection happens between
embedding and transformer (reference: debias_clip/model/model.py:208-262);
a monolithic ``encode_text`` would not support the DebiasCLIP wrapper.

TPU notes: the patch conv is a reshape + one big matmul (stride == kernel
size, so conv == patch-flatten @ W: pure MXU work, no conv lowering); towers
run as ``lax.scan`` over stacked resblocks with fused Pallas attention.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import CLIPConfig, TextConfig, VisionConfig
from .layers import (
    Params,
    causal_mask,
    init_layer_norm,
    init_resblocks,
    layer_norm,
    quick_gelu,
    transformer,
)

# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_vit_params(rng, cfg: VisionConfig) -> Params:
    width, embed = cfg.width, cfg.embed_dim
    scale = width ** -0.5
    k = jax.random.split(rng, 5)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    conv1 = {
        # [patch_h * patch_w * channels, width]; layout must match
        # convert.py's conv-weight permutation.
        "kernel": jax.random.normal(k[0], (patch_dim, width), jnp.float32)
        * (patch_dim ** -0.5),
    }
    out = {
        "conv1": conv1,
        "class_embedding": scale * jax.random.normal(k[1], (width,), jnp.float32),
        "positional_embedding": scale
        * jax.random.normal(k[2], (cfg.seq_len, width), jnp.float32),
        "resblocks": init_resblocks(k[3], cfg.layers, width),
        "ln_post": init_layer_norm(width),
        "proj": scale * jax.random.normal(k[4], (width, embed), jnp.float32),
    }
    # random init must produce the SAME tree structure as the checkpoint
    # converters (from_slip_state_dict emits conv bias + no ln_pre): a
    # structure mismatch breaks optimizer-state templates and restores
    if cfg.kind == "slip_vit":
        conv1["bias"] = jnp.zeros((width,), jnp.float32)
    else:
        out["ln_pre"] = init_layer_norm(width)
    return out


def init_text_params(rng, cfg: TextConfig) -> Params:
    k = jax.random.split(rng, 4)
    return {
        "token_embedding": 0.02
        * jax.random.normal(k[0], (cfg.vocab_size, cfg.width), jnp.float32),
        "positional_embedding": 0.01
        * jax.random.normal(k[1], (cfg.context_length, cfg.width), jnp.float32),
        "resblocks": init_resblocks(k[2], cfg.layers, cfg.width),
        "ln_final": init_layer_norm(cfg.width),
        "text_projection": (cfg.width ** -0.5)
        * jax.random.normal(k[3], (cfg.width, cfg.embed_dim), jnp.float32),
    }


def init_clip_params(rng, cfg: CLIPConfig) -> Params:
    kv, kt = jax.random.split(rng)
    if cfg.vision.kind == "resnet":
        from .resnet import init_modified_resnet_params

        visual = init_modified_resnet_params(kv, cfg.vision)
    elif cfg.vision.kind in ("vit", "slip_vit"):
        visual = init_vit_params(kv, cfg.vision)
    elif cfg.vision.kind == "video_vit":
        from .frozen_in_time import init_video_vit_params

        visual = init_video_vit_params(kv, cfg.vision)
    else:
        raise NotImplementedError(cfg.vision.kind)
    return {
        "visual": visual,
        "text": init_text_params(kt, cfg.text),
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


def patch_embed(p: Params, images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] NHWC → [B, num_patches, width], relayout-free.

    Instead of materializing the patchified [B, P, patch²·3] tensor (a
    transpose/relayout of the full image tensor — measured ~relayout-bound
    at 26 TF/s, benchmarks/stem_variants.py), contract the split patch
    dims directly: reshape [B, gh, patch, gw, patch·3] (both reshapes are
    free — they only split contiguous axes) and ``dot_general`` over
    (row-in-patch, col·chan) against the kernel reshaped
    [patch, patch·3, width].  XLA folds the strided access into the matmul
    fetch; measured +5.5% end-to-end on the int8 headline path.

    Optional ``bias``: OpenAI CLIP's patch conv is bias-free, timm-style
    towers (SLIP, Frozen-in-Time) carry one."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x5 = images.reshape(b, gh, patch, gw, patch * c)
    k3 = p["kernel"].astype(images.dtype).reshape(
        patch, patch * c, p["kernel"].shape[-1])
    out = jax.lax.dot_general(x5, k3, (((2, 4), (0, 1)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out.reshape(b, gh * gw, k3.shape[-1]).astype(images.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def _use_fused_blocks(cfg: VisionConfig, dtype, use_pallas, fused) -> bool:
    """Auto policy for the fused-block Pallas path (ops/fused_block.py):
    TPU backend, bf16 compute, weights fit the VMEM budget, caller didn't
    force the plain-attention Pallas kernel.  Measured 94.6 → 62.3 ms on the
    ViT-B/16 batch-256 tower (the workload is HBM-bandwidth-bound on v5e)."""
    if fused is not None:
        return fused
    if use_pallas or dtype != jnp.bfloat16:
        return False
    if jax.default_backend() != "tpu":
        return False
    from ..ops.fused_block import fused_blocks_fit_vmem

    return fused_blocks_fit_vmem(cfg.width, dtype)


def _vit_trunk(p: Params, x: jax.Array, cfg: VisionConfig, dtype,
               use_pallas, remat, fused) -> jax.Array:
    """cls/pos/pre-LN → transformer → post-LN/proj, from patch embeddings."""
    # slip_vit = timm tower = EXACT (erf) GELU, not jax's default tanh approx
    act = quick_gelu if cfg.kind == "vit" else functools.partial(
        jax.nn.gelu, approximate=False)
    b = x.shape[0]
    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    if cfg.kind == "vit":  # SLIP's timm-style ViT has no pre-LN
        x = layer_norm(p["ln_pre"], x)
    if _use_fused_blocks(cfg, dtype, use_pallas, fused):
        from ..ops.fused_block import fused_transformer_diff

        act_kind = "quick_gelu" if cfg.kind == "vit" else "gelu"
        x = fused_transformer_diff(p["resblocks"], x, cfg.heads,
                                   act_kind=act_kind)
    else:
        x = transformer(p["resblocks"], x, cfg.heads, mask=None,
                        use_pallas=use_pallas, act=act, remat=remat)
    x = layer_norm(p["ln_post"], x[:, 0:1, :])[:, 0, :]
    return jnp.dot(x, p["proj"].astype(dtype))


def encode_image_vit(
    params: Params,
    images: jax.Array,
    cfg: VisionConfig,
    *,
    dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
    fused: Optional[bool] = None,
) -> jax.Array:
    """ViT forward: [B, H, W, 3] → [B, embed_dim]."""
    p = params
    x = patch_embed(p["conv1"], images.astype(dtype), cfg.patch_size)
    return _vit_trunk(p, x, cfg, dtype, use_pallas, remat, fused)


def fold_preprocess_into_patch(p_conv: Params, mean=None, std=None):
    """Absorb CLIP's Normalize into the patch-conv weights.

    conv(normalize(u8)) == u8 @ W' + b' with W'[i, :] = W[i, :]/(255·std[c])
    and b' = Σ_i (-mean[c]/std[c])·W[i, :] (c = channel of input element i;
    timm conv bias folds into b' too) — so patchify runs on UINT8 (9.6 MB
    vs 38.6 MB f32 per 256-batch) and the separate normalize pass vanishes.
    Returns f32 (W', b').  ``mean``/``std`` default to CLIP's stats; pass
    the tower's VisionConfig.image_mean/image_std (SLIP/FiT = ImageNet)."""
    from ..vision.preprocess import CLIP_MEAN, CLIP_STD

    k = p_conv["kernel"].astype(jnp.float32)  # [patch²·3, width]
    mean = jnp.asarray(CLIP_MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(CLIP_STD if std is None else std, jnp.float32)
    c = jnp.arange(k.shape[0]) % 3
    w_f = k * (1.0 / (255.0 * std))[c][:, None]
    b_f = (-mean / std)[c] @ k
    if "bias" in p_conv:
        b_f = b_f + p_conv["bias"].astype(jnp.float32)
    return w_f, b_f


def encode_image_vit_u8(
    params: Params,
    images_u8: jax.Array,
    cfg: VisionConfig,
    *,
    dtype=jnp.bfloat16,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
    fused: Optional[bool] = None,
) -> jax.Array:
    """ViT forward directly from staged uint8 [B, n_px, n_px, 3] images —
    the preprocess Normalize is folded into the patch conv
    (fold_preprocess_into_patch), so no float image tensor is ever
    materialized.  Numerically equivalent to
    ``encode_image_vit(preprocess_batch(u8))`` up to dtype rounding (uint8
    values are exact in bfloat16).  The uint8 input must already be at the
    model's resolution (the native-ingest staging contract)."""
    p = params
    w_f, b_f = fold_preprocess_into_patch(p["conv1"], cfg.image_mean,
                                          cfg.image_std)
    # one relayout-free patchify implementation for every stem: patch_embed
    # with the folded kernel+bias (uint8 upcast to the compute dtype first)
    x = patch_embed({"kernel": w_f, "bias": b_f},
                    images_u8.astype(dtype), cfg.patch_size)
    return _vit_trunk(p, x, cfg, dtype, use_pallas, remat, fused)


def encode_image_vit_p8(
    params: Params,
    patches_u8: jax.Array,
    cfg: VisionConfig,
    *,
    dtype=jnp.bfloat16,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
    fused: Optional[bool] = None,
) -> jax.Array:
    """ViT forward from PATCH-CONTIGUOUS uint8 staging [B, P, patch²·3]
    (the layout the native loader writes at decode time —
    native/ingest.cc::dvl_ingest_batch_files_u8p).  The preprocess
    Normalize is folded into the patch weights (fold_preprocess_into_patch)
    and the stem is ONE contiguous dot with zero relayout — uint8 values
    are exact in bfloat16, so this is at least as accurate as
    ``encode_image_vit(preprocess_batch(u8))`` at the same compute dtype.
    Floating-point sibling of ops/quant.py::encode_image_vit_q_p8."""
    p = params
    w_f, b_f = fold_preprocess_into_patch(p["conv1"], cfg.image_mean,
                                          cfg.image_std)
    x = jax.lax.dot_general(patches_u8.astype(dtype), w_f.astype(dtype),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x = x.astype(dtype) + b_f.astype(dtype)
    return _vit_trunk(p, x, cfg, dtype, use_pallas, remat, fused)


def _is_patch_staging(images: jax.Array, cfg: VisionConfig) -> bool:
    """True iff `images` is the patch-contiguous uint8 staging for this
    tower: [B, (n/patch)², patch²·3].  The last-dim check keeps single
    [H, W, 3] images (last dim 3) unambiguous."""
    return (images.ndim == 3 and images.dtype == jnp.uint8
            and images.shape[-1] == cfg.patch_size * cfg.patch_size * 3
            and images.shape[-2] == (cfg.image_size // cfg.patch_size) ** 2)


def encode_image(params: Params, images: jax.Array, cfg: CLIPConfig, **kw) -> jax.Array:
    if cfg.vision.kind in ("vit", "slip_vit"):
        if _is_patch_staging(images, cfg.vision):
            kw.setdefault("dtype", jnp.bfloat16)
            return encode_image_vit_p8(params["visual"], images, cfg.vision, **kw)
        return encode_image_vit(params["visual"], images, cfg.vision, **kw)
    kw.pop("fused", None)  # ViT fused-block knob; other towers take
    # dtype/use_pallas/remat only — a uniform caller must not TypeError
    if cfg.vision.kind == "resnet":
        from .resnet import encode_image_resnet

        return encode_image_resnet(params["visual"], images, cfg.vision, **kw)
    if cfg.vision.kind == "video_vit":
        from .frozen_in_time import encode_video, encode_video_divided

        if cfg.vision.video_attention == "divided":
            return encode_video_divided(params["visual"], images,
                                        cfg.vision, **kw)
        return encode_video(params["visual"], images, cfg.vision, **kw)
    raise NotImplementedError(cfg.vision.kind)


# ---------------------------------------------------------------------------
# Text tower — piecewise API (prompt injection hooks in between)
# ---------------------------------------------------------------------------


def embed_tokens(params: Params, text: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Token-id lookup: [B, S] int → [B, S, width]."""
    return params["token_embedding"].astype(dtype)[text]


def add_positional(params: Params, x: jax.Array) -> jax.Array:
    return x + params["positional_embedding"].astype(x.dtype)[: x.shape[1]]


def _use_fused_text(cfg: TextConfig, dtype, use_pallas,
                    fused=None) -> bool:
    """Fused-block gate for the text tower — ONE policy with the vision
    gate (TPU + bf16 + VMEM fit; explicit ``fused`` overrides), the causal
    mask generated in-kernel."""
    return _use_fused_blocks(cfg, dtype, use_pallas, fused)


def run_text_transformer(
    params: Params,
    x: jax.Array,
    cfg: TextConfig,
    *,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
    fused: Optional[bool] = None,
) -> jax.Array:
    """Causal-masked transformer over embedded text, then final LayerNorm."""
    if _use_fused_text(cfg, x.dtype, use_pallas, fused):
        from ..ops.fused_block import fused_transformer_diff

        x = fused_transformer_diff(params["resblocks"], x, cfg.heads,
                                   causal=True)
    else:
        mask = causal_mask(x.shape[1])
        x = transformer(params["resblocks"], x, cfg.heads, mask=mask,
                        use_pallas=use_pallas, remat=remat)
    return layer_norm(params["ln_final"], x)


def project_eot(params: Params, x: jax.Array, text: jax.Array) -> jax.Array:
    """Pool at the EOT position (argmax of token ids — EOT is the largest id,
    reference relies on this at debias_clip/model/model.py:265) and project."""
    eot = jnp.argmax(text, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    return jnp.dot(pooled, params["text_projection"].astype(x.dtype))


def encode_text(
    params: Params,
    text: jax.Array,
    cfg: CLIPConfig,
    *,
    dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> jax.Array:
    """Vanilla CLIP text encoding: [B, 77] int tokens → [B, embed_dim]."""
    p = params["text"]
    x = embed_tokens(p, text, dtype=dtype)
    x = add_positional(p, x)
    x = run_text_transformer(p, x, cfg.text, use_pallas=use_pallas, remat=remat)
    return project_eot(p, x, text)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """``eps`` floors the norm (NaN guard for zero vectors); the default 0.0
    is bit-identical to the reference's bare ``x / x.norm()``."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def forward(
    params: Params,
    images: jax.Array,
    text: jax.Array,
    cfg: CLIPConfig,
    **kw,
):
    """CLIP forward: returns (logits_per_image, logits_per_text)
    (reference: debias_clip/model/model.py:276-289, same normalized-cosine
    logits with exp(logit_scale))."""
    img = encode_image(params, images, cfg, **kw).astype(jnp.float32)
    # 'fused' selects the fused-block VISION kernels; the text tower doesn't
    # take it, so route only the shared kwargs there
    txt_kw = {k: v for k, v in kw.items() if k != "fused"}
    txt = encode_text(params, text, cfg, **txt_kw).astype(jnp.float32)
    img = l2_normalize(img)
    txt = l2_normalize(txt)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T
