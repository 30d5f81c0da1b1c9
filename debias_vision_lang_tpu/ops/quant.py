"""Int8 inference quantization for the embedding towers.

TPU MXUs execute int8×int8→int32 at ~2× the bf16 rate (v5e: ~394 TOPS int8 vs
~197 TFLOP/s bf16), so the bias-measurement hot loop — the whole dataset
through ``encode_image`` (reference: debias_clip/measuring_bias.py:85-99) —
can run with symmetric int8 weights + dynamic per-row int8 activations on
every transformer matmul.  Attention probabilities, LayerNorms, softmax and
residuals stay in fp32/bf16; ranking metrics are stable under the ~1e-2
relative embedding error this introduces (rank-level parity is asserted in
tests, and the fp32 path remains the default).

Pure-XLA implementation: ``lax.dot_general`` on int8 operands with int32
accumulation lowers directly onto the MXU — no hand-scheduling needed.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.layers import Params, layer_norm, quick_gelu


def _bundle_cfg(base):
    """CLIPConfig from either bundle flavor: CLIP (.cfg) / DebiasCLIP
    (.clip_cfg)."""
    return getattr(base, "cfg", None) or base.clip_cfg


def _bundle_params(base):
    params = getattr(base, "params", None)
    return params if params is not None else base.clip_params


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8 quantization.

    w: [..., in, out] → q int8 same shape, scale [..., 1, out] fp32.
    """
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def int8_matmul(x: jax.Array, wq: Dict[str, jax.Array],
                bias: Optional[jax.Array] = None) -> jax.Array:
    """Dynamic-activation int8 matmul: quantize x per row, MXU int8 GEMM,
    dequantize with (row_scale × channel_scale).  x: [..., in] fp."""
    x32 = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-8)
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq["q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * wq["scale"][..., 0, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Quantized transformer tower
# ---------------------------------------------------------------------------


def quantize_resblocks(stacked: Params) -> Params:
    """Quantize the four matmul weights of every (stacked) resblock."""
    out = {
        "ln_1": stacked["ln_1"],
        "ln_2": stacked["ln_2"],
        "attn": {
            "wqkv": quantize_weight(stacked["attn"]["wqkv"]),
            "bqkv": stacked["attn"]["bqkv"],
            "wo": quantize_weight(stacked["attn"]["wo"]),
            "bo": stacked["attn"]["bo"],
        },
        "mlp": {
            "w1": quantize_weight(stacked["mlp"]["w1"]),
            "b1": stacked["mlp"]["b1"],
            "w2": quantize_weight(stacked["mlp"]["w2"]),
            "b2": stacked["mlp"]["b2"],
        },
    }
    return out


def attn_residual_q(attn_q: Params, ln_p: Params, x: jax.Array, heads: int,
                    mask: Optional[jax.Array] = None) -> jax.Array:
    """``x + out_proj(MHA(LN(x)))`` with int8 QKV/out-proj matmuls and the
    attention core in fp — the attention half of ``resblock_q``, also used
    standalone by the divided video path (whose temporal attention runs on
    a [B·N, T, width] layout between reshapes)."""
    from ..ops.attention import attention_reference

    b, s, d = x.shape
    hd = d // heads
    h = layer_norm(ln_p, x)
    qkv = int8_matmul(h, attn_q["wqkv"], attn_q["bqkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_first(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    o = attention_reference(heads_first(q), heads_first(k), heads_first(v), mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    return x + int8_matmul(o, attn_q["wo"], attn_q["bo"])


def resblock_q(p: Params, x: jax.Array, heads: int,
               mask: Optional[jax.Array] = None, act=quick_gelu) -> jax.Array:
    """Pre-LN residual block with int8 matmuls (attention core in fp)."""
    x = attn_residual_q(p["attn"], p["ln_1"], x, heads, mask=mask)
    h = layer_norm(p["ln_2"], x)
    h = act(int8_matmul(h, p["mlp"]["w1"], p["mlp"]["b1"]))
    return x + int8_matmul(h, p["mlp"]["w2"], p["mlp"]["b2"])


def _use_fused_q(seq_len: int, width: int, dtype, fused: Optional[bool]) -> bool:
    """Auto policy for the int8 fused-block kernels (ops/fused_block_q.py):
    TPU backend + bf16 activations + VMEM fit at this (s, d).  Measured
    1.31×/1.12× over the bf16 fused MLP/attention blocks at ViT-B/16
    shapes, and 2.07× over the XLA int8 path at the full-tower level
    (5,433 vs 2,629 img/s).  The fit gate is sequence-aware: video joint
    towers (s=785) crash the Mosaic compile at any chain width and must
    take the XLA int8 path (see fused_q_fits_vmem)."""
    if fused is not None:
        return fused
    if dtype != jnp.bfloat16 or jax.default_backend() != "tpu":
        return False
    from .fused_block_q import fused_q_fits_vmem

    return fused_q_fits_vmem(seq_len, width)


def _fused_act_kind(act) -> Optional[str]:
    """Map a recognized activation callable to the kernel's act_kind; None
    for anything else (unknown callables must NOT be silently coerced —
    the XLA path honors them, so fall back there)."""
    if act is quick_gelu:
        return "quick_gelu"
    if (getattr(act, "func", None) is jax.nn.gelu
            and act.keywords.get("approximate") is False):
        return "gelu"
    return None


def transformer_q(p: Params, x: jax.Array, heads: int,
                  mask: Optional[jax.Array] = None, act=quick_gelu,
                  fused: Optional[bool] = None,
                  causal: bool = False) -> jax.Array:
    # fused path handles no-mask/causal + recognized activations only;
    # arbitrary masks/activations stay on the XLA path (which honors them).
    # causal=True generates the mask in-kernel on the fused path (same as
    # the bf16 text kernels) and as an additive mask on the XLA path.
    if causal and mask is not None:
        # composing would be ambiguous (which wins where they overlap?) and
        # silently dropping causality would leak future positions — reject
        raise ValueError("pass either causal=True or an explicit mask, "
                         "not both (compose them into one additive mask)")
    act_kind = _fused_act_kind(act)
    if (mask is None and act_kind is not None
            and _use_fused_q(x.shape[-2], x.shape[-1], x.dtype, fused)):
        from .fused_block_q import fused_transformer_q

        return fused_transformer_q(p, x, heads, act_kind=act_kind,
                                   causal=causal)
    # HYBRID long-sequence path: when the fully-fused tower is auto-gated
    # off only because the ATTENTION kernel cannot fit this s in VMEM (the
    # video joint tower at s = 1+T·196 = 785), the F-split MLP kernel can
    # still run fused — measured 1.28× over the XLA int8 MLP at the joint
    # shape (benchmarks/video_joint_mlp.py, fb=1536); attention stays on
    # the XLA int8 path.  Auto only (fused=None): explicit fused=False
    # keeps everything XLA, fused=True forces the fully-fused kernels.
    if (mask is None and act_kind is not None and not causal
            and fused is None and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        from .fused_block_q import mlp_block_q, mlp_fblock_for_seq

        f = p["mlp"]["w1"]["q"].shape[-1]
        fb = mlp_fblock_for_seq(x.shape[-2], x.shape[-1], f)
        if fb is not None:
            def hybrid_body(carry, layer_p):
                c = attn_residual_q(layer_p["attn"], layer_p["ln_1"],
                                    carry, heads)
                m = layer_p["mlp"]
                c = mlp_block_q(
                    c, layer_p["ln_2"]["scale"], layer_p["ln_2"]["bias"],
                    m["w1"]["q"], m["w1"]["scale"], m["b1"],
                    m["w2"]["q"], m["w2"]["scale"], m["b2"],
                    act_kind=act_kind, bb=1, fb=fb)
                return c, None

            x, _ = jax.lax.scan(hybrid_body, x, p)
            return x
    if causal and mask is None:
        from ..models.layers import causal_mask

        mask = causal_mask(x.shape[1])

    def body(carry, layer_p):
        return resblock_q(layer_p, carry, heads, mask=mask, act=act), None

    x, _ = jax.lax.scan(body, x, p)
    return x


# ---------------------------------------------------------------------------
# Quantized CLIP vision tower (ViT) — the bias-pipeline hot path
# ---------------------------------------------------------------------------


def quantize_vit_visual(visual: Params, mean=None, std=None) -> Params:
    from ..models.clip import fold_preprocess_into_patch

    # normalize-folded patch weights (models/clip.py) for the direct-from-
    # uint8 path; the plain conv1 stays for preprocessed-float inputs.
    # mean/std: the tower's training stats (VisionConfig.image_mean/_std —
    # CLIP default; SLIP = ImageNet)
    w_fold, b_fold = fold_preprocess_into_patch(visual["conv1"], mean, std)
    out = {
        "conv1": quantize_weight(visual["conv1"]["kernel"]),
        "conv1_folded": quantize_weight(w_fold),
        "conv1_bias_folded": b_fold,
        "class_embedding": visual["class_embedding"],
        "positional_embedding": visual["positional_embedding"],
        "resblocks": quantize_resblocks(visual["resblocks"]),
        "ln_post": visual["ln_post"],
        "proj": visual["proj"],
    }
    # timm-style (SLIP) towers: patch conv carries a bias, no ln_pre —
    # the bias must ride into the fp-input path too (the folded-u8 path
    # absorbs it via fold_preprocess_into_patch)
    if "bias" in visual["conv1"]:
        out["conv1_bias"] = visual["conv1"]["bias"]
    if "ln_pre" in visual:
        out["ln_pre"] = visual["ln_pre"]
    return out


def _patchify(images: jax.Array, patch: int) -> jax.Array:
    b, hh, ww, c = images.shape
    gh, gw = hh // patch, ww // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, patch * patch * c)


def patch_embed_q(images: jax.Array, patch: int, wq: Dict[str, jax.Array],
                  bias: Optional[jax.Array] = None,
                  out_dtype=jnp.bfloat16) -> jax.Array:
    """Relayout-free int8 patch embedding: [B, H, W, C] float → [B, P, width].

    Same per-patch dynamic activation quantization as
    ``int8_matmul(_patchify(x), wq)`` (amax over each patch's patch²·C
    elements), but the patchify transpose never materializes — the split
    patch dims (row-in-patch, col·chan) contract directly via
    ``dot_general`` against the kernel reshaped [patch, patch·C, width],
    and the images skip the f32→bf16 pre-cast (quantization reads full-
    precision values).  Measured +5.5% end-to-end on the headline int8
    path (benchmarks/stem_variants.py)."""
    b, hh, ww, c = images.shape
    width = wq["q"].shape[-1]
    gh, gw = hh // patch, ww // patch
    x5 = images.astype(jnp.float32).reshape(b, gh, patch, gw, patch * c)
    amax = jnp.max(jnp.abs(x5), axis=(2, 4), keepdims=True)
    x_scale = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x5 / x_scale), -127, 127).astype(jnp.int8)
    w3 = wq["q"].reshape(patch, patch * c, width)
    acc = jax.lax.dot_general(xq, w3, (((2, 4), (0, 1)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * x_scale[:, :, 0, :, 0][..., None]
           * wq["scale"][..., 0, :])
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(b, gh * gw, width).astype(out_dtype)


def patch_embed_q_p8(patches_u8: jax.Array, wq: Dict[str, jax.Array],
                     bias: Optional[jax.Array] = None,
                     out_dtype=jnp.bfloat16) -> jax.Array:
    """Exact int8 patch embedding from HOST-PATCHIFIED uint8 staging.

    patches_u8: [B, P, patch²·C] uint8 — the same bytes as
    [B, n_px, n_px, 3] written patch-row-contiguously at decode time
    (native/ingest.cc::dvl_ingest_batch_files_u8p — free on the host).
    The stem is then ONE contiguous int8 MXU matmul with zero relayout:

        xq  = u8 − 128                       (LOSSLESS int8 mapping)
        acc = xq @ wq + 128·colsum(wq)       (== u8 @ wq exactly, int32)
        out = acc · w_scale + bias

    The +128·colsum term undoes the shift in integer arithmetic, so the
    activation side is EXACT — the only quantization error is the weight
    rounding, strictly tighter than the dynamic per-patch activation
    quantization of ``patch_embed_q``.  No normalize pass, no f32 image
    tensor, no strided fetch (measured +1.4–2% end-to-end on the headline
    int8 path — benchmarks/stem_p8.py).  Use with the normalize-folded
    weights (``conv1_folded`` / ``conv1_bias_folded``)."""
    xq = (patches_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq["q"], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    # int32-exact: 768·127·255 ≈ 2.5e7 per term set, far under 2^31
    shift = 128 * jnp.sum(wq["q"].astype(jnp.int32), axis=0)
    out = (acc + shift).astype(jnp.float32) * wq["scale"][0]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _vit_q_trunk(p: Params, x: jax.Array, cfg,
                 fused: Optional[bool]) -> jax.Array:
    """cls/pos/pre-LN → int8 transformer → head, from patch embeddings."""
    import functools

    b = x.shape[0]
    # slip_vit (timm tower) uses EXACT erf GELU, matching models/clip.py's
    # fp path and the fused kernel — NOT jax.nn.gelu's tanh default
    act = (quick_gelu if cfg.kind == "vit"
           else functools.partial(jax.nn.gelu, approximate=False))
    cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype),
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)
    if cfg.kind == "vit":
        x = layer_norm(p["ln_pre"], x)
    x = transformer_q(p["resblocks"], x, cfg.heads, act=act, fused=fused)
    x = layer_norm(p["ln_post"], x[:, 0:1, :])[:, 0, :]
    return jnp.dot(x, p["proj"].astype(x.dtype))


def encode_image_vit_q_u8(params_q: Params, images_u8: jax.Array, cfg,
                          dtype=jnp.bfloat16,
                          fused: Optional[bool] = None) -> jax.Array:
    """Int8 ViT forward directly from staged uint8 [B, n_px, n_px, 3]:
    Normalize is folded into the (quantized) patch weights
    (models/clip.py::fold_preprocess_into_patch) — patchify runs on uint8
    and no float image tensor is materialized."""
    p = params_q
    x = patch_embed_q(images_u8, cfg.patch_size, p["conv1_folded"],
                      p["conv1_bias_folded"], out_dtype=dtype)
    return _vit_q_trunk(p, x, cfg, fused)


def encode_image_vit_q_p8(params_q: Params, patches_u8: jax.Array, cfg,
                          dtype=jnp.bfloat16,
                          fused: Optional[bool] = None) -> jax.Array:
    """Int8 ViT forward from host-patchified uint8 staging
    [B, P, patch²·3] (see ``patch_embed_q_p8``): the fastest headline
    stem — exact integer activations, one relayout-free int8 matmul,
    normalize folded into the weights."""
    p = params_q
    x = patch_embed_q_p8(patches_u8, p["conv1_folded"],
                         p["conv1_bias_folded"], out_dtype=dtype)
    return _vit_q_trunk(p, x, cfg, fused)


def encode_image_vit_q(params_q: Params, images: jax.Array, cfg,
                       dtype=jnp.bfloat16,
                       fused: Optional[bool] = None) -> jax.Array:
    """Int8 ViT forward: [B, H, W, 3] → [B, embed_dim].

    Mirrors the fp path's architecture branches (models/clip.py:109-121):
    SLIP's timm-style tower has no pre-LN and uses plain GELU."""
    p = params_q
    x = patch_embed_q(images, cfg.patch_size, p["conv1"],
                      p.get("conv1_bias"), out_dtype=dtype)
    return _vit_q_trunk(p, x, cfg, fused)


# ---------------------------------------------------------------------------
# Quantized CLIP text tower — optional (the bias pipeline encodes 319
# prompts once, so eval keeps text fp; text-heavy SERVING gains from it)
# ---------------------------------------------------------------------------


def quantize_clip_text(text: Params) -> Params:
    """Quantize the resblock matmul weights; embeddings/LN/projection fp."""
    return {
        "token_embedding": text["token_embedding"],
        "positional_embedding": text["positional_embedding"],
        "resblocks": quantize_resblocks(text["resblocks"]),
        "ln_final": text["ln_final"],
        "text_projection": text["text_projection"],
    }


def encode_text_q(text_q: Params, text: jax.Array, cfg,
                  dtype=jnp.bfloat16,
                  fused: Optional[bool] = None) -> jax.Array:
    """Int8 text forward: [B, 77] ids → [B, embed_dim].

    Same surround as the fp path (models/clip.py::encode_text — embed,
    positions, causal tower, ln_final, EOT-argmax pool, projection); only
    the resblock matmuls run int8.  ``cfg``: a TextConfig."""
    from ..models.clip import add_positional, embed_tokens, project_eot
    from ..models.layers import layer_norm

    x = add_positional(text_q, embed_tokens(text_q, text, dtype=dtype))
    x = transformer_q(text_q["resblocks"], x, cfg.heads, causal=True,
                      fused=fused)
    x = layer_norm(text_q["ln_final"], x)
    return project_eot(text_q, x, text)


def encode_text_q_debias(text_q: Params, debias_tokens: jax.Array,
                         text: jax.Array, cfg, debias_cfg,
                         dtype=jnp.bfloat16,
                         fused: Optional[bool] = None) -> jax.Array:
    """Debiased int8 text forward: prompt injection runs in fp at the
    embedding level (models/debias.py semantics, reference
    model/model.py:199-271 — injection happens BEFORE the tower, so the
    int8 resblocks see the injected sequence), pooling at the shifted
    clamped EOT."""
    from ..models.clip import add_positional, embed_tokens
    from ..models.debias import debias_eot_index, inject_prompts
    from ..models.layers import layer_norm

    x = add_positional(text_q, embed_tokens(text_q, text, dtype=dtype))
    x = inject_prompts(x, debias_tokens, text, debias_cfg.debias_pos)
    x = transformer_q(text_q["resblocks"], x, cfg.heads, causal=True,
                      fused=fused)
    x = layer_norm(text_q["ln_final"], x)
    idx = debias_eot_index(text, debias_tokens.shape[0], x.shape[1])
    pooled = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0, :]
    return jnp.dot(pooled, text_q["text_projection"].astype(x.dtype))


# ---------------------------------------------------------------------------
# Quantized video tower (Frozen-in-Time family) — completes the precision
# ladder across model families: the same int8 resblock machinery runs the
# joint and divided space-time formulations (models/frozen_in_time.py)
# ---------------------------------------------------------------------------


def quantize_video_visual(visual: Params) -> Params:
    """Quantize a video-ViT visual tree (frozen_in_time.init_video_vit_params
    layout: timm-style conv bias, Linear proj dict, per-block temporal
    attention).  Embeddings, LayerNorms and the projection stay fp; the
    divided path's temporal attention quantizes its QKV/out matmuls too."""
    out = {
        "conv1": quantize_weight(visual["conv1"]["kernel"]),
        "class_embedding": visual["class_embedding"],
        "positional_embedding": visual["positional_embedding"],
        "temporal_embedding": visual["temporal_embedding"],
        "resblocks": quantize_resblocks(visual["resblocks"]),
        "ln_pre": visual["ln_pre"],
        "ln_post": visual["ln_post"],
        "proj": visual["proj"],
    }
    if "bias" in visual["conv1"]:
        out["conv1_bias"] = visual["conv1"]["bias"]
    if "temporal_attn" in visual:
        t = visual["temporal_attn"]
        out["temporal_attn"] = {
            "ln_t": t["ln_t"],
            "attn": {
                "wqkv": quantize_weight(t["attn"]["wqkv"]),
                "bqkv": t["attn"]["bqkv"],
                "wo": quantize_weight(t["attn"]["wo"]),
                "bo": t["attn"]["bo"],
            },
        }
    return out


def _video_act():
    """Upstream FiT's tower is a timm ViT → EXACT (erf) GELU, matching the
    fp path (models/frozen_in_time.py::_fit_act) and the fused kernels'
    act_kind="gelu"."""
    import functools

    return functools.partial(jax.nn.gelu, approximate=False)


def _video_patch_embed_q(p: Params, cfg, dtype):
    """Quantized stem for the shared frame prologue
    (frozen_in_time._video_tokens): dynamic per-patch int8, relayout-free."""
    def pe(frames):
        return patch_embed_q(frames, cfg.patch_size, p["conv1"],
                             p.get("conv1_bias"), out_dtype=dtype)

    return pe


def encode_video_q(params_q: Params, videos: jax.Array, cfg,
                   dtype=jnp.bfloat16,
                   fused: Optional[bool] = None) -> jax.Array:
    """Int8 joint-attention video forward: [B, T, H, W, 3] (or a 4-D
    single-frame batch) → [B, embed_dim].

    Mirrors the fp path (models/frozen_in_time.py::encode_video): one fused
    attention over [CLS] + T·N space-time tokens — already the right int8
    kernel shape, so the stacked fused-block tower runs unchanged."""
    p = params_q
    x, b, t, n = _video_tokens_q(p, videos, cfg, dtype)
    x = x.reshape(b, t * n, cfg.width)
    cls = (p["class_embedding"].astype(dtype)
           + p["positional_embedding"].astype(dtype)[0])
    x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.width)), x], axis=1)
    x = layer_norm(p["ln_pre"], x)
    x = transformer_q(p["resblocks"], x, cfg.heads, act=_video_act(),
                      fused=fused)
    x = layer_norm(p["ln_post"], x[:, 0:1, :])[:, 0, :]
    from ..models.frozen_in_time import _project

    return _project(x, p["proj"], x.dtype)


def _video_tokens_q(p: Params, videos: jax.Array, cfg, dtype):
    from ..models.frozen_in_time import _video_tokens

    return _video_tokens(p, jnp.asarray(videos), cfg, dtype,
                         patch_embed_fn=_video_patch_embed_q(p, cfg, dtype))


def encode_video_divided_q(params_q: Params, videos: jax.Array, cfg,
                           dtype=jnp.bfloat16,
                           fused: Optional[bool] = None) -> jax.Array:
    """Int8 divided space-time video forward (upstream FiT's formulation,
    fp path: models/frozen_in_time.py::encode_video_divided).

    Per block: temporal attention over T at each spatial location on the
    XLA int8 path (S = T is tiny — a pallas grid of B·N steps would be
    launch-bound, and the fp core there is a [T, T] matmul), then the
    spatial-attention + MLP pair as ONE standard int8 residual block on the
    [B·T, N, width] layout — eligible for the fused-block kernels, since
    elementwise residual adds commute with the layout reshapes."""
    p = params_q
    if "temporal_attn" not in p:
        raise ValueError(
            "divided mode needs params carrying 'temporal_attn' "
            "(quantize_video_visual of an init_video_vit_params/converted "
            "FiT tree)")
    act = _video_act()
    x, b, t, n = _video_tokens_q(p, videos, cfg, dtype)
    x = layer_norm(p["ln_pre"], x)
    use_fused = _use_fused_q(n, cfg.width, x.dtype, fused)
    layers = p["resblocks"]["ln_1"]["scale"].shape[0]
    for i in range(layers):
        sp = jax.tree.map(lambda a: a[i], p["resblocks"])
        tp = jax.tree.map(lambda a: a[i], p["temporal_attn"])
        xt = x.transpose(0, 2, 1, 3).reshape(b * n, t, cfg.width)
        xt = attn_residual_q(tp["attn"], tp["ln_t"], xt, cfg.heads)
        x = xt.reshape(b, n, t, cfg.width).transpose(0, 2, 1, 3)
        xs = x.reshape(b * t, n, cfg.width)
        if use_fused:
            from .fused_block_q import fused_resblock_q

            xs = fused_resblock_q(sp, xs, cfg.heads, act_kind="gelu")
        else:
            xs = resblock_q(sp, xs, cfg.heads, act=act)
        x = xs.reshape(b, t, n, cfg.width)
    pooled = jnp.mean(x.reshape(b, t * n, cfg.width), axis=1)
    pooled = layer_norm(p["ln_post"], pooled[:, None, :])[:, 0, :]
    from ..models.frozen_in_time import _project

    return _project(pooled, p["proj"], pooled.dtype)


class QuantizedCLIP:
    """Inference bundle with an int8 vision tower; ``quantize_text=True``
    additionally runs the text resblocks int8 (default off: the bias
    pipeline encodes 319 prompts once — images are the hot loop — and the
    eval numerics contract keeps text fp)."""

    def __init__(self, base, quantize_text: bool = False):
        cfg = _bundle_cfg(base)
        if cfg.vision.kind in ("vit", "slip_vit"):
            self.visual_q = quantize_vit_visual(
                _bundle_params(base)["visual"],
                mean=cfg.vision.image_mean, std=cfg.vision.image_std)
        elif cfg.vision.kind == "video_vit":
            # video frames arrive preprocessed (the file-staging folded
            # stems are image-pipeline features) — no mean/std fold needed
            self.visual_q = quantize_video_visual(
                _bundle_params(base)["visual"])
        elif cfg.vision.kind == "resnet":
            from .quant_resnet import quantize_resnet_visual

            self.visual_q = quantize_resnet_visual(
                _bundle_params(base)["visual"])
        else:
            raise NotImplementedError(
                "int8 path supports ViT, video (video_vit) and resnet "
                f"towers, not {cfg.vision.kind!r}")
        self.base = base
        self.cfg = cfg
        self.text_q = (quantize_clip_text(_bundle_params(base)["text"])
                       if quantize_text else None)

    def encode_image(self, images, **kw):
        from ..models.clip import _is_patch_staging

        kw.pop("use_pallas", None)
        kw.pop("remat", None)  # inference-only tower: both knobs inert
        images = jnp.asarray(images)
        if self.cfg.vision.kind == "video_vit":
            # the bundle's own mode wins where it carries one (FrozenInTime
            # .attention — what base.encode_image would run); wrapped
            # bundles (DebiasCLIP over FiT) use the cfg-carried mode
            mode = (getattr(self.base, "attention", None)
                    or self.cfg.vision.video_attention)
            fn = (encode_video_divided_q if mode == "divided"
                  else encode_video_q)
            return fn(self.visual_q, images, self.cfg.vision, **kw)
        if self.cfg.vision.kind == "resnet":
            from .quant_resnet import encode_image_resnet_q

            kw.pop("fused", None)  # ViT fused-block knob (fp-path parity:
            # models/clip.py pops it for non-ViT towers too)
            return encode_image_resnet_q(self.visual_q, images,
                                         self.cfg.vision, **kw)
        if _is_patch_staging(images, self.cfg.vision):
            # host-patchified uint8 staging [B, P, patch²·3]: exact int8
            # stem with the normalize folded into the weights
            return encode_image_vit_q_p8(self.visual_q, images,
                                         self.cfg.vision, **kw)
        if images.ndim == 3:
            # any other 3-D input is ambiguous (a single HWC image, a
            # float tensor that merely looks like the staging): running
            # it through either stem would produce silent garbage
            raise ValueError(
                "3-D image input must be the uint8 patch-contiguous "
                f"staging [B, {(self.cfg.vision.image_size // self.cfg.vision.patch_size) ** 2}, "
                f"{self.cfg.vision.patch_size ** 2 * 3}] for this tower "
                f"(got {images.shape} {images.dtype}); batch single images "
                "to [1, H, W, 3]")
        return encode_image_vit_q(self.visual_q, images,
                                  self.cfg.vision, **kw)

    # video bundles treat images as 1-frame videos (FrozenInTime parity)
    encode_video = encode_image

    def encode_text(self, text, **kw):
        if self.text_q is None:
            return self.base.encode_text(text, **kw)
        kw.pop("use_pallas", None)
        kw.pop("remat", None)
        if hasattr(self.base, "debias_tokens"):  # DebiasCLIP bundle
            return encode_text_q_debias(
                self.text_q, self.base.debias_tokens, jnp.asarray(text),
                self.cfg.text, self.base.debias_cfg, **kw)
        return encode_text_q(self.text_q, jnp.asarray(text),
                             self.cfg.text, **kw)

    @property
    def logit_scale(self):
        return self.base.logit_scale


jax.tree_util.register_pytree_node(
    QuantizedCLIP,
    lambda m: ((m.base, m.visual_q, m.text_q), ()),
    lambda aux, ch: _rebuild_quantized(ch),
)


def _rebuild_quantized(children):
    base, visual_q, text_q = children
    obj = QuantizedCLIP.__new__(QuantizedCLIP)
    obj.base = base
    obj.cfg = _bundle_cfg(base)
    obj.visual_q = visual_q
    obj.text_q = text_q
    return obj


def quantize_for_inference(model, quantize_text: bool = False):
    """The int8-inference wrap policy, shared by the eval pipeline and the
    serving engine: wrap the bundle in QuantizedCLIP (idempotent) and return
    the activation compute dtype to run between blocks.

    Returns ``(wrapped_model, "bfloat16")``."""
    if not isinstance(model, QuantizedCLIP):
        model = QuantizedCLIP(model, quantize_text=quantize_text)
    return model, "bfloat16"


def _vision_kind(model) -> Optional[str]:
    """VisionConfig.kind of a bundle, or None when not discoverable
    (custom ClipLike objects)."""
    try:
        return _bundle_cfg(model).vision.kind
    except AttributeError:
        return None


def resolve_rung(model, dtype: str) -> str:
    """The precision rung a user-facing dtype string resolves to for this
    model family — "auto" picks the measured-fastest rung; everything else
    passes through.  Pure policy, no wrapping: callers that need to branch
    on the resolved rung (e.g. measure_bias's P8 patch-staging gate) use
    this BEFORE ``resolve_compute`` wraps the bundle.

    "auto" → int8 for ViT-family vision towers — image ViTs measured
    1.13–1.44× over bf16 (PERF.md arch sweep) and the video joint/divided
    towers measured faster too (PERF.md round-4 video ladder) — and
    bfloat16 for the ModifiedResNet family, where int8 measured 0.90–0.93×
    of bf16 (the dynamic activation-quantize passes over the big early conv
    activations are HBM-bound).
    """
    if dtype != "auto":
        return dtype
    kind = _vision_kind(model)
    return "bfloat16" if kind in (None, "resnet") else "int8"


def hint_implicit_fp32(entry: str) -> None:
    """One-line, once-per-message hint when an eval entry point runs at its
    float32 DEFAULT on a TPU backend.

    Decision (documented in docs/API.md "Precision ladder"): the default
    STAYS ``"float32"`` — bit-comparable reference-parity metrics are the
    product contract (SURVEY.md §6 build target), and flipping the default
    would silently change users' recorded numbers — but fp32-by-omission
    on a TPU leaves the measured 1.4–6× ladder (PERF.md) on the table, so
    the *implicit* case gets a pointer.  An explicit ``dtype="float32"``
    stays silent.
    """
    if jax.default_backend() != "tpu":
        return
    import warnings

    warnings.warn(
        f"{entry}: dtype defaulted to float32 (reference parity). On this "
        "TPU, dtype='auto' picks the fastest measured rung per model family "
        "(1.4-6x faster, rank-stable - PERF.md precision ladder).",
        stacklevel=3)


def resolve_compute(model, dtype: str):
    """Resolve a user-facing precision string to ``(model, compute_dtype)``.

    The one precision-ladder policy shared by eval/measure, eval/zero_shot
    and serve/engine: "int8" wraps the bundle via ``quantize_for_inference``
    (activations run bf16 between the int8 fused blocks); "bfloat16" /
    "float32" leave the model untouched; "auto" picks the measured-fastest
    rung per family (see ``resolve_rung``); anything else is rejected
    loudly.  An EXPLICIT ``dtype="int8"`` on a ResNet tower still runs —
    int8 buys 4× smaller weights — but warns, so callers don't silently
    pick the slower rung expecting a speedup.
    """
    if dtype == "auto":
        dtype = resolve_rung(model, dtype)
    elif dtype in ("int8", "int8-text") and _vision_kind(model) == "resnet":
        import warnings

        warnings.warn(
            "dtype='int8' on a ModifiedResNet tower measured 0.90-0.93x of "
            "bfloat16 on TPU v5e (PERF.md arch sweep) - int8 here buys "
            "4x smaller weights, not throughput. Use dtype='bfloat16' for "
            "speed, or dtype='auto' to pick the fastest rung per family.",
            UserWarning, stacklevel=3)
    if dtype in ("int8", "int8-text"):
        model, act = quantize_for_inference(
            model, quantize_text=(dtype == "int8-text"))
        return model, jnp.dtype(act)
    if dtype in ("bfloat16", "float32"):
        return model, jnp.dtype(dtype)
    raise ValueError(f"unknown dtype {dtype!r}: expected 'float32', "
                     "'bfloat16', 'int8', 'int8-text' (int8 text tower "
                     "too — text-heavy serving), or 'auto' (fastest "
                     "measured rung for the model family)")
