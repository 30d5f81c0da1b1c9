"""Frozen-in-Time video–text dual encoder (m-bain/frozen-in-time family).

The reference advertises this family but stubs it with NotImplementedError
(reference: debias_clip/model/model.py:115-116; configs in BASELINE.json).
Here it is a working backend conforming to the ``ClipLike`` protocol so
``measure_bias`` / ``DebiasCLIP`` work unchanged on video models.

Design (TPU-first, documented divergences from the upstream torch repo):
  * video tower = ViT over space-time patch tokens: per-frame patch embeds
    share the spatial positional embedding, a learned temporal embedding is
    added per frame, and one JOINT attention runs over [CLS] + T·N tokens.
    (Joint attention is one big fused attention — better MXU shape at T≤8,
    no per-block temporal loop.  Frames are zero-padded/subsampled to the
    configured max.)  Upstream's divided space-time attention is also
    implemented (``encode_video_divided``); the loader selects it
    automatically for converted FiT checkpoints, whose trained
    ``temporal_attn`` weights the joint path would ignore.
  * text tower = the CLIP text transformer (upstream uses DistilBERT; keeping
    the CLIP tower preserves tokenizer + prompt-injection compatibility,
    which is what the debias pipeline needs).
  * image inputs [B, H, W, 3] are treated as single-frame videos, so the
    image-based FairFace measurement path runs unmodified.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import CLIPConfig, VisionConfig
from . import clip as clip_model
from .layers import Params, layer_norm, transformer

DEFAULT_NUM_FRAMES = 4


def _fit_act(cfg: VisionConfig):
    """Upstream FiT's video tower is a timm ViT → EXACT (erf) GELU."""
    import functools

    return functools.partial(jax.nn.gelu, approximate=False)


def _project(x: jax.Array, proj, dtype) -> jax.Array:
    """Final projection: bare matrix (CLIP style) or {'kernel','bias'} dict
    (upstream FiT's ``vid_proj`` Linear carries a bias)."""
    if isinstance(proj, dict):
        return jnp.dot(x, proj["kernel"].astype(dtype)) + proj["bias"].astype(dtype)
    return jnp.dot(x, proj.astype(dtype))


def init_video_vit_params(rng, cfg: VisionConfig,
                          num_frames: int = DEFAULT_NUM_FRAMES,
                          divided: bool = True) -> Params:
    """Random-init video tower with the SAME tree structure as
    ``convert.from_fit_state_dict`` output (timm-style conv bias, Linear
    proj with bias, per-block temporal attention) — a structure mismatch
    breaks optimizer-state templates and checkpoint restores, the same
    invariant ``init_vit_params`` enforces for slip_vit.

    ``divided`` is kept for back-compat and ignored: the temporal-attention
    subtree is always present (zero-init → exact identity, free for the
    joint path which simply doesn't read it)."""
    del divided
    p = clip_model.init_vit_params(rng, cfg)
    p["conv1"]["bias"] = jnp.zeros((cfg.width,), jnp.float32)
    p["proj"] = {"kernel": p["proj"],
                 "bias": jnp.zeros((cfg.embed_dim,), jnp.float32)}
    # ZERO-initialized (upstream FiT's identity trick, same reason as the
    # temporal attention's zero output proj below): a freshly-added temporal
    # axis must not perturb image-pretrained weights — with zeros, a 1-frame
    # video embeds exactly like the underlying image ViT; training grows the
    # temporal signal from zero
    p["temporal_embedding"] = jnp.zeros((num_frames, cfg.width), jnp.float32)
    p["temporal_attn"] = init_temporal_attn_params(
        jax.random.fold_in(rng, 19), cfg)
    return p


def init_temporal_attn_params(rng, cfg: VisionConfig) -> Params:
    """Per-block temporal attention for divided space-time mode.

    Upstream Frozen-in-Time's key trick: the temporal attention's OUTPUT
    projection is ZERO-initialized, so a freshly-added temporal path is an
    identity and image-pretrained weights keep working; training grows the
    temporal pathway from zero.
    """
    from .layers import init_resblocks

    width, layers = cfg.width, cfg.layers
    base = init_resblocks(rng, layers, width)
    return {
        "ln_t": base["ln_1"],
        "attn": {
            "wqkv": base["attn"]["wqkv"],
            "bqkv": base["attn"]["bqkv"],
            "wo": jnp.zeros_like(base["attn"]["wo"]),  # zero-init output
            "bo": jnp.zeros_like(base["attn"]["bo"]),
        },
    }


def _video_tokens(params: Params, videos: jax.Array, cfg: VisionConfig, dtype,
                  patch_embed_fn=None):
    """Shared prologue of both video paths: [B, T, H, W, 3] (4-D promoted to
    1 frame) → per-frame patch tokens [B, T, N, width] with spatial
    positions (class slot skipped, shared across frames) and the temporal
    embedding added; frames uniformly subsampled to the embedding capacity.
    Returns (tokens, b, t, n).

    ``patch_embed_fn`` overrides the stem ([B·T, H, W, 3] float → tokens);
    the int8 path (ops/quant.py::encode_video_q) injects its quantized patch
    embedding here so both precisions share one frame-staging prologue."""
    p = params
    if videos.ndim == 4:
        videos = videos[:, None]
    b, t, h, w, c = videos.shape
    max_t = p["temporal_embedding"].shape[0]
    if t > max_t:
        idx = jnp.linspace(0, t - 1, max_t).astype(jnp.int32)
        videos = videos[:, idx]
        t = max_t
    frames = videos.reshape(b * t, h, w, c)
    if patch_embed_fn is None:
        x = clip_model.patch_embed(p["conv1"], frames.astype(dtype),
                                   cfg.patch_size)
    else:
        x = patch_embed_fn(frames)
    n = x.shape[1]
    x = x.reshape(b, t, n, cfg.width)
    x = x + p["positional_embedding"].astype(dtype)[1 : n + 1][None, None]
    x = x + p["temporal_embedding"].astype(dtype)[:t][None, :, None, :]
    return x, b, t, n


def encode_video(
    params: Params,
    videos: jax.Array,
    cfg: VisionConfig,
    *,
    dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> jax.Array:
    """[B, T, H, W, 3] (or [B, H, W, 3] single frame) → [B, embed_dim]."""
    p = params
    x, b, t, n = _video_tokens(p, videos, cfg, dtype)
    x = x.reshape(b, t * n, cfg.width)

    cls = p["class_embedding"].astype(dtype) + p["positional_embedding"].astype(dtype)[0]
    x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.width)), x], axis=1)
    x = layer_norm(p["ln_pre"], x)
    x = transformer(p["resblocks"], x, cfg.heads, mask=None,
                    use_pallas=use_pallas, remat=remat, act=_fit_act(cfg))
    x = layer_norm(p["ln_post"], x[:, 0:1, :])[:, 0, :]
    return _project(x, p["proj"], dtype)


def encode_video_divided(
    params: Params,
    videos: jax.Array,
    cfg: VisionConfig,
    *,
    dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> jax.Array:
    """Divided space-time attention (TimeSformer-style, upstream FiT's
    formulation): per block, temporal attention across frames at each spatial
    location (zero-initialized output → starts as identity), then spatial
    attention within each frame, then the MLP.  Mean-pooled embedding.

    [B, T, H, W, 3] → [B, embed_dim].  Requires params carrying
    ``temporal_attn`` (``init_video_vit_params`` emits it; so does
    ``convert.from_fit_state_dict``).
    """
    from .layers import layer_norm as ln
    from .layers import linear, multi_head_attention

    p = params
    if "temporal_attn" not in p:
        raise ValueError(
            "divided mode needs params carrying 'temporal_attn' "
            "(init_video_vit_params or a converted FiT checkpoint)")
    x, b, t, n = _video_tokens(p, videos, cfg, dtype)
    x = ln(p["ln_pre"], x)

    def block(x, sp, tp):
        # temporal: attend over T at each spatial location
        xt = x.transpose(0, 2, 1, 3).reshape(b * n, t, cfg.width)
        at = multi_head_attention(tp["attn"], ln(tp["ln_t"], xt), cfg.heads,
                                  use_pallas=use_pallas)
        x = x + at.reshape(b, n, t, cfg.width).transpose(0, 2, 1, 3)
        # spatial: attend within each frame
        xs = x.reshape(b * t, n, cfg.width)
        asp = multi_head_attention(sp["attn"], ln(sp["ln_1"], xs), cfg.heads,
                                   use_pallas=use_pallas)
        x = x + asp.reshape(b, t, n, cfg.width)
        # MLP (timm tower → exact GELU)
        hdn = linear({"kernel": sp["mlp"]["w1"], "bias": sp["mlp"]["b1"]},
                     ln(sp["ln_2"], x))
        return x + linear({"kernel": sp["mlp"]["w2"], "bias": sp["mlp"]["b2"]},
                          jax.nn.gelu(hdn, approximate=False))

    if remat:
        # recompute each block's activations on the backward pass (long
        # videos: activation memory scales with T·N per layer)
        block = jax.checkpoint(block)
    layers = p["resblocks"]["ln_1"]["scale"].shape[0]
    for i in range(layers):
        sp = jax.tree.map(lambda a: a[i], p["resblocks"])
        tp = jax.tree.map(lambda a: a[i], p["temporal_attn"])
        x = block(x, sp, tp)

    pooled = jnp.mean(x.reshape(b, t * n, cfg.width), axis=1)
    pooled = ln(p["ln_post"], pooled[:, None, :])[:, 0, :]
    return _project(pooled, p["proj"], dtype)


def init_fit_params(rng, cfg: CLIPConfig,
                    num_frames: int = DEFAULT_NUM_FRAMES) -> Params:
    kv, kt = jax.random.split(jnp.asarray(rng))
    import math

    return {
        "visual": init_video_vit_params(kv, cfg.vision, num_frames),
        "text": clip_model.init_text_params(kt, cfg.text),
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }


@dataclasses.dataclass
class FrozenInTime:
    """ClipLike bundle for the video family.

    ``attention`` selects the video-tower formulation:
      * "joint" (default) — one fused attention over [CLS] + T·N tokens,
        the TPU-first design (module docstring);
      * "divided" — upstream-faithful divided space-time attention; the
        loader selects this automatically for converted FiT checkpoints,
        whose trained ``temporal_attn`` weights the joint path would ignore.
    """

    params: Params
    cfg: CLIPConfig
    attention: str = "joint"

    def __post_init__(self):
        if self.attention not in ("joint", "divided"):
            raise ValueError(
                f"attention must be 'joint' or 'divided', got "
                f"{self.attention!r}")
        # loader may hand us plain image-ViT params; add the temporal axis
        # (zeros — the identity-preserving init, see init_video_vit_params)
        if "temporal_embedding" not in self.params["visual"]:
            self.params["visual"]["temporal_embedding"] = jnp.zeros(
                (DEFAULT_NUM_FRAMES, self.cfg.vision.width), jnp.float32)

    def encode_image(self, images, **kw):
        """Images are 1-frame videos; [B,T,H,W,3] videos also accepted."""
        fn = (encode_video_divided if self.attention == "divided"
              else encode_video)
        return fn(self.params["visual"], jnp.asarray(images),
                  self.cfg.vision, **kw)

    encode_video = encode_image

    def encode_text(self, text, **kw):
        return clip_model.encode_text(self.params, jnp.asarray(text), self.cfg, **kw)

    def __call__(self, images, text, **kw):
        img = self.encode_image(images, **kw).astype(jnp.float32)
        # 'fused' is a ViT-kernel knob the text tower doesn't take
        txt_kw = {k: v for k, v in kw.items() if k != "fused"}
        txt = self.encode_text(text, **txt_kw).astype(jnp.float32)
        img = clip_model.l2_normalize(img)
        txt = clip_model.l2_normalize(txt)
        scale = jnp.exp(self.params["logit_scale"])
        logits = scale * img @ txt.T
        return logits, logits.T

    forward = __call__

    @property
    def logit_scale(self):
        return self.params["logit_scale"]


jax.tree_util.register_pytree_node(
    FrozenInTime,
    lambda m: ((m.params,), (m.cfg, m.attention)),
    lambda aux, ch: FrozenInTime(params=ch[0], cfg=aux[0], attention=aux[1]),
)
