"""DebiasCLIP: prompt-array debiasing wrapper over a CLIP-like dual encoder.

Re-design of the reference's core model (debias_clip/model/model.py:125-334):
a frozen CLIP plus ``num_debias_tokens`` learnable prompt embeddings injected
into the embedded text sequence.  The reference's per-sample Python loops for
the ``append*`` placements (model/model.py:226-254) become vectorized
interval-selects; its ``requires_grad`` freezing walk (model/model.py:291-334)
becomes a gradient-mask pytree (pure-functional equivalent).

Parity-critical quirks, reproduced deliberately (verified against the
reference by execution — see SURVEY.md §3.2):
  * ``prepend``: learned tokens receive NO positional embedding, and shifted
    raw tokens KEEP their original (pre-shift) positional embeddings —
    positions are added before the shift (model/model.py:209-225).  The last
    P raw token slots are truncated.
  * EOT pooling uses ``argmax(text) + P`` clamped to the last slot for EVERY
    placement mode (model/model.py:265-266), even when that overshoots (e.g.
    ``add`` mode) or when prepend-truncation removed the EOT embedding.
  * ``zeros`` init is the embedding OF TOKEN ID 0, not zero vectors
    (model/model.py:176-184).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CLIPConfig, DebiasConfig, Dotdict, debias_config_from_dotdict
from ..core.registry import resolve_arch
from . import clip as clip_model
from .layers import Params


# ---------------------------------------------------------------------------
# Prompt-token init (reference: model/model.py:174-194)
# ---------------------------------------------------------------------------


def init_debias_tokens(
    rng,
    clip_params: Params,
    cfg: DebiasConfig,
    tokenizer: Optional[Callable] = None,
) -> jax.Array:
    """Returns the learnable prompt array [P, hidden_dim]."""
    p = cfg.num_debias_tokens
    token_embedding = clip_params["text"]["token_embedding"]
    if isinstance(cfg.debias_token_init, str) and cfg.debias_token_init == "rand":
        # torch nn.Embedding default: N(0, 1)
        return jax.random.normal(rng, (p, cfg.hidden_dim), jnp.float32)
    if isinstance(cfg.debias_token_init, str) and cfg.debias_token_init == "zeros":
        # embeddings of token id 0 (NOT zero vectors)
        return jnp.broadcast_to(token_embedding[0], (p, cfg.hidden_dim)).copy()
    if isinstance(cfg.debias_token_init, (list, tuple)):
        if tokenizer is None:
            raise ValueError("word-list debias_token_init requires a tokenizer")
        words = list(cfg.debias_token_init)
        toks = np.asarray(tokenizer([" ".join(words)]))[0][1 : len(words) + 1]
        return token_embedding[jnp.asarray(toks, jnp.int32)]
    raise NotImplementedError(f"debias_token_init={cfg.debias_token_init!r}")


# ---------------------------------------------------------------------------
# Prompt injection (vectorized; reference: model/model.py:199-258)
# ---------------------------------------------------------------------------


def _interval_insert(raw: jax.Array, debias: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Per-sample: slots lo[i] <= j < hi[i] take debias[j - lo[i]], rest keep raw."""
    b, s, _ = raw.shape
    p = debias.shape[0]
    j = jnp.arange(s)[None, :]  # [1, S]
    inside = (j >= lo[:, None]) & (j < hi[:, None])  # [B, S]
    idx = jnp.clip(j - lo[:, None], 0, p - 1)  # [B, S]
    deb = debias.astype(raw.dtype)[idx]  # [B, S, D]
    return jnp.where(inside[..., None], deb, raw)


def inject_prompts(
    raw: jax.Array,
    debias_tokens: jax.Array,
    text: jax.Array,
    mode: str,
) -> jax.Array:
    """Insert learned prompt embeddings into an embedded (+positional) text
    sequence.  raw: [B, S, D] (token embeds + positions already added),
    debias_tokens: [P, D], text: [B, S] int ids.
    """
    p = debias_tokens.shape[0]
    if p == 0:
        return raw
    b, s, _ = raw.shape
    deb = debias_tokens.astype(raw.dtype)

    if mode == "prepend":
        # learned tokens at slots [0, P); raw sequence shifted, last P slots cut
        lead = jnp.broadcast_to(deb[None], (b, p, raw.shape[-1]))
        return jnp.concatenate([lead, raw[:, : s - p]], axis=1)

    eot = jnp.argmax(text, axis=-1)  # EOT is the max token id
    if mode == "append":
        # overwrite starting AT the EOT slot (reference model/model.py:230-242)
        lo = eot
        hi = lo + jnp.minimum(p, s - lo - 1)
        return _interval_insert(raw, deb, lo, hi)
    if mode == "append_after_eos":
        lo = eot + 1
        hi = jnp.minimum(lo + p, s)
        return _interval_insert(raw, deb, lo, hi)
    if mode == "add":
        pad = jnp.zeros((s, raw.shape[-1]), raw.dtype)
        pad = pad.at[1 : 1 + p].set(deb)
        return raw + pad[None]
    raise NotImplementedError(mode)


def debias_eot_index(text: jax.Array, num_debias_tokens: int, seq_len: int) -> jax.Array:
    """Pooling index: argmax(text) + P, clamped to the final slot — applied for
    all placement modes (reference: model/model.py:265-266)."""
    return jnp.minimum(jnp.argmax(text, axis=-1) + num_debias_tokens, seq_len - 1)


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def encode_text(
    clip_params: Params,
    debias_tokens: jax.Array,
    text: jax.Array,
    clip_cfg: CLIPConfig,
    debias_cfg: DebiasConfig,
    *,
    dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> jax.Array:
    """Debiased text encoding: [B, 77] ids → [B, embed_dim]."""
    tp = clip_params["text"]
    raw = clip_model.embed_tokens(tp, text, dtype=dtype)
    raw = clip_model.add_positional(tp, raw)
    x = inject_prompts(raw, debias_tokens, text, debias_cfg.debias_pos)
    x = clip_model.run_text_transformer(tp, x, clip_cfg.text,
                                        use_pallas=use_pallas, remat=remat)
    idx = debias_eot_index(text, debias_tokens.shape[0], x.shape[1])
    pooled = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0, :]
    return jnp.dot(pooled, tp["text_projection"].astype(x.dtype))


def encode_image(
    clip_params: Params,
    images: jax.Array,
    clip_cfg: CLIPConfig,
    **kw,
) -> jax.Array:
    """Image encoding delegates to the wrapped CLIP (reference: model/model.py:273-274)."""
    return clip_model.encode_image(clip_params, images, clip_cfg, **kw)


def forward(
    clip_params: Params,
    debias_tokens: jax.Array,
    images: jax.Array,
    text: jax.Array,
    clip_cfg: CLIPConfig,
    debias_cfg: DebiasConfig,
    **kw,
) -> Tuple[jax.Array, jax.Array]:
    """(logits_per_image, logits_per_text), reference: model/model.py:276-289."""
    # 'fused' selects the fused-block VISION kernels; the text path doesn't
    # take it, so route only the shared kwargs there
    txt_kw = {k: v for k, v in kw.items() if k != "fused"}
    txt = encode_text(clip_params, debias_tokens, text, clip_cfg, debias_cfg,
                      **txt_kw)
    img = encode_image(clip_params, images, clip_cfg, **kw).astype(jnp.float32)
    txt = txt.astype(jnp.float32)
    img = clip_model.l2_normalize(img)
    txt = clip_model.l2_normalize(txt)
    scale = jnp.exp(clip_params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# Freezing as gradient masks (replaces requires_grad walking,
# reference: model/model.py:36-82, 291-334)
# ---------------------------------------------------------------------------


def classify_params(clip_params: Params) -> Tuple[Dict[str, int], List[Dict[str, Any]]]:
    """Structured parameter classification — the reference's ``clip_layers``
    introspection surface (model/model.py:36-82): returns
    ``({type: count}, [{"type", "index", "param", "name"}, ...])`` with types
    proj / image / text / tokens / other.

    Names are slash-joined pytree paths (our layout, not torch's); per-layer
    resblock entries are the stacked leaves with ``index`` = -1 (a stacked
    leaf covers all layers; the per-layer counts live in metadata, and
    slice-level freezing uses trainable_mask).

    ResNet towers: the attention-pool head, stem and stages all classify as
    "other" (always frozen) — reference-faithful: the reference's prefix
    policy (model/model.py:49-66) puts only ViT's ``visual.proj`` /
    ``visual.ln_post`` in the proj group and only
    ``visual.transformer.resblocks.*`` in the image group, so
    ``visual.attnpool.*`` / ``visual.layer*`` never train there either.
    """
    metadata = {k: 0 for k in ("text", "image", "proj", "tokens", "other")}
    classed: List[Dict[str, Any]] = []

    def classify(path: str) -> str:
        if (path.startswith("text/ln_final") or path.startswith("text/text_projection")
                or path == "logit_scale" or path.startswith("visual/ln_post")
                or path == "visual/proj"):
            return "proj"
        if path.startswith("visual/resblocks"):
            return "image"
        if path.startswith("text/resblocks"):
            return "text"
        if path.startswith("text/token_embedding"):
            return "tokens"
        return "other"

    flat, _ = jax.tree_util.tree_flatten_with_path(clip_params)
    for key_path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        t = classify(name)
        classed.append({"type": t, "index": metadata[t], "param": leaf,
                        "name": name})
        metadata[t] += 1
    counts = layer_counts(clip_params)
    metadata["image"] = counts["image"]
    metadata["text"] = counts["text"]
    return metadata, classed


def layer_counts(clip_params: Params) -> Dict[str, int]:
    """Per-tower resblock counts (reference metadata, model/model.py:74-80)."""
    counts = {}
    for tower, key in (("image", "visual"), ("text", "text")):
        rb = clip_params.get(key, {}).get("resblocks")
        counts[tower] = 0 if rb is None else int(rb["ln_1"]["scale"].shape[0])
    return counts


def trainable_mask(clip_params: Params, debias_cfg: DebiasConfig) -> Params:
    """Pytree of float multipliers (same structure as clip_params, leaves
    broadcastable to each param) — 1.0 where the reference would leave
    ``requires_grad=True``:

      * 'proj' group (ln_final, text_projection, logit_scale, visual.ln_post,
        visual.proj): trainable iff not freeze_proj;
      * top ``n_train_{vid,text}_layers`` resblocks of each tower: trainable
        (per-layer slice masks on the stacked leaves);
      * token_embedding, positional embeddings, stems, BN, everything else:
        frozen.
    """
    counts = layer_counts(clip_params)
    n_text, n_vid = debias_cfg.n_train_text_layers, debias_cfg.n_train_vid_layers
    if not (counts["text"] >= n_text >= 0):
        raise ValueError(
            f"Number of trained text layers should be between 0 (no layers) and "
            f"{counts['text']} (all layers), not {n_text}"
        )
    if not (counts["image"] >= n_vid >= 0):
        raise ValueError(
            f"Number of trained vid layers should be between 0 (no layers) and "
            f"{counts['image']} (all layers), not {n_vid}"
        )

    proj_on = 0.0 if debias_cfg.freeze_proj else 1.0

    def layer_mask(stacked: Params, n_train: int) -> Params:
        def per_leaf(leaf):
            n_layers = leaf.shape[0]
            m = (jnp.arange(n_layers) >= n_layers - n_train).astype(jnp.float32)
            return m.reshape((n_layers,) + (1,) * (leaf.ndim - 1))

        return jax.tree.map(per_leaf, stacked)

    mask: Dict[str, Any] = {}
    for key, sub in clip_params.items():
        if key == "logit_scale":
            mask[key] = jnp.asarray(proj_on)
        elif key == "visual":
            vm = jax.tree.map(lambda _: jnp.asarray(0.0), sub)
            if "resblocks" in sub:
                vm["resblocks"] = layer_mask(sub["resblocks"], n_vid)
            for proj_key in ("ln_post", "proj"):
                if proj_key in sub:
                    vm[proj_key] = jax.tree.map(
                        lambda _: jnp.asarray(proj_on), sub[proj_key]
                    )
            mask[key] = vm
        elif key == "text":
            tm = jax.tree.map(lambda _: jnp.asarray(0.0), sub)
            tm["resblocks"] = layer_mask(sub["resblocks"], n_text)
            for proj_key in ("ln_final", "text_projection"):
                tm[proj_key] = jax.tree.map(
                    lambda _: jnp.asarray(proj_on), sub[proj_key]
                )
            mask[key] = tm
        else:
            mask[key] = jax.tree.map(lambda _: jnp.asarray(0.0), sub)
    return mask


def apply_grad_mask(grads: Params, mask: Params) -> Params:
    return jax.tree.map(lambda g, m: g * m.astype(g.dtype), grads, mask)


# ---------------------------------------------------------------------------
# Object-style wrapper mirroring the reference class surface
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DebiasCLIP:
    """Convenience bundle (functional core underneath).

    ``from_cfg`` mirrors the reference's UPPERCASE-dict constructor
    (reference: model/model.py:130-142) and returns
    ``(model, preprocess, tokenizer, alias)``.
    """

    clip_params: Params
    debias_tokens: jax.Array
    clip_cfg: CLIPConfig
    debias_cfg: DebiasConfig

    # -- reference-parity API ------------------------------------------------
    def encode_text(self, text, **kw) -> jax.Array:
        return encode_text(self.clip_params, self.debias_tokens, jnp.asarray(text),
                           self.clip_cfg, self.debias_cfg, **kw)

    def encode_image(self, images, **kw) -> jax.Array:
        return encode_image(self.clip_params, jnp.asarray(images), self.clip_cfg, **kw)

    def __call__(self, images, text, **kw):
        return forward(self.clip_params, self.debias_tokens, jnp.asarray(images),
                       jnp.asarray(text), self.clip_cfg, self.debias_cfg, **kw)

    forward = __call__

    @property
    def logit_scale(self) -> jax.Array:
        return self.clip_params["logit_scale"]

    def trainable_mask(self) -> Params:
        return trainable_mask(self.clip_params, self.debias_cfg)

    @staticmethod
    def from_cfg(cfg: Union[dict, Dotdict], rng: Optional[jax.Array] = None):
        """Build from an UPPERCASE-key config dict.  Extra keys are ignored
        (the reference swallows them via **_kwargs).

        Like the reference constructor (model/model.py:133-136, which loads a
        PRETRAINED CLIP through model_loader), the wrapped CLIP resolves
        pretrained weights by default; set ``PRETRAINED: False`` for random
        init (the loader warns loudly when resolution falls back to random).
        """
        cfg = Dotdict(cfg)
        if rng is None:
            rng = jax.random.key(cfg.SEED if cfg.SEED is not None else 0)
        clip_cfg = resolve_arch(cfg.CLIP_ARCH)
        debias_cfg = debias_config_from_dotdict(cfg)
        # match hidden_dim to the arch's text width unless explicitly set
        if cfg.HIDDEN_DIM is None:
            debias_cfg = dataclasses.replace(debias_cfg, hidden_dim=clip_cfg.text.width)

        from .loader import model_loader

        pretrained = True if cfg.PRETRAINED is None else bool(cfg.PRETRAINED)
        base, preprocess, tokenizer, alias = model_loader(
            cfg.CLIP_ARCH, device=cfg.DEVICE, pretrained=pretrained,
            weights=cfg.WEIGHTS,
            seed=int(cfg.SEED) if cfg.SEED is not None else 0)
        clip_params = base.params
        if cfg._tokenizer is not None:
            tokenizer = cfg._tokenizer

        _, k_deb = jax.random.split(jnp.asarray(rng))
        debias_tokens = init_debias_tokens(k_deb, clip_params, debias_cfg, tokenizer)
        model = DebiasCLIP(clip_params=clip_params, debias_tokens=debias_tokens,
                           clip_cfg=clip_cfg, debias_cfg=debias_cfg)
        return model, preprocess, tokenizer, alias


# Models are pytrees: params/prompt array are traced children, configs are
# static aux data.  This lets whole model bundles pass as jit ARGUMENTS
# (weights ship as buffers, not baked constants — mandatory for the remote-
# compile path) and makes jax.tree/device_put work on models directly.
jax.tree_util.register_pytree_node(
    DebiasCLIP,
    lambda m: ((m.clip_params, m.debias_tokens), (m.clip_cfg, m.debias_cfg)),
    lambda aux, ch: DebiasCLIP(clip_params=ch[0], debias_tokens=ch[1],
                               clip_cfg=aux[0], debias_cfg=aux[1]),
)
