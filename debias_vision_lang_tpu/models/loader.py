"""Model loader + ``ClipLike`` protocol.

Mirrors the reference's loader surface (reference: debias_clip/model/model.py:
12-33 ClipLike stub, :85-122 model_loader) — returns
``(model, preprocess, tokenizer, alias)`` — but every advertised family
actually builds: OpenAI CLIP archs, SLIP, and Frozen-in-Time (the reference
stubs the latter two with NotImplementedError at model/model.py:115-118).

Weight resolution (offline-friendly), in order:
  1. explicit ``weights=`` path (.pt/.npz/.safetensors OpenAI- or HF-named);
  2. ``$DEBIAS_VLT_WEIGHTS_DIR/<alias>.{npz,pt,safetensors}``;
  3. HuggingFace ``transformers`` (local cache or network) for CLIP archs;
  4. ``pretrained=False`` → random init (tests, training from scratch).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional, Protocol, Tuple, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CLIPConfig
from ..core.registry import VALID_MODELS, alias_name, resolve_arch
from ..vision.preprocess import Preprocess, build_preprocess
from . import clip as clip_model
from .layers import Params

_HF_NAMES = {
    "ViT-B/16": "openai/clip-vit-base-patch16",
    "ViT-B/32": "openai/clip-vit-base-patch32",
    "ViT-L/14": "openai/clip-vit-large-patch14",
}


@runtime_checkable
class ClipLike(Protocol):
    """Structural type for dual encoders the eval/debias layers accept
    (reference analogue: debias_clip/model/model.py:12-33)."""

    logit_scale: Any

    def encode_image(self, images) -> Any: ...

    def encode_text(self, tokenized_texts) -> Any: ...


@dataclasses.dataclass
class CLIP:
    """Vanilla CLIP bundle (functional core: models/clip.py)."""

    params: Params
    cfg: CLIPConfig

    def encode_image(self, images, **kw):
        return clip_model.encode_image(self.params, jnp.asarray(images), self.cfg, **kw)

    def encode_text(self, text, **kw):
        return clip_model.encode_text(self.params, jnp.asarray(text), self.cfg, **kw)

    def __call__(self, images, text, **kw):
        return clip_model.forward(self.params, jnp.asarray(images),
                                  jnp.asarray(text), self.cfg, **kw)

    forward = __call__

    @property
    def logit_scale(self):
        return self.params["logit_scale"]


# pytree registration: params traced, config static (see models/debias.py)
jax.tree_util.register_pytree_node(
    CLIP,
    lambda m: ((m.params,), (m.cfg,)),
    lambda aux, ch: CLIP(params=ch[0], cfg=aux[0]),
)


def _dispatch_state_dict(obj, cfg: CLIPConfig) -> Params:
    """Route a flat state_dict to the right converter by key naming:
    HF CLIPModel (text_model.*), facebookresearch/SLIP (visual.blocks.* +
    image_projection), m-bain/frozen-in-time (video_model.*), else OpenAI
    CLIP naming."""
    from . import convert

    if "state_dict" in obj and not hasattr(obj["state_dict"], "shape"):
        obj = obj["state_dict"]
    keys = [k[7:] if k.startswith("module.") else k for k in obj]
    if any(k.startswith("video_model.") for k in keys):
        return convert.from_fit_state_dict(obj)
    if any(k.startswith("visual.blocks.") for k in keys):
        return convert.from_slip_state_dict(obj)
    if any(k.startswith("text_model.") for k in keys):
        return convert.from_hf_state_dict(obj, cfg)
    return convert.from_openai_state_dict(obj, cfg)


def _load_weights_file(path: str, cfg: CLIPConfig) -> Params:
    if path.endswith(".npz"):
        return _dispatch_state_dict(dict(np.load(path)), cfg)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # optional dep, gated

        return _dispatch_state_dict(load_file(path), cfg)
    # torch formats (.pt/.bin): state_dict or jit archive
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return _dispatch_state_dict(obj, cfg)


def _resolve_pretrained(model_name: str, cfg: CLIPConfig) -> Optional[Params]:
    """Weights-dir lookup (all families, keyed by alias) then the HF hub
    (OpenAI CLIP archs only)."""
    from . import convert

    wdir = os.environ.get("DEBIAS_VLT_WEIGHTS_DIR")
    if wdir:
        alias = alias_name(model_name)
        for ext in (".npz", ".pt", ".bin", ".safetensors"):
            cand = os.path.join(wdir, alias + ext)
            if os.path.exists(cand):
                return _load_weights_file(cand, cfg)
    arch = (model_name.split("/", 2)[-1]
            if model_name.startswith("openai/CLIP/") else None)
    if arch in _HF_NAMES:
        try:
            from transformers import CLIPModel

            # local cache first — the networked path retries DNS for ~a
            # minute on offline machines, so only attempt it when the hub
            # is actually reachable
            try:
                hf = CLIPModel.from_pretrained(_HF_NAMES[arch],
                                               local_files_only=True)
            except Exception:
                import socket

                socket.create_connection(("huggingface.co", 443),
                                         timeout=3).close()
                hf = CLIPModel.from_pretrained(_HF_NAMES[arch])
            return convert.from_hf_model(hf, cfg)
        except Exception:
            return None
    return None


def _temporal_attn_trained(params) -> bool:
    """True iff the video tower's temporal-attention OUTPUT projection is
    nonzero — i.e. the divided space-time path was actually trained.
    Upstream FiT zero-inits ``timeattn.proj`` (identity trick), and our
    joint-attention models never touch the subtree, so zero ⇒ the weights
    carry no temporal signal and the formulation choice is free."""
    ta = params.get("visual", {}).get("temporal_attn")
    if ta is None:
        return False
    attn = ta.get("attn", {})
    return any(
        bool(np.any(np.asarray(attn[k]) != 0))
        for k in ("wo", "bo") if k in attn)


def model_loader(
    model_name: str,
    device=None,  # accepted for signature parity; placement is mesh-driven
    jit: bool = False,
    pretrained: bool = True,
    weights: Optional[str] = None,
    seed: int = 0,
) -> Tuple[ClipLike, Callable, Callable, str]:
    """Returns (cliplike model, image preprocess, tokenizer, alias).

    Reference semantics: name validated against the registry
    (model/model.py:105-108), alias scheme preserved (:114).  ``device`` and
    ``jit`` are accepted but inert — everything is jitted functionally and
    placed by shardings, not device strings.
    """
    del device, jit
    if model_name not in VALID_MODELS:
        raise NotImplementedError(
            f"{model_name} not found, should be one of.. {VALID_MODELS}"
        )
    cfg = resolve_arch(model_name)
    alias = alias_name(model_name)

    params = None
    if weights is not None:
        # an explicit checkpoint path is honored regardless of the
        # pretrained flag — silently discarding it would be a trap
        params = _load_weights_file(weights, cfg)
    elif pretrained:
        params = _resolve_pretrained(model_name, cfg)
        if params is None:
            import warnings

            warnings.warn(
                f"pretrained weights for {model_name} could not be resolved "
                f"(no local file, $DEBIAS_VLT_WEIGHTS_DIR entry, or HF cache/"
                f"network) — falling back to RANDOM initialization. Pass "
                f"pretrained=False to silence, or weights=<path>.",
                stacklevel=2,
            )
    loaded = params is not None
    if params is None:
        params = clip_model.init_clip_params(jax.random.key(seed), cfg)
    elif "text" not in params:
        # FiT checkpoints carry only the video tower (upstream text side is
        # DistilBERT — documented divergence, models/frozen_in_time.py);
        # the CLIP text tower falls back to random init unless separately
        # loaded.
        import warnings

        warnings.warn(
            f"{model_name}: checkpoint provided no text tower (upstream "
            "Frozen-in-Time uses DistilBERT; this framework keeps the CLIP "
            "text transformer) — text weights are RANDOM-initialized.",
            stacklevel=2)
        params["text"] = clip_model.init_text_params(
            jax.random.key(seed), cfg.text)

    if cfg.vision.kind == "video_vit":
        from .frozen_in_time import FrozenInTime

        # a loaded checkpoint with TRAINED divided space-time attention
        # (nonzero temporal output projection — upstream zero-inits it, so
        # nonzero means it was actually trained) runs the faithful divided
        # path; everything else — fresh init, or checkpoints whose
        # temporal path was never trained (our joint models keep the
        # subtree at its zero identity-init) — keeps the TPU-first joint
        # formulation.  Mere PRESENCE of temporal_attn is not a signal:
        # every video tree carries it for structure parity.
        attention = ("divided" if loaded and _temporal_attn_trained(params)
                     else "joint")
        # carry the selection in the CONFIG so functional consumers that
        # only see (params, cfg) — clip_model.encode_image's video branch,
        # DebiasCLIP wrappers — run the same formulation as the bundle
        import dataclasses as _dc

        cfg = _dc.replace(cfg, vision=_dc.replace(cfg.vision,
                                                  video_attention=attention))
        model: ClipLike = FrozenInTime(params=params, cfg=cfg,
                                       attention=attention)
    else:
        model = CLIP(params=params, cfg=cfg)

    preprocess: Preprocess = build_preprocess(
        cfg.vision.image_size, mean=cfg.vision.image_mean,
        std=cfg.vision.image_std)

    try:
        from ..text.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(context_length=cfg.text.context_length)
    except FileNotFoundError:
        tokenizer = None  # real vocab asset absent; caller may supply one

    return model, preprocess, tokenizer, alias
