"""Pretrained hub: ``load("ViT-B/16-gender")`` → drop-in debiased model.

Reference behavior (debias_clip/model/clip.py:45-82): look the name up in the
registry, download the checkpoint — which is ONLY the [P, width] prompt-
embedding tensor — build the base CLIP, wrap in DebiasCLIP, swap the prompt
weights in, return ``(model, preprocess)``.

Differences (deliberate): verified TLS instead of the reference's global SSL
bypass (model/clip.py:9-10); checkpoints also accepted as local paths or
``.npz``; the wrapped model is our functional DebiasCLIP.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import DebiasConfig
from ..data.download import PRETRAINED_PROMPTS, fetch_pretrained_prompts
from ..models.debias import DebiasCLIP
from ..models.loader import model_loader
from ..vision.preprocess import Preprocess

_MODELS = PRETRAINED_PROMPTS  # name → {url, clip_arch, num_debias_tokens}


def available_models() -> List[str]:
    """Names of available pretrained debiased models (reference: model/clip.py:45-47)."""
    return list(_MODELS.keys())


def _load_prompt_embeddings(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        data = np.load(path)
        return np.asarray(data[list(data.files)[0]], np.float32)
    from ..models.convert import load_debias_prompt_pt

    return load_debias_prompt_pt(path)


def load(
    name: str,
    device=None,  # parity arg; placement is mesh/sharding-driven
    download_root: Optional[str] = None,
    pretrained_base: bool = True,
    base_weights: Optional[str] = None,
) -> Tuple[DebiasCLIP, Preprocess]:
    """Load a pretrained debiased CLIP.

    ``name``: a registry name (``available_models()``) or a path to a prompt-
    embedding checkpoint (then the base arch defaults to ViT-B/16, as the
    shipped checkpoint's — reference: model/clip.py:68-73).
    Returns ``(model, preprocess)``.
    """
    del device
    if name in _MODELS:
        entry = _MODELS[name]
        ckpt_path = fetch_pretrained_prompts(name, download_root)
    elif os.path.isfile(name):
        entry = _MODELS["ViT-B/16-gender"]
        ckpt_path = name
    else:
        raise RuntimeError(
            f"Model {name} not found; available models = {available_models()}"
        )

    prompt_emb = _load_prompt_embeddings(ckpt_path)

    # fail fast: shape-validate against the ARCH config before paying the
    # full base-model build (the reference builds the base first and reads
    # hidden_dim off it, model/clip.py:78-80 — same errors, raised earlier)
    from ..core.registry import resolve_arch

    hidden_dim = int(
        resolve_arch(f"openai/CLIP/{entry['clip_arch']}").text.width)
    if name in _MODELS:
        # registry entries pin their token count — a mismatch means a
        # corrupt/wrong download
        n_tokens = int(entry["num_debias_tokens"])
        if prompt_emb.shape != (n_tokens, hidden_dim):
            raise ValueError(
                f"checkpoint prompt shape {prompt_emb.shape} != expected "
                f"({n_tokens}, {hidden_dim})"
            )
    else:
        # local user-trained checkpoints carry their own P: infer it from
        # the tensor (the reference loader accepts any P the same way,
        # reference: model/clip.py:81); only the hidden dim must match
        if prompt_emb.ndim != 2 or prompt_emb.shape[1] != hidden_dim:
            raise ValueError(
                f"checkpoint prompt shape {prompt_emb.shape} incompatible "
                f"with the {entry['clip_arch']} text width {hidden_dim}"
            )
        n_tokens = int(prompt_emb.shape[0])

    base, preprocess, _tokenizer, _alias = model_loader(
        f"openai/CLIP/{entry['clip_arch']}", pretrained=pretrained_base,
        weights=base_weights)

    model = DebiasCLIP(
        clip_params=base.params,
        debias_tokens=jnp.asarray(prompt_emb, jnp.float32),
        clip_cfg=base.cfg,
        debias_cfg=DebiasConfig(num_debias_tokens=n_tokens, hidden_dim=hidden_dim),
    )
    return model, preprocess
