"""Checkpoint conversion: torch CLIP state_dicts ⇄ our param pytrees.

The reference inherits weights through ``clip.load`` / ``torch.load``
(reference: debias_clip/model/clip.py:75-81, model/model.py:112).  Here,
conversion is explicit and bidirectional:

  * ``from_openai_state_dict``  — OpenAI CLIP naming (the ``.pt`` files the
    ``clip`` package downloads, and what ``torch.jit``-free state_dicts use);
  * ``from_hf_state_dict``      — HuggingFace ``CLIPModel`` naming (rename +
    q/k/v concat into packed form, then the OpenAI path);
  * ``to_openai_state_dict``    — export for round-trips / torch consumers;
  * ``load_debias_prompt_pt``   — the hub checkpoint format: a bare
    ``[P, width]`` prompt-embedding tensor (reference: model/clip.py:75-76).

Layout rules (must mirror models/clip.py and models/layers.py):
  torch Linear weight [out, in] → kernel [in, out] (transpose);
  attn in_proj [3D, D] rows [q;k;v] → wqkv [D, 3D] cols [q|k|v];
  conv patch embed [O, 3, p, p] → [p, p, 3, O] flattened to [p·p·3, O]
  (ph, pw, c order — matches the reshape in clip.patch_embed);
  per-layer tensors stacked along a leading layer axis.

fp16 checkpoints are upcast to fp32, matching the reference's ``.float()``
(model/model.py:136,170).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from ..core.config import CLIPConfig


def _np(t) -> np.ndarray:
    """torch tensor / array → float32 numpy (fp16/bf16 upcast)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        # torch bf16 tensors cannot .numpy() directly — upcast torch-side
        if getattr(t, "dtype", None) is not None and "bfloat16" in str(t.dtype):
            t = t.float()
        t = t.numpy()
    t = np.asarray(t)
    if t.dtype == np.float16:
        t = t.astype(np.float32)
    return t


def _stack_resblocks(sd: Dict[str, np.ndarray], prefix: str, n_layers: int,
                     names: Dict[str, str]):
    """Per-layer transformer-block tensors → our stacked pytree.

    ``names`` maps our slots (ln1/qkv/out/ln2/fc1/fc2) to the upstream key
    stems; torch Linear weights are [out, in] and transpose to our [in, out].
    One implementation serves both the OpenAI and timm layouts so a stacking
    change cannot be applied to one and missed in the other."""

    def get(i, name):
        return _np(sd[f"{prefix}.{i}.{name}"])

    def col(stem, suffix=".weight", t=False):
        return np.stack([get(i, stem + suffix).T if t else get(i, stem + suffix)
                         for i in range(n_layers)])

    return {
        "ln_1": {"scale": col(names["ln1"]), "bias": col(names["ln1"], ".bias")},
        "attn": {
            "wqkv": col(names["qkv"], names.get("qkv_w", ".weight"), t=True),
            "bqkv": col(names["qkv"], names.get("qkv_b", ".bias")),
            "wo": col(names["out"], t=True),
            "bo": col(names["out"], ".bias"),
        },
        "ln_2": {"scale": col(names["ln2"]), "bias": col(names["ln2"], ".bias")},
        "mlp": {
            "w1": col(names["fc1"], t=True), "b1": col(names["fc1"], ".bias"),
            "w2": col(names["fc2"], t=True), "b2": col(names["fc2"], ".bias"),
        },
    }


def _stack_layers(sd: Dict[str, np.ndarray], prefix: str, n_layers: int):
    """OpenAI per-layer resblock tensors → our stacked pytree."""
    return _stack_resblocks(sd, prefix, n_layers, {
        "ln1": "ln_1", "qkv": "attn.in_proj", "qkv_w": "_weight",
        "qkv_b": "_bias", "out": "attn.out_proj", "ln2": "ln_2",
        "fc1": "mlp.c_fc", "fc2": "mlp.c_proj",
    })


def _count_layers(sd, pattern: str) -> int:
    rx = re.compile(pattern)
    idxs = {int(m.group(1)) for k in sd if (m := rx.match(k))}
    return max(idxs) + 1 if idxs else 0


def _bn(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _conv(sd, key) -> Dict[str, np.ndarray]:
    # torch [O, I, kh, kw] → HWIO
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}


def _vit_visual_from_openai(sd) -> Dict:
    conv = _np(sd["visual.conv1.weight"])  # [O, 3, p, p]
    width = conv.shape[0]
    kernel = conv.transpose(2, 3, 1, 0).reshape(-1, width)  # [p·p·3, O]
    n_layers = _count_layers(sd, r"visual\.transformer\.resblocks\.(\d+)\.ln_1\.weight")
    conv1 = {"kernel": kernel}
    if "visual.conv1.bias" in sd:
        # OpenAI conv1 is bias-free; to_openai_state_dict round-trips of
        # timm-style (SLIP) towers carry one
        conv1["bias"] = _np(sd["visual.conv1.bias"])
    out = {
        "conv1": conv1,
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "resblocks": _stack_layers(sd, "visual.transformer.resblocks", n_layers),
        "ln_post": {"scale": _np(sd["visual.ln_post.weight"]),
                    "bias": _np(sd["visual.ln_post.bias"])},
        "proj": _np(sd["visual.proj"]),
    }
    if "visual.ln_pre.weight" in sd:
        # absent on slip_vit trunks (no ln_pre — models/clip.py::_vit_trunk)
        out["ln_pre"] = {"scale": _np(sd["visual.ln_pre.weight"]),
                         "bias": _np(sd["visual.ln_pre.bias"])}
    return out


def _resnet_visual_from_openai(sd) -> Dict:
    p = {
        "conv1": _conv(sd, "visual.conv1.weight"), "bn1": _bn(sd, "visual.bn1"),
        "conv2": _conv(sd, "visual.conv2.weight"), "bn2": _bn(sd, "visual.bn2"),
        "conv3": _conv(sd, "visual.conv3.weight"), "bn3": _bn(sd, "visual.bn3"),
    }
    for stage in range(1, 5):
        blocks = []
        n_blocks = _count_layers(sd, rf"visual\.layer{stage}\.(\d+)\.conv1\.weight")
        for b in range(n_blocks):
            pre = f"visual.layer{stage}.{b}"
            block = {
                "conv1": _conv(sd, f"{pre}.conv1.weight"), "bn1": _bn(sd, f"{pre}.bn1"),
                "conv2": _conv(sd, f"{pre}.conv2.weight"), "bn2": _bn(sd, f"{pre}.bn2"),
                "conv3": _conv(sd, f"{pre}.conv3.weight"), "bn3": _bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _conv(sd, f"{pre}.downsample.0.weight"),
                    "bn": _bn(sd, f"{pre}.downsample.1"),
                }
            blocks.append(block)
        p[f"layer{stage}"] = blocks

    def lin(prefix):
        return {"kernel": _np(sd[f"{prefix}.weight"]).T,
                "bias": _np(sd[f"{prefix}.bias"])}

    p["attnpool"] = {
        "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
        "q_proj": lin("visual.attnpool.q_proj"),
        "k_proj": lin("visual.attnpool.k_proj"),
        "v_proj": lin("visual.attnpool.v_proj"),
        "c_proj": lin("visual.attnpool.c_proj"),
    }
    return p


def from_openai_state_dict(sd, cfg: Optional[CLIPConfig] = None) -> Dict:
    """OpenAI CLIP state_dict (torch tensors or arrays) → param pytree.

    ``cfg`` is optional — the architecture is inferred from tensor shapes.
    """
    import jax.numpy as jnp

    sd = dict(sd)
    # NB: both towers have visual.conv1.weight — the class embedding is the
    # ViT discriminator.
    if "visual.class_embedding" in sd:
        visual = _vit_visual_from_openai(sd)
    else:
        visual = _resnet_visual_from_openai(sd)
    n_text = _count_layers(sd, r"transformer\.resblocks\.(\d+)\.ln_1\.weight")
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "resblocks": _stack_layers(sd, "transformer.resblocks", n_text),
        "ln_final": {"scale": _np(sd["ln_final.weight"]),
                     "bias": _np(sd["ln_final.bias"])},
        "text_projection": _np(sd["text_projection"]),
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    import jax

    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# HuggingFace CLIPModel naming → OpenAI naming → ours
# ---------------------------------------------------------------------------


def hf_to_openai_state_dict(sd) -> Dict[str, np.ndarray]:
    """Rename a HF ``CLIPModel.state_dict()`` into OpenAI CLIP naming.

    HF keeps q/k/v as separate Linears; OpenAI packs them.  HF's
    ``text_projection``/``visual_projection`` are Linears [out, in] while
    OpenAI stores [in, out] matrices.
    """
    sd = {k: _np(v) for k, v in dict(sd).items()}
    out: Dict[str, np.ndarray] = {}

    def copy(dst, src):
        if src in sd:
            out[dst] = sd[src]

    copy("logit_scale", "logit_scale")
    out["text_projection"] = sd["text_projection.weight"].T
    out["visual.proj"] = sd["visual_projection.weight"].T
    copy("token_embedding.weight", "text_model.embeddings.token_embedding.weight")
    copy("positional_embedding", "text_model.embeddings.position_embedding.weight")
    copy("ln_final.weight", "text_model.final_layer_norm.weight")
    copy("ln_final.bias", "text_model.final_layer_norm.bias")

    copy("visual.class_embedding", "vision_model.embeddings.class_embedding")
    copy("visual.positional_embedding",
         "vision_model.embeddings.position_embedding.weight")
    copy("visual.conv1.weight", "vision_model.embeddings.patch_embedding.weight")
    # HF misspells pre-LN as "pre_layrnorm"
    for ours, hf in (("visual.ln_pre", "vision_model.pre_layrnorm"),
                     ("visual.ln_post", "vision_model.post_layernorm")):
        copy(f"{ours}.weight", f"{hf}.weight")
        copy(f"{ours}.bias", f"{hf}.bias")

    for tower, hf_tower in (("transformer", "text_model"),
                            ("visual.transformer", "vision_model")):
        n = _count_layers(
            sd, re.escape(hf_tower) + r"\.encoder\.layers\.(\d+)\.layer_norm1\.weight")
        for i in range(n):
            hf_pre = f"{hf_tower}.encoder.layers.{i}"
            oa_pre = f"{tower}.resblocks.{i}"
            out[f"{oa_pre}.ln_1.weight"] = sd[f"{hf_pre}.layer_norm1.weight"]
            out[f"{oa_pre}.ln_1.bias"] = sd[f"{hf_pre}.layer_norm1.bias"]
            out[f"{oa_pre}.ln_2.weight"] = sd[f"{hf_pre}.layer_norm2.weight"]
            out[f"{oa_pre}.ln_2.bias"] = sd[f"{hf_pre}.layer_norm2.bias"]
            out[f"{oa_pre}.attn.in_proj_weight"] = np.concatenate(
                [sd[f"{hf_pre}.self_attn.{p}_proj.weight"] for p in "qkv"], axis=0)
            out[f"{oa_pre}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{hf_pre}.self_attn.{p}_proj.bias"] for p in "qkv"], axis=0)
            out[f"{oa_pre}.attn.out_proj.weight"] = sd[f"{hf_pre}.self_attn.out_proj.weight"]
            out[f"{oa_pre}.attn.out_proj.bias"] = sd[f"{hf_pre}.self_attn.out_proj.bias"]
            out[f"{oa_pre}.mlp.c_fc.weight"] = sd[f"{hf_pre}.mlp.fc1.weight"]
            out[f"{oa_pre}.mlp.c_fc.bias"] = sd[f"{hf_pre}.mlp.fc1.bias"]
            out[f"{oa_pre}.mlp.c_proj.weight"] = sd[f"{hf_pre}.mlp.fc2.weight"]
            out[f"{oa_pre}.mlp.c_proj.bias"] = sd[f"{hf_pre}.mlp.fc2.bias"]
    return out


def from_hf_state_dict(sd, cfg: Optional[CLIPConfig] = None) -> Dict:
    return from_openai_state_dict(hf_to_openai_state_dict(sd), cfg)


def from_hf_model(hf_model, cfg: Optional[CLIPConfig] = None) -> Dict:
    return from_hf_state_dict(hf_model.state_dict(), cfg)


# ---------------------------------------------------------------------------
# Export (round-trips; distributing converted weights)
# ---------------------------------------------------------------------------


def to_openai_state_dict(params, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Our pytree → OpenAI-named flat dict (numpy; ViT vision only)."""
    out: Dict[str, np.ndarray] = {}
    v, t = params["visual"], params["text"]
    if cfg.vision.kind not in ("vit", "slip_vit"):
        raise NotImplementedError("export currently supports ViT towers")
    p = cfg.vision.patch_size
    width = cfg.vision.width
    out["visual.conv1.weight"] = (
        np.asarray(v["conv1"]["kernel"]).reshape(p, p, 3, width).transpose(3, 2, 0, 1))
    out["visual.class_embedding"] = np.asarray(v["class_embedding"])
    out["visual.positional_embedding"] = np.asarray(v["positional_embedding"])
    if "bias" in v["conv1"]:
        # timm-style (SLIP) patch embed carries a bias; OpenAI's conv1 none
        out["visual.conv1.bias"] = np.asarray(v["conv1"]["bias"])
    if "ln_pre" in v:
        # slip_vit trunks have no ln_pre (models/clip.py::_vit_trunk)
        out["visual.ln_pre.weight"] = np.asarray(v["ln_pre"]["scale"])
        out["visual.ln_pre.bias"] = np.asarray(v["ln_pre"]["bias"])
    out["visual.ln_post.weight"] = np.asarray(v["ln_post"]["scale"])
    out["visual.ln_post.bias"] = np.asarray(v["ln_post"]["bias"])
    out["visual.proj"] = np.asarray(v["proj"])
    out["token_embedding.weight"] = np.asarray(t["token_embedding"])
    out["positional_embedding"] = np.asarray(t["positional_embedding"])
    out["ln_final.weight"] = np.asarray(t["ln_final"]["scale"])
    out["ln_final.bias"] = np.asarray(t["ln_final"]["bias"])
    out["text_projection"] = np.asarray(t["text_projection"])
    out["logit_scale"] = np.asarray(params["logit_scale"])

    for tower_key, prefix in (("visual", "visual.transformer.resblocks"),
                              ("text", "transformer.resblocks")):
        rb = params[tower_key]["resblocks"]
        n = rb["ln_1"]["scale"].shape[0]
        for i in range(n):
            out[f"{prefix}.{i}.ln_1.weight"] = np.asarray(rb["ln_1"]["scale"][i])
            out[f"{prefix}.{i}.ln_1.bias"] = np.asarray(rb["ln_1"]["bias"][i])
            out[f"{prefix}.{i}.ln_2.weight"] = np.asarray(rb["ln_2"]["scale"][i])
            out[f"{prefix}.{i}.ln_2.bias"] = np.asarray(rb["ln_2"]["bias"][i])
            out[f"{prefix}.{i}.attn.in_proj_weight"] = np.asarray(rb["attn"]["wqkv"][i]).T
            out[f"{prefix}.{i}.attn.in_proj_bias"] = np.asarray(rb["attn"]["bqkv"][i])
            out[f"{prefix}.{i}.attn.out_proj.weight"] = np.asarray(rb["attn"]["wo"][i]).T
            out[f"{prefix}.{i}.attn.out_proj.bias"] = np.asarray(rb["attn"]["bo"][i])
            out[f"{prefix}.{i}.mlp.c_fc.weight"] = np.asarray(rb["mlp"]["w1"][i]).T
            out[f"{prefix}.{i}.mlp.c_fc.bias"] = np.asarray(rb["mlp"]["b1"][i])
            out[f"{prefix}.{i}.mlp.c_proj.weight"] = np.asarray(rb["mlp"]["w2"][i]).T
            out[f"{prefix}.{i}.mlp.c_proj.bias"] = np.asarray(rb["mlp"]["b2"][i])
    return out


def load_debias_prompt_pt(path: str) -> np.ndarray:
    """Load the hub checkpoint format: a bare [P, width] tensor saved with
    torch.save (reference: model/clip.py:75-76).  Uses torch-CPU."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    return _np(t)


def save_debias_prompt_pt(prompt_embeddings, path: str) -> None:
    """Export prompt embeddings in the reference's .pt format (drop-in
    compatible with the reference hub loader)."""
    import torch

    arr = np.ascontiguousarray(np.asarray(prompt_embeddings, np.float32)).copy()
    torch.save(torch.from_numpy(arr), path)


# ---------------------------------------------------------------------------
# facebookresearch/SLIP checkpoint naming → ours
# ---------------------------------------------------------------------------


def _timm_blocks(sd: Dict[str, np.ndarray], prefix: str, n_layers: int):
    """timm VisionTransformer per-block tensors → our stacked resblocks.

    timm naming: norm1 / attn.qkv / attn.proj / norm2 / mlp.fc1 / mlp.fc2
    (vs OpenAI's ln_1 / attn.in_proj / attn.out_proj / ln_2 / mlp.c_fc /
    mlp.c_proj — same math, different labels)."""
    return _stack_resblocks(sd, prefix, n_layers, {
        "ln1": "norm1", "qkv": "attn.qkv", "out": "attn.proj",
        "ln2": "norm2", "fc1": "mlp.fc1", "fc2": "mlp.fc2",
    })


def _timm_patch_embed(sd, key_prefix: str) -> Dict[str, np.ndarray]:
    """timm patch conv [D, 3, p, p] (+bias) → flattened matmul kernel in our
    (ph, pw, c) patch-pixel order."""
    conv = _np(sd[f"{key_prefix}.weight"])
    width = conv.shape[0]
    out = {"kernel": conv.transpose(2, 3, 1, 0).reshape(-1, width)}
    if f"{key_prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{key_prefix}.bias"])
    return out


def strip_prefix(sd, prefix: str = "module.") -> Dict[str, np.ndarray]:
    """Drop a DDP/wrapper prefix from every key that carries it."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


def from_slip_state_dict(sd, cfg: Optional[CLIPConfig] = None) -> Dict:
    """facebookresearch/SLIP checkpoint → param pytree.

    Accepts either a raw ``state_dict`` or the published checkpoint dict
    (``{"state_dict": ...}`` with DDP ``module.`` prefixes).  Mapping:

      vision (timm ViT): visual.cls_token → class_embedding,
        visual.pos_embed → positional_embedding, visual.patch_embed.proj →
        conv1 (WITH bias), visual.blocks.N → resblocks, visual.norm →
        ln_post, image_projection → proj.  No ln_pre (slip_vit kind skips
        it); exact-GELU activation handled by the tower.
      text (SLIP reuses CLIP's text transformer verbatim): same keys as
        from_openai_state_dict.

    SSL-head tensors (image_mlp/text_mlp/predictor, SimCLR/BYOL machinery)
    are ignored — they don't participate in zero-shot inference.

    Reference stub being replaced: debias_clip/model/model.py:115-118 raises
    NotImplementedError for the SLIP family.
    """
    import jax
    import jax.numpy as jnp

    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    sd = strip_prefix(dict(sd))

    n_vis = _count_layers(sd, r"visual\.blocks\.(\d+)\.norm1\.weight")
    visual = {
        "conv1": _timm_patch_embed(sd, "visual.patch_embed.proj"),
        "class_embedding": _np(sd["visual.cls_token"]).reshape(-1),
        "positional_embedding": _np(sd["visual.pos_embed"])[0],
        "resblocks": _timm_blocks(sd, "visual.blocks", n_vis),
        "ln_post": {"scale": _np(sd["visual.norm.weight"]),
                    "bias": _np(sd["visual.norm.bias"])},
        "proj": _np(sd["image_projection"]),
    }
    n_text = _count_layers(sd, r"transformer\.resblocks\.(\d+)\.ln_1\.weight")
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "resblocks": _stack_layers(sd, "transformer.resblocks", n_text),
        "ln_final": {"scale": _np(sd["ln_final.weight"]),
                     "bias": _np(sd["ln_final.bias"])},
        "text_projection": _np(sd["text_projection"]),
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# m-bain/frozen-in-time checkpoint naming → ours
# ---------------------------------------------------------------------------


def from_fit_state_dict(sd, text_params=None) -> Dict:
    """m-bain/frozen-in-time checkpoint → param pytree (video tower).

    Accepts the published checkpoint dict (``{"state_dict": ...}`` with
    ``module.`` prefixes) or a raw state_dict.  Mapping (SpaceTimeTransformer,
    upstream video_transformer.py):

      video_model.cls_token/pos_embed → class_embedding/positional_embedding
      video_model.temporal_embed [1,T,D] → temporal_embedding [T,D]
      video_model.patch_embed.proj → conv1 (with bias)
      video_model.blocks.N.{norm1,attn}        → spatial resblocks
      video_model.blocks.N.{norm3,timeattn}    → temporal_attn (ln_t/attn);
        upstream zero-inits timeattn.proj so the temporal path starts as
        identity — preserved verbatim by the copy
      video_model.norm → ln_post
      vid_proj.0 (Linear WITH bias) → proj {"kernel","bias"}

    DOCUMENTED DIVERGENCE: the upstream text tower is DistilBERT
    (text_model.* / txt_proj.*) and is NOT converted — this framework keeps
    the CLIP text transformer for tokenizer + prompt-injection compatibility
    (see models/frozen_in_time.py module docstring).  Pass ``text_params``
    (a CLIP text pytree) or the caller falls back to random init.

    No ln_pre in the upstream tower: a zero LayerNorm-free passthrough is
    emitted (scale=1, bias=0) because our joint-attention path applies
    ln_pre.  Divided-attention mode consumes temporal_attn directly.
    """
    import jax
    import jax.numpy as jnp

    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    sd = strip_prefix(dict(sd))

    n_layers = _count_layers(sd, r"video_model\.blocks\.(\d+)\.norm1\.weight")
    width = _np(sd["video_model.cls_token"]).reshape(-1).shape[0]

    def stk(name):
        return np.stack([_np(sd[f"video_model.blocks.{i}.{name}"])
                         for i in range(n_layers)])

    visual = {
        "conv1": _timm_patch_embed(sd, "video_model.patch_embed.proj"),
        "class_embedding": _np(sd["video_model.cls_token"]).reshape(-1),
        "positional_embedding": _np(sd["video_model.pos_embed"])[0],
        "temporal_embedding": _np(sd["video_model.temporal_embed"])[0],
        "ln_pre": {"scale": np.ones(width, np.float32),
                   "bias": np.zeros(width, np.float32)},
        "resblocks": _timm_blocks(sd, "video_model.blocks", n_layers),
        "temporal_attn": {
            "ln_t": {"scale": stk("norm3.weight"), "bias": stk("norm3.bias")},
            "attn": {
                "wqkv": np.stack([_np(sd[f"video_model.blocks.{i}.timeattn.qkv.weight"]).T
                                  for i in range(n_layers)]),
                "bqkv": stk("timeattn.qkv.bias"),
                "wo": np.stack([_np(sd[f"video_model.blocks.{i}.timeattn.proj.weight"]).T
                                for i in range(n_layers)]),
                "bo": stk("timeattn.proj.bias"),
            },
        },
        "ln_post": {"scale": _np(sd["video_model.norm.weight"]),
                    "bias": _np(sd["video_model.norm.bias"])},
        "proj": {"kernel": _np(sd["vid_proj.0.weight"]).T,
                 "bias": _np(sd["vid_proj.0.bias"])},
    }
    params = {"visual": visual,
              "logit_scale": np.asarray(np.log(1.0 / 0.07), np.float32)}
    if text_params is not None:
        params["text"] = text_params
    return jax.tree.map(jnp.asarray, params)
