"""debias_vision_lang_tpu — TPU-native framework with the capabilities of
oxai/debias-vision-lang ("A Prompt Array Keeps the Bias Away", AACL 2022).

Public surface mirrors the reference package ``debias_clip``
(reference: debias_clip/__init__.py — note the reference's own top-level
import is broken as shipped; see SURVEY.md §1) with proper relative imports:

    import debias_vision_lang_tpu as debias_clip
    model, preprocess = debias_clip.load("ViT-B/16-gender")
    results = debias_clip.measure_bias(model, preprocess, tokenizer, "gender")
"""

__version__ = "1.0.0"

from .core import (  # noqa: F401
    AdversaryConfig,
    CLIPConfig,
    DebiasConfig,
    Dotdict,
    EvalConfig,
    TextConfig,
    TrainConfig,
    VisionConfig,
    DATA_PATH,
    FAIRFACE_DATA_PATH,
    PROMPT_DATA_PATH,
    UTKFACE_DATA_PATH,
    VALID_CLIP_MODELS,
    VALID_MODELS,
    alias_name,
    resolve_arch,
)

# Lazy attribute access for heavy submodules so `import debias_vision_lang_tpu`
# stays light and works before optional assets (BPE vocab) exist.
_LAZY = {
    "measure_bias": ("debias_vision_lang_tpu.eval.measure", "measure_bias"),
    "eval_ranking": ("debias_vision_lang_tpu.eval.measure", "eval_ranking"),
    "gen_prompts": ("debias_vision_lang_tpu.eval.measure", "gen_prompts"),
    "load": ("debias_vision_lang_tpu.hub.hub", "load"),
    "available_models": ("debias_vision_lang_tpu.hub.hub", "available_models"),
    "DebiasCLIP": ("debias_vision_lang_tpu.models.debias", "DebiasCLIP"),
    "Adversary": ("debias_vision_lang_tpu.models.adversary", "Adversary"),
    "model_loader": ("debias_vision_lang_tpu.models.loader", "model_loader"),
    "ClipLike": ("debias_vision_lang_tpu.models.loader", "ClipLike"),
    "tokenize": ("debias_vision_lang_tpu.text.tokenizer", "tokenize"),
    "load_tokenizer": ("debias_vision_lang_tpu.text.tokenizer", "load_tokenizer"),
    "FairFace": ("debias_vision_lang_tpu.data.datasets", "FairFace"),
    "UTKFace": ("debias_vision_lang_tpu.data.datasets", "UTKFace"),
    "IATDataset": ("debias_vision_lang_tpu.data.datasets", "IATDataset"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
