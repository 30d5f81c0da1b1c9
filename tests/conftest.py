"""Test harness config: 8 virtual CPU devices for multi-chip sharding tests.

Must set env before jax initializes (hence module top, before any jax import).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some environments (e.g. the axon TPU shim) force jax_platforms at import
# time via sitecustomize; override back to CPU before any backend initializes
# so tests run on the 8-device virtual CPU mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the suite: the gate's wall time is
# dominated by recompiling the same tiny-model graphs every run.  The cache
# dir is machine-local, so the "XLA:CPU entries are machine-specific"
# concern (core/cache.py — why the PRODUCTION cache stays TPU-only) does
# not apply.  Runtime config.update, not env: the axon sitecustomize
# imports jax before this file runs, so env-var configs are already read.
# Measured: RN tests 26s cold -> 18s warm; fast gate 6:43 -> see ROADMAP.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/debias_vision_lang_tpu/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_clip():
    """A tiny ViT CLIP config + params for fast tests."""
    import jax

    from debias_vision_lang_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from debias_vision_lang_tpu.models.clip import init_clip_params

    cfg = CLIPConfig(
        name="tiny",
        vision=VisionConfig(kind="vit", image_size=32, patch_size=8, width=64,
                            layers=2, heads=2, embed_dim=32),
        text=TextConfig(vocab_size=512, context_length=16, width=32, layers=2,
                        heads=2, embed_dim=32),
    )
    params = init_clip_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.fixture(scope="session")
def toy_tokenizer():
    """Small synthetic BPE vocabulary exercising the real algorithm."""
    from debias_vision_lang_tpu.text.bpe import bytes_to_unicode
    from debias_vision_lang_tpu.text.tokenizer import ClipTokenizer

    # merges over the byte alphabet; enough to tokenize simple ASCII words.
    # NB: "</w>" never appears as a standalone symbol (words end with
    # char+"</w>"), matching the real CLIP merges file's invariants.
    merges = [
        ("t", "h"), ("th", "e</w>"), ("o", "f</w>"),
        ("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"),
        ("p", "h"), ("ph", "o"), ("pho", "t"), ("phot", "o</w>"),
        ("i", "s</w>"), ("t", "o</w>"), ("a", "n"), ("an", "d</w>"),
    ]
    return ClipTokenizer(merges, context_length=16)
