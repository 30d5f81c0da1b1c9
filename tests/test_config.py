import pickle

import pytest

from debias_vision_lang_tpu.core.config import (
    DebiasConfig,
    Dotdict,
    debias_config_from_dotdict,
)
from debias_vision_lang_tpu.core.registry import (
    CLIP_ARCHS,
    VALID_CLIP_MODELS,
    VALID_MODELS,
    alias_name,
    resolve_arch,
)


class TestDotdict:
    def test_attr_access(self):
        d = Dotdict({"a": 1})
        assert d.a == 1
        d.b = 2
        assert d["b"] == 2

    def test_missing_attr_is_none(self):
        # reference behavior: dict.get → None (debias_clip/__init__.py:5-6)
        assert Dotdict().missing is None

    def test_delattr(self):
        d = Dotdict({"a": 1})
        del d.a
        assert "a" not in d

    def test_pickle_roundtrip(self):
        d = Dotdict({"a": 1, "b": [2, 3]})
        d2 = pickle.loads(pickle.dumps(d))
        assert d2 == d and isinstance(d2, Dotdict)


class TestRegistry:
    def test_reference_model_list(self):
        # exact parity with reference VALID_CLIP_MODELS (model/model.py:85-92)
        assert VALID_CLIP_MODELS == [
            "openai/CLIP/RN50",
            "openai/CLIP/RN101",
            "openai/CLIP/RN50x4",
            "openai/CLIP/ViT-B/16",
            "openai/CLIP/ViT-B/32",
            "openai/CLIP/ViT-L/14",
        ] or set(VALID_CLIP_MODELS) == {
            f"openai/CLIP/{a}" for a in ("RN50", "RN101", "RN50x4",
                                         "ViT-B/16", "ViT-B/32", "ViT-L/14")
        }

    def test_alias_scheme(self):
        # reference: model/model.py:114
        assert alias_name("openai/CLIP/ViT-B/16") == "oai-clip-vit-b-16"
        assert alias_name("openai/CLIP/RN50") == "oai-clip-rn50"

    def test_resolve_arch(self):
        cfg = resolve_arch("openai/CLIP/ViT-B/16")
        assert cfg.vision.patch_size == 16
        assert cfg.vision.seq_len == 197
        assert cfg.text.context_length == 77
        assert cfg.embed_dim == 512

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            resolve_arch("nonexistent/model")

    def test_vit_l_14(self):
        cfg = CLIP_ARCHS["ViT-L/14"]
        assert cfg.vision.width == 1024 and cfg.vision.layers == 24
        assert cfg.embed_dim == 768

    def test_rn50x4(self):
        cfg = CLIP_ARCHS["RN50x4"]
        assert cfg.vision.image_size == 288 and cfg.embed_dim == 640

    def test_slip_and_fit_registered(self):
        assert any(m.startswith("facebookresearch/SLIP/") for m in VALID_MODELS)
        assert any(m.startswith("m-bain/frozen-in-time/") for m in VALID_MODELS)


class TestDebiasConfig:
    def test_from_uppercase_dict(self):
        # reference convention: model/model.py:138-140
        cfg = debias_config_from_dotdict(
            {"NUM_DEBIAS_TOKENS": 3, "DEBIAS_POS": "add", "UNKNOWN_KEY": 42}
        )
        assert cfg.num_debias_tokens == 3
        assert cfg.debias_pos == "add"

    def test_invalid_pos_raises(self):
        with pytest.raises(NotImplementedError):
            DebiasConfig(debias_pos="bogus")

    def test_defaults_match_reference(self):
        # reference defaults: model/model.py:144-146
        cfg = DebiasConfig()
        assert cfg.max_tokens == 77
        assert cfg.freeze_proj is True
        assert cfg.debias_token_init == "zeros"
        assert cfg.debias_pos == "prepend"
        assert cfg.n_train_vid_layers == 0 and cfg.n_train_text_layers == 0
