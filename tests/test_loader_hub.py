import numpy as np
import pytest

from debias_vision_lang_tpu.core.config import AdversaryConfig
from debias_vision_lang_tpu.models.adversary import Adversary
from debias_vision_lang_tpu.models.loader import CLIP, ClipLike, model_loader


class TestModelLoader:
    def test_invalid_name_raises(self):
        with pytest.raises(NotImplementedError):
            model_loader("openai/CLIP/ViT-H/14")

    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_loads_vit_random(self):
        model, preprocess, tokenizer, alias = model_loader(
            "openai/CLIP/ViT-B/32", pretrained=False)
        assert alias == "oai-clip-vit-b-32"
        assert isinstance(model, CLIP)
        assert isinstance(model, ClipLike)  # structural protocol
        assert preprocess.n_px == 224
        img = np.zeros((1, 224, 224, 3), np.float32)
        assert model.encode_image(img, use_pallas=False).shape == (1, 512)

    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_device_and_jit_args_inert(self):
        # reference-parity signature: (model_name, device, jit)
        model, *_ = model_loader("openai/CLIP/ViT-B/32", device="cuda", jit=True,
                                 pretrained=False)
        assert model is not None

    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_slip_loads(self):
        model, _, _, alias = model_loader("facebookresearch/SLIP/ViT-B/16",
                                          pretrained=False)
        assert alias == "fb-slip-vit-b-16"
        img = np.zeros((1, 224, 224, 3), np.float32)
        assert model.encode_image(img, use_pallas=False).shape == (1, 512)


class TestWeightResolution:
    @pytest.mark.slow  # full-size SLIP build, ~17s on the 1-core gate host
    def test_weights_dir_covers_all_families(self, tmp_path, monkeypatch):
        """$DEBIAS_VLT_WEIGHTS_DIR lookup must fire for SLIP/FiT names too,
        not only openai/CLIP/* — an alias-named file silently ignored means
        bias numbers computed on RANDOM weights."""
        from debias_vision_lang_tpu.models import loader as loader_mod
        from debias_vision_lang_tpu.models.clip import init_clip_params

        name = "facebookresearch/SLIP/ViT-B/16"
        cand = tmp_path / "fb-slip-vit-b-16.npz"
        cand.write_bytes(b"placeholder")
        seen = {}

        def fake_load(path, cfg):
            import jax

            seen["path"] = path
            return init_clip_params(jax.random.key(0), cfg)

        monkeypatch.setattr(loader_mod, "_load_weights_file", fake_load)
        monkeypatch.setenv("DEBIAS_VLT_WEIGHTS_DIR", str(tmp_path))
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no RANDOM-fallback warning
            model_loader(name, pretrained=True)
        assert seen["path"] == str(cand)

    def test_explicit_weights_honored_without_pretrained(self, monkeypatch):
        """weights=<path> must load even with pretrained=False — silently
        discarding an explicit checkpoint argument is a trap."""
        from debias_vision_lang_tpu.models import loader as loader_mod
        from debias_vision_lang_tpu.models.clip import init_clip_params

        seen = {}

        def fake_load(path, cfg):
            import jax

            seen["path"] = path
            return init_clip_params(jax.random.key(0), cfg)

        monkeypatch.setattr(loader_mod, "_load_weights_file", fake_load)
        model_loader("openai/CLIP/ViT-B/16", pretrained=False,
                     weights="/some/ckpt.npz")
        assert seen["path"] == "/some/ckpt.npz"

    @pytest.mark.slow  # three full-size FiT builds, ~35s on the gate host
    def test_fit_checkpoint_selects_divided_attention(self, monkeypatch):
        """A loaded checkpoint with TRAINED temporal attention (nonzero
        output projection, as every real upstream FiT checkpoint has) must
        run the divided path — the joint path would ignore those weights.
        A zero temporal projection (fresh init, or a joint-trained model
        whose temporal subtree only exists for structure parity) stays on
        the TPU-first joint formulation."""
        import jax
        import jax.numpy as jnp

        from debias_vision_lang_tpu.models import loader as loader_mod
        from debias_vision_lang_tpu.models.frozen_in_time import (
            init_fit_params)

        name = "m-bain/frozen-in-time/base"

        def trained_ckpt(path, c):
            p = init_fit_params(jax.random.key(0), c)
            wo = p["visual"]["temporal_attn"]["attn"]["wo"]
            p["visual"]["temporal_attn"]["attn"]["wo"] = (
                0.01 * jax.random.normal(jax.random.key(5), wo.shape))
            return p

        monkeypatch.setattr(loader_mod, "_load_weights_file", trained_ckpt)
        loaded, *_ = model_loader(name, weights="fit.pt")
        assert loaded.attention == "divided"

        # zero temporal projection (identity-init) → joint, even when loaded
        monkeypatch.setattr(
            loader_mod, "_load_weights_file",
            lambda path, c: init_fit_params(jax.random.key(0), c))
        zero, *_ = model_loader(name, weights="fit.pt")
        assert zero.attention == "joint"

        fresh, *_ = model_loader(name, pretrained=False)
        assert fresh.attention == "joint"


class TestAdversary:
    def test_from_cfg_reference_keys(self):
        adv = Adversary.from_cfg({
            "ADV_N_INPUT": 10, "ADV_N_OUTPUT": 1, "ADV_HIDDEN_SIZE": 8,
            "ADV_DEVICE": "cuda",  # inert parity key
        })
        assert adv.cfg == AdversaryConfig(n_input=10, n_output=1, hidden_size=8)

    def test_sigmoid_output_range(self, rng):
        adv = Adversary.from_cfg({"ADV_N_INPUT": 5, "ADV_N_OUTPUT": 1,
                                  "ADV_HIDDEN_SIZE": 4})
        x = rng.normal(size=(7, 5)).astype(np.float32)
        out = np.asarray(adv(x))
        assert out.shape == (7, 1)
        assert ((out > 0) & (out < 1)).all()

    def test_logits_match_sigmoid(self, rng):
        adv = Adversary.from_cfg({"ADV_N_INPUT": 5, "ADV_N_OUTPUT": 2,
                                  "ADV_HIDDEN_SIZE": 4})
        x = rng.normal(size=(3, 5)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(adv(x)), 1 / (1 + np.exp(-np.asarray(adv.logits(x)))),
            atol=1e-6)

    def test_default_output_binary(self):
        adv = Adversary.from_cfg({"ADV_N_INPUT": 319, "ADV_HIDDEN_SIZE": 32})
        assert adv.cfg.n_output == 1  # reference default (model/model.py:348)


class TestHub:
    def test_available_models(self):
        from debias_vision_lang_tpu.hub import available_models

        assert available_models() == ["ViT-B/16-gender"]

    def test_load_from_local_checkpoint(self, tmp_path):
        """Local .pt path → DebiasCLIP with those prompt embeddings swapped in
        (the reference's os.path.isfile branch, model/clip.py:69-70)."""
        from debias_vision_lang_tpu.hub import load
        from debias_vision_lang_tpu.models.convert import save_debias_prompt_pt

        emb = np.random.default_rng(0).normal(size=(2, 512)).astype(np.float32)
        path = str(tmp_path / "prompts.pt")
        save_debias_prompt_pt(emb, path)
        model, preprocess = load(path, pretrained_base=False)
        np.testing.assert_allclose(np.asarray(model.debias_tokens), emb)
        assert model.debias_cfg.num_debias_tokens == 2
        assert preprocess.n_px == 224

    def test_load_unknown_name_raises(self):
        from debias_vision_lang_tpu.hub import load

        with pytest.raises(RuntimeError, match="available models"):
            load("nonexistent-model", pretrained_base=False)

    def test_shape_mismatch_raises(self, tmp_path):
        from debias_vision_lang_tpu.hub import load
        from debias_vision_lang_tpu.models.convert import save_debias_prompt_pt

        path = str(tmp_path / "bad.pt")
        save_debias_prompt_pt(np.zeros((3, 99), np.float32), path)
        with pytest.raises(ValueError, match="prompt shape"):
            load(path, pretrained_base=False)

    def test_local_checkpoint_infers_prompt_count(self, tmp_path):
        """User-trained local checkpoints carry their own P — the loader
        infers it from the tensor instead of pinning the registry count
        (reference accepts any P the same way, model/clip.py:81)."""
        from debias_vision_lang_tpu.hub import load
        from debias_vision_lang_tpu.models.convert import save_debias_prompt_pt

        emb = np.random.default_rng(1).normal(size=(7, 512)).astype(np.float32)
        path = str(tmp_path / "p7.pt")
        save_debias_prompt_pt(emb, path)
        model, _ = load(path, pretrained_base=False)
        assert model.debias_cfg.num_debias_tokens == 7
        np.testing.assert_allclose(np.asarray(model.debias_tokens), emb)

    def test_local_checkpoint_wrong_rank_raises(self, tmp_path):
        """0-d/1-d prompt tensors must fail with the shape ValueError, not an
        IndexError from reading shape[0] before validation."""
        from debias_vision_lang_tpu.hub import load
        from debias_vision_lang_tpu.models.convert import save_debias_prompt_pt

        path = str(tmp_path / "rank1.pt")
        save_debias_prompt_pt(np.zeros((512,), np.float32), path)
        with pytest.raises(ValueError, match="prompt shape"):
            load(path, pretrained_base=False)
