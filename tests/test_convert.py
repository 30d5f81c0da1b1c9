"""Weight-converter parity tests against HuggingFace CLIPModel (an
independent implementation, constructed offline with random weights).
This validates our model math end-to-end: patch embed, pre-LN blocks,
QuickGELU, causal text tower, EOT pooling, projections, logit scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from debias_vision_lang_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
from debias_vision_lang_tpu.models import clip as clip_model
from debias_vision_lang_tpu.models.convert import (
    from_hf_model,
    from_openai_state_dict,
    load_debias_prompt_pt,
    save_debias_prompt_pt,
    to_openai_state_dict,
)

VOCAB = 99
CTX = 16


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPConfig as HFConfig, CLIPModel

    hf_cfg = HFConfig(
        text_config={
            "vocab_size": VOCAB, "hidden_size": 64, "intermediate_size": 256,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": CTX, "hidden_act": "quick_gelu",
            "eos_token_id": VOCAB - 1,
        },
        vision_config={
            "hidden_size": 64, "intermediate_size": 256, "num_hidden_layers": 2,
            "num_attention_heads": 2, "image_size": 32, "patch_size": 8,
            "hidden_act": "quick_gelu",
        },
        projection_dim=32,
    )
    torch.manual_seed(0)
    hf = CLIPModel(hf_cfg).eval()

    ours_cfg = CLIPConfig(
        name="hf-tiny",
        vision=VisionConfig(kind="vit", image_size=32, patch_size=8, width=64,
                            layers=2, heads=2, embed_dim=32),
        text=TextConfig(vocab_size=VOCAB, context_length=CTX, width=64,
                        layers=2, heads=2, embed_dim=32),
    )
    params = from_hf_model(hf, ours_cfg)
    return hf, ours_cfg, params


def _tokens(batch=3):
    rng = np.random.default_rng(0)
    t = np.zeros((batch, CTX), np.int64)
    t[:, 0] = VOCAB - 2
    for i, l in enumerate([4, 7, CTX - 2][:batch]):
        t[i, 1:l] = rng.integers(1, VOCAB - 2, l - 1)
        t[i, l] = VOCAB - 1
    return t


class TestHFParity:
    def test_image_features(self, hf_pair):
        hf, cfg, params = hf_pair
        rng = np.random.default_rng(1)
        imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf.get_image_features(
                pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
            ).numpy()
        ours = np.asarray(
            clip_model.encode_image(params, jnp.asarray(imgs), cfg, use_pallas=False))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_text_features(self, hf_pair):
        hf, cfg, params = hf_pair
        t = _tokens()
        with torch.no_grad():
            ref = hf.get_text_features(
                input_ids=torch.from_numpy(t),
                attention_mask=torch.ones_like(torch.from_numpy(t)),
            ).numpy()
        ours = np.asarray(
            clip_model.encode_text(params, jnp.asarray(t.astype(np.int32)), cfg,
                                   use_pallas=False))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_logit_scale(self, hf_pair):
        hf, _, params = hf_pair
        assert float(params["logit_scale"]) == pytest.approx(
            float(hf.logit_scale.detach()), abs=1e-6)

    def test_full_logits(self, hf_pair):
        hf, cfg, params = hf_pair
        rng = np.random.default_rng(2)
        imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        t = _tokens()
        with torch.no_grad():
            out = hf(
                input_ids=torch.from_numpy(t),
                pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                attention_mask=torch.ones_like(torch.from_numpy(t)),
            )
            ref = out.logits_per_image.numpy()
        ours, _ = clip_model.forward(params, jnp.asarray(imgs),
                                     jnp.asarray(t.astype(np.int32)), cfg,
                                     use_pallas=False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-3, rtol=1e-3)


class TestRoundTrip:
    def test_openai_roundtrip(self, tiny_clip):
        cfg, params = tiny_clip
        sd = to_openai_state_dict(params, cfg)
        back = from_openai_state_dict(sd, cfg)

        flat1 = jax.tree.leaves(params)
        flat2 = jax.tree.leaves(back)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_fp16_upcast(self, tiny_clip):
        cfg, params = tiny_clip
        sd = to_openai_state_dict(params, cfg)
        sd16 = {k: v.astype(np.float16) for k, v in sd.items()}
        back = from_openai_state_dict(sd16, cfg)
        for leaf in jax.tree.leaves(back):
            assert leaf.dtype == jnp.float32


class TestResNetConverter:
    def test_synthetic_rn_state_dict(self):
        """RN converter: build a state_dict from our own randomly-initialized
        RN params exported shape-for-shape in OpenAI naming, reload, compare
        forward.  (Real-weight parity requires network; gated.)"""
        from debias_vision_lang_tpu.models.resnet import (
            encode_image_resnet, init_modified_resnet_params)

        cfg = VisionConfig(kind="resnet", image_size=64, width=16,
                           layers=(1, 1, 1, 1), heads=8, embed_dim=32)
        params = init_modified_resnet_params(jax.random.key(0), cfg)

        # export by hand into OpenAI RN naming
        sd = {}

        def put_conv(key, p):
            sd[key] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)

        def put_bn(prefix, p):
            sd[f"{prefix}.weight"] = np.asarray(p["scale"])
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])
            sd[f"{prefix}.running_mean"] = np.asarray(p["mean"])
            sd[f"{prefix}.running_var"] = np.asarray(p["var"])

        for i in (1, 2, 3):
            put_conv(f"visual.conv{i}.weight", params[f"conv{i}"])
            put_bn(f"visual.bn{i}", params[f"bn{i}"])
        for stage in range(1, 5):
            for b, block in enumerate(params[f"layer{stage}"]):
                pre = f"visual.layer{stage}.{b}"
                for i in (1, 2, 3):
                    put_conv(f"{pre}.conv{i}.weight", block[f"conv{i}"])
                    put_bn(f"{pre}.bn{i}", block[f"bn{i}"])
                if "downsample" in block:
                    put_conv(f"{pre}.downsample.0.weight", block["downsample"]["conv"])
                    put_bn(f"{pre}.downsample.1", block["downsample"]["bn"])
        ap = params["attnpool"]
        sd["visual.attnpool.positional_embedding"] = np.asarray(ap["positional_embedding"])
        for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
            sd[f"visual.attnpool.{name}.weight"] = np.asarray(ap[name]["kernel"]).T
            sd[f"visual.attnpool.{name}.bias"] = np.asarray(ap[name]["bias"])

        from debias_vision_lang_tpu.models.convert import _resnet_visual_from_openai

        back = _resnet_visual_from_openai(sd)
        imgs = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
        out1 = encode_image_resnet(params, imgs, cfg)
        out2 = encode_image_resnet(jax.tree.map(jnp.asarray, back), imgs, cfg)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestPromptCheckpointFormat:
    def test_pt_roundtrip(self, tmp_path):
        emb = np.random.default_rng(0).normal(size=(2, 512)).astype(np.float32)
        path = str(tmp_path / "prompts.pt")
        save_debias_prompt_pt(emb, path)
        back = load_debias_prompt_pt(path)
        np.testing.assert_allclose(back, emb)

    def test_reference_torch_compat(self, tmp_path):
        """The exported .pt must load as a plain torch tensor — the format the
        reference hub swaps into nn.Embedding (model/clip.py:75-81)."""
        emb = np.ones((2, 8), np.float32)
        path = str(tmp_path / "p.pt")
        save_debias_prompt_pt(emb, path)
        t = torch.load(path, map_location="cpu", weights_only=True)
        assert isinstance(t, torch.Tensor) and tuple(t.shape) == (2, 8)
