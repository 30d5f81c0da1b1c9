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

    def test_torch_bf16_upcast(self, tiny_clip):
        """torch bf16 tensors cannot .numpy() directly — the converter must
        upcast torch-side (common dtype for modern fine-tune checkpoints)."""
        import torch

        cfg, params = tiny_clip
        sd = to_openai_state_dict(params, cfg)
        sd_bf16 = {k: torch.from_numpy(np.asarray(v)).bfloat16()
                   for k, v in sd.items()}
        back = from_openai_state_dict(sd_bf16, cfg)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            assert np.asarray(b).dtype == np.float32
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0.02, rtol=0.02)

    def test_slip_roundtrip(self, rng):
        """slip_vit trees (no ln_pre, conv bias) round-trip through the
        OpenAI-format export/import."""
        from debias_vision_lang_tpu.core.config import (
            CLIPConfig, TextConfig, VisionConfig)
        from debias_vision_lang_tpu.models.clip import init_clip_params

        cfg = CLIPConfig(
            name="slip-tiny",
            vision=VisionConfig(kind="slip_vit", image_size=32, patch_size=8,
                                width=64, layers=2, heads=2, embed_dim=32),
            text=TextConfig(vocab_size=512, context_length=16, width=32,
                            layers=2, heads=2, embed_dim=32))
        params = init_clip_params(jax.random.key(3), cfg)
        assert "ln_pre" not in params["visual"]
        assert "bias" in params["visual"]["conv1"]
        sd = to_openai_state_dict(params, cfg)
        assert "visual.ln_pre.weight" not in sd
        assert "visual.conv1.bias" in sd
        back = from_openai_state_dict(sd, cfg)
        flat1 = jax.tree.leaves(params)
        flat2 = jax.tree.leaves(back)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)


class TestResNetConverter:
    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
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


def _rand_sd(shapes, seed=0):
    rng = np.random.default_rng(seed)
    return {k: rng.normal(scale=0.02, size=s).astype(np.float32)
            for k, s in shapes.items()}


class TestSLIPConverter:
    """facebookresearch/SLIP naming → our pytree, numerically verified
    against an explicit torch transliteration of the timm ViT block."""

    WIDTH, LAYERS, HEADS, PATCH, IMG, EMBED = 32, 2, 2, 8, 16, 16

    def _slip_sd(self):
        W, L, P, E = self.WIDTH, self.LAYERS, self.PATCH, self.EMBED
        n_tok = (self.IMG // P) ** 2 + 1
        shapes = {
            "module.visual.cls_token": (1, 1, W),
            "module.visual.pos_embed": (1, n_tok, W),
            "module.visual.patch_embed.proj.weight": (W, 3, P, P),
            "module.visual.patch_embed.proj.bias": (W,),
            "module.visual.norm.weight": (W,), "module.visual.norm.bias": (W,),
            "module.image_projection": (W, E),
            # text tower (CLIP naming)
            "module.token_embedding.weight": (64, W),
            "module.positional_embedding": (12, W),
            "module.ln_final.weight": (W,), "module.ln_final.bias": (W,),
            "module.text_projection": (W, E),
            "module.logit_scale": (),
            # SSL head that must be IGNORED
            "module.image_mlp.0.weight": (W, W),
        }
        for i in range(L):
            v = f"module.visual.blocks.{i}"
            t = f"module.transformer.resblocks.{i}"
            shapes.update({
                f"{v}.norm1.weight": (W,), f"{v}.norm1.bias": (W,),
                f"{v}.attn.qkv.weight": (3 * W, W), f"{v}.attn.qkv.bias": (3 * W,),
                f"{v}.attn.proj.weight": (W, W), f"{v}.attn.proj.bias": (W,),
                f"{v}.norm2.weight": (W,), f"{v}.norm2.bias": (W,),
                f"{v}.mlp.fc1.weight": (4 * W, W), f"{v}.mlp.fc1.bias": (4 * W,),
                f"{v}.mlp.fc2.weight": (W, 4 * W), f"{v}.mlp.fc2.bias": (4 * W // 4,),
                f"{t}.ln_1.weight": (W,), f"{t}.ln_1.bias": (W,),
                f"{t}.attn.in_proj_weight": (3 * W, W), f"{t}.attn.in_proj_bias": (3 * W,),
                f"{t}.attn.out_proj.weight": (W, W), f"{t}.attn.out_proj.bias": (W,),
                f"{t}.ln_2.weight": (W,), f"{t}.ln_2.bias": (W,),
                f"{t}.mlp.c_fc.weight": (4 * W, W), f"{t}.mlp.c_fc.bias": (4 * W,),
                f"{t}.mlp.c_proj.weight": (W, 4 * W), f"{t}.mlp.c_proj.bias": (W,),
            })
        sd = _rand_sd(shapes, seed=3)
        sd["module.visual.norm.weight"] += 1.0  # LN scales ~1
        sd["module.ln_final.weight"] += 1.0
        for i in range(L):
            sd[f"module.visual.blocks.{i}.norm1.weight"] += 1.0
            sd[f"module.visual.blocks.{i}.norm2.weight"] += 1.0
            sd[f"module.transformer.resblocks.{i}.ln_1.weight"] += 1.0
            sd[f"module.transformer.resblocks.{i}.ln_2.weight"] += 1.0
        return sd

    def _torch_slip_visual(self, sd, images_nchw):
        """Explicit timm-ViT forward in torch (independent oracle)."""
        import torch
        import torch.nn.functional as F

        g = {k[len("module."):]: torch.from_numpy(v.copy()) for k, v in sd.items()}
        x = F.conv2d(torch.from_numpy(images_nchw),
                     g["visual.patch_embed.proj.weight"],
                     g["visual.patch_embed.proj.bias"],
                     stride=self.PATCH)          # [B, W, gh, gw]
        b, w, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)          # [B, N, W]
        cls = g["visual.cls_token"].expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + g["visual.pos_embed"]
        H = self.HEADS
        for i in range(self.LAYERS):
            p = f"visual.blocks.{i}"
            h = F.layer_norm(x, (w,), g[f"{p}.norm1.weight"], g[f"{p}.norm1.bias"])
            qkv = h @ g[f"{p}.attn.qkv.weight"].T + g[f"{p}.attn.qkv.bias"]
            q, k, v = qkv.chunk(3, dim=-1)
            def heads(t):
                return t.view(b, -1, H, w // H).transpose(1, 2)
            att = F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
            att = att.transpose(1, 2).reshape(b, -1, w)
            x = x + att @ g[f"{p}.attn.proj.weight"].T + g[f"{p}.attn.proj.bias"]
            h = F.layer_norm(x, (w,), g[f"{p}.norm2.weight"], g[f"{p}.norm2.bias"])
            h = h @ g[f"{p}.mlp.fc1.weight"].T + g[f"{p}.mlp.fc1.bias"]
            h = F.gelu(h)  # exact erf gelu (timm default)
            x = x + h @ g[f"{p}.mlp.fc2.weight"].T + g[f"{p}.mlp.fc2.bias"]
        x = F.layer_norm(x[:, 0], (w,), g["visual.norm.weight"], g["visual.norm.bias"])
        return (x @ g["image_projection"]).numpy()

    def test_visual_tower_matches_torch(self, rng):
        import torch

        from debias_vision_lang_tpu.core.config import (
            CLIPConfig, TextConfig, VisionConfig)
        from debias_vision_lang_tpu.models.clip import encode_image
        from debias_vision_lang_tpu.models.convert import from_slip_state_dict

        sd = self._slip_sd()
        params = from_slip_state_dict(sd)
        cfg = CLIPConfig(
            name="slip-tiny",
            vision=VisionConfig(kind="slip_vit", image_size=self.IMG,
                                patch_size=self.PATCH, width=self.WIDTH,
                                layers=self.LAYERS, heads=self.HEADS,
                                embed_dim=self.EMBED),
            text=TextConfig(vocab_size=64, context_length=12, width=self.WIDTH,
                            layers=self.LAYERS, heads=self.HEADS,
                            embed_dim=self.EMBED),
        )
        imgs = rng.normal(size=(2, self.IMG, self.IMG, 3)).astype(np.float32)
        with torch.no_grad():
            ref = self._torch_slip_visual(sd, imgs.transpose(0, 3, 1, 2).copy())
        ours = np.asarray(encode_image(params, jnp.asarray(imgs), cfg,
                                       use_pallas=False))
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_checkpoint_dict_and_ssl_head_ignored(self):
        from debias_vision_lang_tpu.models.convert import from_slip_state_dict

        ckpt = {"state_dict": self._slip_sd(), "epoch": 24}
        params = from_slip_state_dict(ckpt)
        assert "bias" in params["visual"]["conv1"]  # timm patch conv bias kept
        assert params["visual"]["resblocks"]["attn"]["wqkv"].shape == (
            self.LAYERS, self.WIDTH, 3 * self.WIDTH)
        flat = jax.tree_util.tree_leaves_with_path(params)
        assert not any("image_mlp" in jax.tree_util.keystr(p) for p, _ in flat)


class TestFiTConverter:
    """m-bain/frozen-in-time naming → our video pytree: structural round-trip
    + the upstream zero-init timeattn identity property."""

    W, L, H, P, IMG, T, E = 32, 2, 2, 8, 16, 3, 16

    def _fit_sd(self, zero_time_proj=True):
        W, L, P, T = self.W, self.L, self.P, self.T
        n_tok = (self.IMG // P) ** 2 + 1
        shapes = {
            "module.video_model.cls_token": (1, 1, W),
            "module.video_model.pos_embed": (1, n_tok, W),
            "module.video_model.temporal_embed": (1, T, W),
            "module.video_model.patch_embed.proj.weight": (W, 3, P, P),
            "module.video_model.patch_embed.proj.bias": (W,),
            "module.video_model.norm.weight": (W,),
            "module.video_model.norm.bias": (W,),
            "module.vid_proj.0.weight": (self.E, W),
            "module.vid_proj.0.bias": (self.E,),
            # DistilBERT text side that must be SKIPPED
            "module.text_model.embeddings.word_embeddings.weight": (30522, 4),
            "module.txt_proj.0.weight": (self.E, 4),
        }
        for i in range(L):
            b = f"module.video_model.blocks.{i}"
            shapes.update({
                f"{b}.norm1.weight": (W,), f"{b}.norm1.bias": (W,),
                f"{b}.attn.qkv.weight": (3 * W, W), f"{b}.attn.qkv.bias": (3 * W,),
                f"{b}.attn.proj.weight": (W, W), f"{b}.attn.proj.bias": (W,),
                f"{b}.norm2.weight": (W,), f"{b}.norm2.bias": (W,),
                f"{b}.norm3.weight": (W,), f"{b}.norm3.bias": (W,),
                f"{b}.timeattn.qkv.weight": (3 * W, W), f"{b}.timeattn.qkv.bias": (3 * W,),
                f"{b}.timeattn.proj.weight": (W, W), f"{b}.timeattn.proj.bias": (W,),
                f"{b}.mlp.fc1.weight": (4 * W, W), f"{b}.mlp.fc1.bias": (4 * W,),
                f"{b}.mlp.fc2.weight": (W, 4 * W), f"{b}.mlp.fc2.bias": (W,),
            })
        sd = _rand_sd(shapes, seed=7)
        for i in range(L):
            b = f"module.video_model.blocks.{i}"
            for nm in ("norm1", "norm2", "norm3"):
                sd[f"{b}.{nm}.weight"] += 1.0
            if zero_time_proj:  # upstream's zero-init temporal output proj
                sd[f"{b}.timeattn.proj.weight"][:] = 0
                sd[f"{b}.timeattn.proj.bias"][:] = 0
        sd["module.video_model.norm.weight"] += 1.0
        return sd

    def _cfg(self):
        from debias_vision_lang_tpu.core.config import (
            CLIPConfig, TextConfig, VisionConfig)

        return CLIPConfig(
            name="fit-tiny",
            vision=VisionConfig(kind="video_vit", image_size=self.IMG,
                                patch_size=self.P, width=self.W,
                                layers=self.L, heads=self.H, embed_dim=self.E),
            text=TextConfig(vocab_size=64, context_length=12, width=self.W,
                            layers=self.L, heads=self.H, embed_dim=self.E),
        )

    def test_structure_and_forward(self, rng):
        from debias_vision_lang_tpu.models.convert import from_fit_state_dict
        from debias_vision_lang_tpu.models.frozen_in_time import (
            encode_video, encode_video_divided)

        params = from_fit_state_dict({"state_dict": self._fit_sd()})
        assert params["visual"]["temporal_embedding"].shape == (self.T, self.W)
        assert params["visual"]["proj"]["kernel"].shape == (self.W, self.E)
        assert "text" not in params  # DistilBERT side skipped by design
        flat = jax.tree_util.tree_leaves_with_path(params)
        assert not any("text_model" in jax.tree_util.keystr(p) for p, _ in flat)

        vids = rng.normal(size=(2, self.T, self.IMG, self.IMG, 3)).astype(np.float32)
        cfg = self._cfg()
        out = np.asarray(encode_video(params["visual"], jnp.asarray(vids),
                                      cfg.vision, use_pallas=False))
        assert out.shape == (2, self.E) and np.isfinite(out).all()
        out_div = np.asarray(encode_video_divided(
            params["visual"], jnp.asarray(vids), cfg.vision, use_pallas=False))
        assert out_div.shape == (2, self.E) and np.isfinite(out_div).all()

    def test_zero_init_temporal_identity(self, rng):
        """With upstream's zero-initialized timeattn.proj, the divided tower
        must produce IDENTICAL embeddings whether the temporal attention is
        present or ablated (the 'starts as identity' trick)."""
        from debias_vision_lang_tpu.models.convert import from_fit_state_dict
        from debias_vision_lang_tpu.models.frozen_in_time import encode_video_divided

        params = from_fit_state_dict({"state_dict": self._fit_sd(True)})
        vids = rng.normal(size=(1, self.T, self.IMG, self.IMG, 3)).astype(np.float32)
        cfg = self._cfg()
        base = np.asarray(encode_video_divided(
            params["visual"], jnp.asarray(vids), cfg.vision, use_pallas=False))

        # scramble the temporal qkv — with a zero output proj it cannot matter
        import copy

        p2 = copy.deepcopy(jax.tree.map(np.asarray, params))
        p2["visual"]["temporal_attn"]["attn"]["wqkv"] += 1.0
        scr = np.asarray(encode_video_divided(
            jax.tree.map(jnp.asarray, p2)["visual"], jnp.asarray(vids),
            cfg.vision, use_pallas=False))
        np.testing.assert_allclose(base, scr, atol=1e-6)


class TestStateDictDispatch:
    """_load_weights_file routes torch checkpoints to the right converter by
    key naming (OpenAI / HF / SLIP / FiT)."""

    def test_slip_and_fit_pt_files(self, tmp_path):
        import torch

        from debias_vision_lang_tpu.models.loader import _load_weights_file

        slip_sd = {k: torch.from_numpy(v.copy())
                   for k, v in TestSLIPConverter()._slip_sd().items()}
        fit_sd = {k: torch.from_numpy(v.copy())
                  for k, v in TestFiTConverter()._fit_sd().items()}
        sp, fp = str(tmp_path / "slip.pt"), str(tmp_path / "fit.pt")
        torch.save({"state_dict": slip_sd, "epoch": 3}, sp)
        torch.save({"state_dict": fit_sd}, fp)

        p1 = _load_weights_file(sp, None)
        assert "bias" in p1["visual"]["conv1"]
        p2 = _load_weights_file(fp, None)
        assert "temporal_embedding" in p2["visual"] and "text" not in p2
