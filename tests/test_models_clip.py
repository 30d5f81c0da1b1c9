import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debias_vision_lang_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
from debias_vision_lang_tpu.models import clip as clip_model
from debias_vision_lang_tpu.models.layers import causal_mask, quick_gelu
from debias_vision_lang_tpu.ops.attention import attention_reference


def _synth_fairface(root, rng, n=12):
    """A 12-image FairFace-layout directory (shared by the measure_bias
    patch-staging routing tests)."""
    import os

    import pandas as pd
    from PIL import Image

    os.makedirs(root / "imgs" / "train_val" / "v")
    races = ["White", "Southeast Asian", "Middle Eastern", "Black",
             "Indian", "Latino_Hispanic", "East Asian"]
    ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59",
            "60-69", "more than 70"]
    rows = []
    for i in range(n):
        f = f"v/{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                        ).save(root / "imgs" / "train_val" / f)
        rows.append({"file": f, "age": ages[i % 9],
                     "gender": "Male" if i % 2 else "Female",
                     "race": races[i % 7]})
    for m in ("train", "val"):
        os.makedirs(root / "labels" / m)
        pd.DataFrame(rows).to_csv(root / "labels" / m / f"{m}_labels.csv",
                                  index=False)
    return root


def _hash_tokenizer(cfg):
    def tok(texts):
        out = np.zeros((len(texts), 16), np.int32)
        out[:, 0] = cfg.text.vocab_size - 2
        for i, t in enumerate(texts):
            out[i, 1] = abs(hash(t)) % 400 + 1
            out[i, 2] = cfg.text.vocab_size - 1
        return out
    return tok


class TestQuickGelu:
    def test_values(self):
        x = jnp.array([-2.0, 0.0, 2.0])
        expected = x * jax.nn.sigmoid(1.702 * x)
        np.testing.assert_allclose(quick_gelu(x), expected)


class TestCausalMask:
    def test_structure(self):
        m = np.asarray(causal_mask(4))
        assert (np.diag(m) == 0).all()
        assert m[0, 1] == -np.inf and m[3, 0] == 0


class TestViTForward:
    def test_encode_image_shape(self, tiny_clip):
        cfg, params = tiny_clip
        imgs = jnp.ones((2, 32, 32, 3), jnp.float32)
        out = clip_model.encode_image(params, imgs, cfg, use_pallas=False)
        assert out.shape == (2, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_patch_embed_equals_conv(self, tiny_clip):
        """reshape+matmul patch embed == strided conv with the same weights."""
        cfg, params = tiny_clip
        p = cfg.vision.patch_size
        kernel = params["visual"]["conv1"]["kernel"]  # [p*p*3, width]
        imgs = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
        ours = clip_model.patch_embed(params["visual"]["conv1"], imgs, p)
        conv_kernel = kernel.reshape(p, p, 3, cfg.vision.width)
        ref = jax.lax.conv_general_dilated(
            imgs, conv_kernel, (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(2, -1, cfg.vision.width)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)

    def test_batch_independence(self, tiny_clip):
        cfg, params = tiny_clip
        imgs = jax.random.normal(jax.random.key(2), (3, 32, 32, 3))
        full = clip_model.encode_image(params, imgs, cfg, use_pallas=False)
        single = clip_model.encode_image(params, imgs[1:2], cfg, use_pallas=False)
        np.testing.assert_allclose(np.asarray(full[1]), np.asarray(single[0]), atol=1e-5)


class TestTextForward:
    def _tokens(self, cfg, batch=2):
        # synthetic tokens: SOT=vocab-2, EOT=vocab-1 framing
        v = cfg.text.vocab_size
        t = np.zeros((batch, cfg.text.context_length), np.int32)
        t[:, 0] = v - 2
        lengths = [5, 9][:batch]
        for i, l in enumerate(lengths):
            t[i, 1:l] = np.arange(1, l) % 100 + 1
            t[i, l] = v - 1
        return jnp.asarray(t)

    def test_encode_text_shape(self, tiny_clip):
        cfg, params = tiny_clip
        out = clip_model.encode_text(params, self._tokens(cfg), cfg, use_pallas=False)
        assert out.shape == (2, 32)

    def test_eot_pooling_position(self, tiny_clip):
        """Changing tokens AFTER the EOT (padding) must not change the output
        (causal mask + EOT pooling)."""
        cfg, params = tiny_clip
        t = np.asarray(self._tokens(cfg))
        out1 = clip_model.encode_text(params, jnp.asarray(t), cfg, use_pallas=False)
        t2 = t.copy()
        t2[0, 8:] = 3  # after EOT at position 5; ids stay < EOT id
        out2 = clip_model.encode_text(params, jnp.asarray(t2), cfg, use_pallas=False)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-5)

    def test_causality(self, tiny_clip):
        """Tokens BEFORE the EOT do change the output (sanity)."""
        cfg, params = tiny_clip
        t = np.asarray(self._tokens(cfg))
        out1 = clip_model.encode_text(params, jnp.asarray(t), cfg, use_pallas=False)
        t2 = t.copy()
        t2[0, 2] = 7
        out2 = clip_model.encode_text(params, jnp.asarray(t2), cfg, use_pallas=False)
        assert np.abs(np.asarray(out1[0]) - np.asarray(out2[0])).max() > 1e-6


class TestFullForward:
    def test_logits(self, tiny_clip):
        cfg, params = tiny_clip
        imgs = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
        v = cfg.text.vocab_size
        t = np.zeros((3, 16), np.int32)
        t[:, 0] = v - 2
        t[:, 1] = 5
        t[:, 2] = v - 1
        li, lt = clip_model.forward(params, imgs, jnp.asarray(t), cfg, use_pallas=False)
        assert li.shape == (2, 3) and lt.shape == (3, 2)
        np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-6)


class TestResNet:
    @pytest.fixture(scope="class")
    def tiny_rn(self):
        cfg = CLIPConfig(
            name="tiny-rn",
            vision=VisionConfig(kind="resnet", image_size=64, width=16,
                                layers=(1, 1, 1, 1), heads=8, embed_dim=32),
            text=TextConfig(vocab_size=512, context_length=16, width=32,
                            layers=2, heads=2, embed_dim=32),
        )
        params = clip_model.init_clip_params(jax.random.key(0), cfg)
        return cfg, params

    def test_encode_image_shape(self, tiny_rn):
        cfg, params = tiny_rn
        imgs = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
        out = clip_model.encode_image(params, imgs, cfg)
        assert out.shape == (2, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_stride_arithmetic(self, tiny_rn):
        """Total downsampling: stem(2) * pool(2) * stages(8) = 32."""
        from debias_vision_lang_tpu.models.resnet import (
            avg_pool, batch_norm, bottleneck, conv,
        )
        cfg, params = tiny_rn
        p = params["visual"]
        x = jnp.ones((1, 64, 64, 3))
        x = jax.nn.relu(batch_norm(p["bn1"], conv(p["conv1"], x, stride=2, padding=1)))
        assert x.shape[1] == 32


class TestAttentionReference:
    def test_softmax_rows(self):
        q = jax.random.normal(jax.random.key(0), (1, 2, 4, 8))
        out = attention_reference(q, q, q)
        assert out.shape == (1, 2, 4, 8)

    def test_mask_blocks_future(self):
        k = jax.random.key(1)
        q, kk, v = (jax.random.normal(jax.random.fold_in(k, i), (1, 1, 4, 8)) for i in range(3))
        m = causal_mask(4)
        out = attention_reference(q, kk, v, m)
        # first query position can only attend to itself → output = v[0]
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.asarray(v[0, 0, 0]), atol=1e-5)


class TestFoldedU8Path:
    """encode_image_vit_u8: Normalize folded into the patch conv — must
    equal preprocess_batch + encode_image_vit up to dtype rounding."""

    def test_fp32_equivalence(self, tiny_clip, rng):
        from debias_vision_lang_tpu.models.clip import (
            encode_image_vit, encode_image_vit_u8)
        from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

        cfg, params = tiny_clip
        u8 = jnp.asarray(rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8))
        ref = encode_image_vit(params["visual"],
                               preprocess_batch(u8, 32), cfg.vision,
                               dtype=jnp.float32, use_pallas=False)
        got = encode_image_vit_u8(params["visual"], u8, cfg.vision,
                                  dtype=jnp.float32, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_int8_u8_close(self, tiny_clip, rng):
        from debias_vision_lang_tpu.ops.quant import (
            encode_image_vit_q, encode_image_vit_q_u8, quantize_vit_visual)
        from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

        cfg, params = tiny_clip
        pq = quantize_vit_visual(params["visual"])
        u8 = jnp.asarray(rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8))
        ref = np.asarray(encode_image_vit_q(
            pq, preprocess_batch(u8, 32), cfg.vision), np.float32)
        got = np.asarray(encode_image_vit_q_u8(pq, u8, cfg.vision),
                         np.float32)
        # both paths quantize their (differently-scaled) conv inputs —
        # agreement is within quantization error
        cos = np.sum(ref * got, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
        assert cos.min() > 0.995


class TestPatchStagingFloatPath:
    """encode_image_vit_p8 + the encode_image staging dispatch: the
    float-path sibling of the exact int8 staged stem (the bf16 eval mode's
    stem — eval/measure.py enables the staging for dtype='bfloat16' too)."""

    def test_fp32_equivalence(self, tiny_clip, rng):
        from debias_vision_lang_tpu.models.clip import (
            encode_image_vit, encode_image_vit_p8)
        from debias_vision_lang_tpu.vision.preprocess import (patchify_u8,
                                                              preprocess_batch)

        cfg, params = tiny_clip
        imgs = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
        ref = encode_image_vit(params["visual"],
                               preprocess_batch(jnp.asarray(imgs), 32),
                               cfg.vision, dtype=jnp.float32, use_pallas=False)
        got = encode_image_vit_p8(params["visual"],
                                  jnp.asarray(patchify_u8(imgs, 8)),
                                  cfg.vision, dtype=jnp.float32,
                                  use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_bundle_dispatch_and_ambiguity_guard(self, tiny_clip, rng):
        """CLIP.encode_image routes the staging layout to the folded stem;
        shapes that merely LOOK 3-D (single HWC image, wrong patch count)
        must NOT be misrouted."""
        from debias_vision_lang_tpu.models.clip import _is_patch_staging
        from debias_vision_lang_tpu.models.loader import CLIP
        from debias_vision_lang_tpu.vision.preprocess import (patchify_u8,
                                                              preprocess_batch)

        cfg, params = tiny_clip
        model = CLIP(params=params, cfg=cfg)
        imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        staged = patchify_u8(imgs, 8)

        assert _is_patch_staging(jnp.asarray(staged), cfg.vision)
        # single HWC image: last dim 3, not patch²·3
        assert not _is_patch_staging(
            jnp.asarray(imgs[0]), cfg.vision)
        # right feature dim, wrong patch count
        assert not _is_patch_staging(
            jnp.asarray(staged[:, :9]), cfg.vision)
        # float staging (already-preprocessed something): not staging
        assert not _is_patch_staging(
            jnp.asarray(staged, jnp.float32), cfg.vision)

        via_bundle = np.asarray(model.encode_image(staged, dtype=jnp.float32,
                                                   use_pallas=False))
        ref = np.asarray(model.encode_image(
            preprocess_batch(jnp.asarray(imgs), 32), dtype=jnp.float32,
            use_pallas=False))
        np.testing.assert_allclose(via_bundle, ref, rtol=2e-4, atol=2e-5)

    def test_measure_bias_bf16_picks_patch_staging(self, tiny_clip, rng,
                                                   monkeypatch, tmp_path):
        """measure_bias(dtype='bfloat16') on a plain ViT at native
        resolution routes batches through the patch staging and produces
        metrics close to the unstaged float path."""
        import debias_vision_lang_tpu.data.loader as loader_mod
        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.models.loader import CLIP
        from debias_vision_lang_tpu.vision.preprocess import Preprocess

        root = _synth_fairface(tmp_path / "ff", rng)

        seen = {}
        orig_init = loader_mod.HostLoader.__init__

        def spy_init(self, *a, **kw):
            seen["native_patch"] = kw.get("native_patch")
            return orig_init(self, *a, **kw)

        monkeypatch.setattr(loader_mod.HostLoader, "__init__", spy_init)

        cfg, params = tiny_clip
        tok = _hash_tokenizer(cfg)
        model = CLIP(params=params, cfg=cfg)
        res_bf16 = measure_bias(model, Preprocess(32), tok, "gender",
                                opts={"batch_size": 8, "topn": 6,
                                      "dtype": "bfloat16",
                                      "data_path": str(root)})
        assert seen["native_patch"] == 8
        res_f32 = measure_bias(model, Preprocess(32), tok, "gender",
                               opts={"batch_size": 8, "topn": 6,
                                     "dtype": "float32",
                                     "data_path": str(root)})
        for key in ("maxskew", "ndkl"):
            for sub, v in res_bf16[key].items():
                assert np.isfinite(v)
                assert abs(v - res_f32[key][sub]) < 0.2

    def test_measure_bias_auto_picks_patch_staging(self, tiny_clip, rng,
                                                   monkeypatch, tmp_path):
        """dtype='auto' on a ViT resolves to the int8 rung AND routes
        batches through the P8 patch staging — the staging gate must test
        the RESOLVED rung, not the raw 'auto' string (which used to skip
        the staged stem that the int8 arch-sweep numbers depend on), and
        the metrics must stay close to the float path."""
        import debias_vision_lang_tpu.data.loader as loader_mod
        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.models.loader import CLIP
        from debias_vision_lang_tpu.vision.preprocess import Preprocess

        root = _synth_fairface(tmp_path / "ff", rng)

        seen = {}
        orig_init = loader_mod.HostLoader.__init__

        def spy_init(self, *a, **kw):
            seen["native_patch"] = kw.get("native_patch")
            return orig_init(self, *a, **kw)

        monkeypatch.setattr(loader_mod.HostLoader, "__init__", spy_init)

        cfg, params = tiny_clip
        tok = _hash_tokenizer(cfg)
        model = CLIP(params=params, cfg=cfg)
        res_auto = measure_bias(model, Preprocess(32), tok, "gender",
                                opts={"batch_size": 8, "topn": 6,
                                      "dtype": "auto",
                                      "data_path": str(root)})
        assert seen["native_patch"] == 8
        res_f32 = measure_bias(model, Preprocess(32), tok, "gender",
                               opts={"batch_size": 8, "topn": 6,
                                     "dtype": "float32",
                                     "data_path": str(root)})
        for key in ("maxskew", "ndkl"):
            for sub, v in res_auto[key].items():
                assert np.isfinite(v)
                assert abs(v - res_f32[key][sub]) < 0.2
