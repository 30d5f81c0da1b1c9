"""SLIP + Frozen-in-Time backends, zero-shot harness, pairs dataset,
observability utils."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from debias_vision_lang_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
from debias_vision_lang_tpu.models.frozen_in_time import (
    FrozenInTime,
    encode_video,
    init_fit_params,
)


@pytest.fixture(scope="module")
def tiny_fit():
    cfg = CLIPConfig(
        name="tiny-fit",
        vision=VisionConfig(kind="video_vit", image_size=16, patch_size=8,
                            width=32, layers=2, heads=2, embed_dim=16),
        text=TextConfig(vocab_size=128, context_length=12, width=32, layers=2,
                        heads=2, embed_dim=16),
    )
    params = init_fit_params(jax.random.key(0), cfg, num_frames=4)
    return cfg, params


class TestFrozenInTime:
    def test_video_encode_shape(self, tiny_fit):
        cfg, params = tiny_fit
        videos = jax.random.normal(jax.random.key(1), (2, 4, 16, 16, 3))
        out = encode_video(params["visual"], videos, cfg.vision, use_pallas=False)
        assert out.shape == (2, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_single_image_is_one_frame_video(self, tiny_fit):
        cfg, params = tiny_fit
        img = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
        as_img = encode_video(params["visual"], img, cfg.vision, use_pallas=False)
        as_vid = encode_video(params["visual"], img[:, None], cfg.vision,
                              use_pallas=False)
        np.testing.assert_allclose(np.asarray(as_img), np.asarray(as_vid), atol=1e-6)

    def test_temporal_subsampling(self, tiny_fit):
        cfg, params = tiny_fit
        videos = jax.random.normal(jax.random.key(3), (1, 9, 16, 16, 3))
        out = encode_video(params["visual"], videos, cfg.vision, use_pallas=False)
        assert out.shape == (1, 16)

    def test_temporal_order_matters_after_training(self, tiny_fit):
        """At INIT the temporal embedding is zero (the identity trick), so
        frame order is deliberately indistinguishable; once it trains away
        from zero, order must matter."""
        cfg, params = tiny_fit
        v = jax.random.normal(jax.random.key(4), (1, 4, 16, 16, 3))
        vis = params["visual"]
        fwd0 = encode_video(vis, v, cfg.vision, use_pallas=False)
        rev0 = encode_video(vis, v[:, ::-1], cfg.vision, use_pallas=False)
        np.testing.assert_allclose(np.asarray(fwd0), np.asarray(rev0),
                                   atol=1e-5)  # init: permutation-invariant
        trained = dict(vis)
        trained["temporal_embedding"] = 0.1 * jax.random.normal(
            jax.random.key(7), vis["temporal_embedding"].shape)
        fwd = encode_video(trained, v, cfg.vision, use_pallas=False)
        rev = encode_video(trained, v[:, ::-1], cfg.vision, use_pallas=False)
        assert np.abs(np.asarray(fwd) - np.asarray(rev)).max() > 1e-6

    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_cliplike_protocol(self, tiny_fit):
        from debias_vision_lang_tpu.models.loader import ClipLike

        cfg, params = tiny_fit
        model = FrozenInTime(params=params, cfg=cfg)
        assert isinstance(model, ClipLike)
        t = np.zeros((2, 12), np.int32)
        t[:, 0], t[:, 1], t[:, 2] = 126, 5, 127
        li, lt = model(jax.random.normal(jax.random.key(5), (3, 16, 16, 3)),
                       t, use_pallas=False)
        assert li.shape == (3, 2)

    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_loader_builds_fit(self):
        from debias_vision_lang_tpu.models.loader import model_loader

        model, _, _, alias = model_loader("m-bain/frozen-in-time/base",
                                          pretrained=False)
        assert alias == "mbain-fit-base"
        vids = np.zeros((1, 2, 224, 224, 3), np.float32)
        assert model.encode_video(vids, use_pallas=False).shape == (1, 256)


class TestSlipDivergence:
    def test_slip_uses_plain_gelu(self):
        """SLIP's timm-style tower: no pre-LN, plain GELU — outputs must
        differ from a CLIP-kind tower with identical params."""
        from debias_vision_lang_tpu.models.clip import (
            encode_image_vit, init_vit_params)

        v_clip = VisionConfig(kind="vit", image_size=16, patch_size=8, width=32,
                              layers=2, heads=2, embed_dim=16)
        v_slip = VisionConfig(kind="slip_vit", image_size=16, patch_size=8,
                              width=32, layers=2, heads=2, embed_dim=16)
        params = init_vit_params(jax.random.key(0), v_clip)
        img = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
        a = encode_image_vit(params, img, v_clip, use_pallas=False)
        b = encode_image_vit(params, img, v_slip, use_pallas=False)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


class TestZeroShot:
    def test_classifier_and_accuracy(self, tiny_clip, fake_dataset_dir):
        from debias_vision_lang_tpu.data.loader import HostLoader
        from debias_vision_lang_tpu.eval.zero_shot import (
            build_zero_shot_classifier, classify, zero_shot_accuracy)
        from debias_vision_lang_tpu.models.loader import CLIP

        cfg, params = tiny_clip
        model = CLIP(params=params, cfg=cfg)

        def tok(texts):
            out = np.zeros((len(texts), 16), np.int32)
            out[:, 0] = cfg.text.vocab_size - 2
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % 400 + 1
                out[i, 2] = cfg.text.vocab_size - 1
            return out

        clf = build_zero_shot_classifier(model, tok, ["cat", "dog", "fish"])
        assert clf.shape == (3, 32)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(clf), axis=1), 1.0,
                                   atol=1e-5)

        class DS:
            def __init__(self, n):
                self.n = n
                self.iat_labels = np.arange(n) % 3
                self.rng = np.random.default_rng(0)

            def __len__(self):
                return self.n

            def load_image(self, i):
                return self.rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)

        loader = HostLoader(DS(10), batch_size=4, num_workers=2)
        acc = zero_shot_accuracy(model, tok, loader, ["cat", "dog", "fish"],
                                 n_px=32)
        assert acc["n"] == 10
        assert 0.0 <= acc["top1"] <= acc["top5"] <= 1.0
        assert acc["top5"] == 1.0  # only 3 classes, top-5 covers all

    def test_classify_topk(self, rng):
        from debias_vision_lang_tpu.eval.zero_shot import classify

        clf = np.eye(4, 8).astype(np.float32)
        embs = clf[[2, 0, 3]] + rng.normal(size=(3, 8)).astype(np.float32) * 0.01
        preds = np.asarray(classify(jnp.asarray(embs), jnp.asarray(clf), top_k=1))
        np.testing.assert_array_equal(preds[:, 0], [2, 0, 3])


@pytest.fixture(scope="module")
def fake_dataset_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("imgs"))


class TestImageCaptionPairs:
    @pytest.fixture(scope="class")
    def pairs_dir(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("pairs")
        (root / "images").mkdir()
        rng = np.random.default_rng(0)
        rows = []
        for i in range(10):
            fname = f"{i}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(root / "images" / fname)
            rows.append({"file": fname, "caption": f"a photo number {i}"})
        pd.DataFrame(rows).to_csv(root / "captions.csv", index=False)
        return str(root)

    def test_batches(self, pairs_dir):
        from debias_vision_lang_tpu.data.pairs import ImageCaptionPairs

        ds = ImageCaptionPairs(pairs_dir, image_size=None)  # uniform corpus
        assert len(ds) == 10

        def tok(texts):
            return np.zeros((len(texts), 8), np.int32)

        batches = list(ds.batches(tok, batch_size=4,
                                  rng=np.random.default_rng(1)))
        assert len(batches) == 2  # drop_remainder
        imgs, toks = batches[0]
        assert imgs.shape == (4, 32, 32, 3) and toks.shape == (4, 8)

    def test_heterogeneous_native_matches_pil(self, tmp_path):
        """image_size-resized batches: the native ingest route must be
        bit-identical to the PIL route (PIL's uint8 resize IS the fixed-point
        path the C++ replicates)."""
        from debias_vision_lang_tpu import native
        from debias_vision_lang_tpu.data.pairs import ImageCaptionPairs

        if not native.available():
            pytest.skip(f"native ingest unavailable: {native.build_error()}")

        root = tmp_path
        (root / "images").mkdir()
        rng = np.random.default_rng(5)
        rows = []
        for i, (h, w) in enumerate([(64, 48), (100, 31), (28, 28), (40, 90)]):
            fname = f"{i}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ).save(root / "images" / fname, quality=92)
            rows.append({"file": fname, "caption": f"c{i}"})
        pd.DataFrame(rows).to_csv(root / "captions.csv", index=False)

        ds = ImageCaptionPairs(str(root), image_size=28)

        def tok(texts):
            return np.zeros((len(texts), 8), np.int32)

        (imgs, _), = list(ds.batches(tok, batch_size=4))
        assert imgs.shape == (4, 28, 28, 3)
        # per-image PIL route (native disabled) must agree bit-for-bit
        import unittest.mock as mock

        with mock.patch.object(native, "available", return_value=False):
            pil_imgs = np.stack([ds.load_image(i) for i in range(4)])
        np.testing.assert_array_equal(imgs, pil_imgs)

    def test_missing_columns_raise(self, tmp_path):
        from debias_vision_lang_tpu.data.pairs import ImageCaptionPairs

        pd.DataFrame({"x": [1]}).to_csv(tmp_path / "captions.csv", index=False)
        with pytest.raises(ValueError, match="caption"):
            ImageCaptionPairs(str(tmp_path))


class TestObservability:
    def test_metrics_logger_jsonl(self, tmp_path):
        from debias_vision_lang_tpu.utils.observability import MetricsLogger

        logger = MetricsLogger(str(tmp_path))
        logger.log({"loss": 1.5}, step=1)
        logger.log({"loss": 1.2, "ndkl": 0.3}, step=2)
        logger.close()
        lines = [json.loads(l) for l in open(logger.path)]
        assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 2

    def test_step_timer(self, tmp_path):
        from debias_vision_lang_tpu.utils.observability import (
            MetricsLogger, step_timer)

        logger = MetricsLogger(str(tmp_path))
        with step_timer(logger, step=1) as box:
            pass
        logger.close()
        assert box["elapsed"] >= 0
        assert "step_time_s" in open(logger.path).read()


class TestDividedSpaceTime:
    @pytest.fixture(scope="class")
    def divided_setup(self):
        from debias_vision_lang_tpu.models.frozen_in_time import (
            init_video_vit_params)

        vcfg = VisionConfig(kind="video_vit", image_size=16, patch_size=8,
                            width=32, layers=2, heads=2, embed_dim=16)
        params = init_video_vit_params(jax.random.key(0), vcfg, num_frames=4,
                                       divided=True)
        return vcfg, params

    def test_shape(self, divided_setup):
        from debias_vision_lang_tpu.models.frozen_in_time import (
            encode_video_divided)

        vcfg, params = divided_setup
        v = jax.random.normal(jax.random.key(1), (2, 4, 16, 16, 3))
        out = encode_video_divided(params, v, vcfg, use_pallas=False)
        assert out.shape == (2, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_zero_init_temporal_is_identity(self, divided_setup):
        """At init the temporal output proj is zero → shuffling the frame
        ORDER must not change the output (temporal path contributes nothing,
        aside from the temporal embedding, which we zero for this check)."""
        from debias_vision_lang_tpu.models.frozen_in_time import (
            encode_video_divided)

        vcfg, params = divided_setup
        p = dict(params)
        p["temporal_embedding"] = jnp.zeros_like(params["temporal_embedding"])
        v = jax.random.normal(jax.random.key(2), (1, 4, 16, 16, 3))
        fwd = encode_video_divided(p, v, vcfg, use_pallas=False)
        rev = encode_video_divided(p, v[:, ::-1], vcfg, use_pallas=False)
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(rev), atol=1e-5)

    def test_trained_temporal_breaks_symmetry(self, divided_setup):
        from debias_vision_lang_tpu.models.frozen_in_time import (
            encode_video_divided)

        vcfg, params = divided_setup
        p = jax.tree.map(lambda x: x, params)
        p["temporal_attn"] = dict(p["temporal_attn"])
        p["temporal_attn"]["attn"] = dict(p["temporal_attn"]["attn"])
        p["temporal_attn"]["attn"]["wo"] = 0.1 * jax.random.normal(
            jax.random.key(3), params["temporal_attn"]["attn"]["wo"].shape)
        # a trained temporal embedding too: with the zero identity-init,
        # temporal attention alone is frame-permutation-equivariant
        p["temporal_embedding"] = 0.1 * jax.random.normal(
            jax.random.key(6), p["temporal_embedding"].shape)
        v = jax.random.normal(jax.random.key(4), (1, 4, 16, 16, 3))
        fwd = encode_video_divided(p, v, vcfg, use_pallas=False)
        rev = encode_video_divided(p, v[:, ::-1], vcfg, use_pallas=False)
        assert np.abs(np.asarray(fwd) - np.asarray(rev)).max() > 1e-6

    def test_requires_divided_params(self):
        """Params without the temporal_attn subtree (e.g. a hand-built or
        legacy tree) get a clear error from the divided path."""
        from debias_vision_lang_tpu.models.frozen_in_time import (
            encode_video_divided, init_video_vit_params)

        vcfg = VisionConfig(kind="video_vit", image_size=16, patch_size=8,
                            width=32, layers=1, heads=2, embed_dim=16)
        params = dict(init_video_vit_params(jax.random.key(0), vcfg))
        del params["temporal_attn"]
        with pytest.raises(ValueError, match="divided"):
            encode_video_divided(params, jnp.zeros((1, 2, 16, 16, 3)), vcfg)

    def test_init_matches_converter_structure(self):
        """Random init and from_fit_state_dict must yield the SAME pytree
        structure — optimizer-state templates and checkpoint restores break
        on any mismatch (same invariant as init_vit_params for slip_vit)."""
        import numpy as _np

        from debias_vision_lang_tpu.models import convert
        from debias_vision_lang_tpu.models.frozen_in_time import (
            init_video_vit_params)

        vcfg = VisionConfig(kind="video_vit", image_size=16, patch_size=8,
                            width=32, layers=2, heads=2, embed_dim=16)
        rand = init_video_vit_params(jax.random.key(0), vcfg, num_frames=4)

        rng = _np.random.default_rng(0)
        sd = {"video_model.cls_token": rng.normal(size=(1, 1, 32)),
              "video_model.pos_embed": rng.normal(size=(1, 5, 32)),
              "video_model.temporal_embed": rng.normal(size=(1, 4, 32)),
              "video_model.patch_embed.proj.weight":
                  rng.normal(size=(32, 3, 8, 8)),
              "video_model.patch_embed.proj.bias": rng.normal(size=(32,)),
              "video_model.norm.weight": rng.normal(size=(32,)),
              "video_model.norm.bias": rng.normal(size=(32,)),
              "vid_proj.0.weight": rng.normal(size=(16, 32)),
              "vid_proj.0.bias": rng.normal(size=(16,))}
        for i in range(2):
            b = f"video_model.blocks.{i}"
            sd.update({
                f"{b}.norm1.weight": rng.normal(size=(32,)),
                f"{b}.norm1.bias": rng.normal(size=(32,)),
                f"{b}.attn.qkv.weight": rng.normal(size=(96, 32)),
                f"{b}.attn.qkv.bias": rng.normal(size=(96,)),
                f"{b}.attn.proj.weight": rng.normal(size=(32, 32)),
                f"{b}.attn.proj.bias": rng.normal(size=(32,)),
                f"{b}.norm2.weight": rng.normal(size=(32,)),
                f"{b}.norm2.bias": rng.normal(size=(32,)),
                f"{b}.mlp.fc1.weight": rng.normal(size=(128, 32)),
                f"{b}.mlp.fc1.bias": rng.normal(size=(128,)),
                f"{b}.mlp.fc2.weight": rng.normal(size=(32, 128)),
                f"{b}.mlp.fc2.bias": rng.normal(size=(32,)),
                f"{b}.norm3.weight": rng.normal(size=(32,)),
                f"{b}.norm3.bias": rng.normal(size=(32,)),
                f"{b}.timeattn.qkv.weight": rng.normal(size=(96, 32)),
                f"{b}.timeattn.qkv.bias": rng.normal(size=(96,)),
                f"{b}.timeattn.proj.weight": _np.zeros((32, 32)),
                f"{b}.timeattn.proj.bias": _np.zeros((32,)),
            })
        converted = convert.from_fit_state_dict(sd)["visual"]
        assert (jax.tree_util.tree_structure(rand)
                == jax.tree_util.tree_structure(converted))


class TestPairsHeterogeneousSizes:
    def test_mixed_sizes_batch(self, tmp_path):
        """Real corpora (flickr30k) have varying image sizes — host resize +
        crop makes batches stack."""
        import pandas as pd
        from PIL import Image

        from debias_vision_lang_tpu.data.pairs import ImageCaptionPairs

        root = tmp_path / "pairs_mixed"
        (root / "images").mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = []
        for i, (h, w) in enumerate([(64, 48), (100, 120), (80, 80), (48, 96)]):
            f = f"{i}.jpg"
            Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                            ).save(root / "images" / f)
            rows.append({"file": f, "caption": f"caption {i}"})
        pd.DataFrame(rows).to_csv(root / "captions.csv", index=False)

        ds = ImageCaptionPairs(str(root), image_size=32)

        def tok(texts):
            return np.zeros((len(texts), 8), np.int32)

        imgs, toks = next(ds.batches(tok, batch_size=4))
        assert imgs.shape == (4, 32, 32, 3)
        assert imgs.dtype == np.uint8


class TestZeroShotInt8:
    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_int8_dtype_runs_and_agrees(self, tiny_clip, rng):
        """zero_shot_accuracy(dtype='int8') quantizes the vision tower;
        predictions match fp32 on well-separated synthetic data."""
        from debias_vision_lang_tpu.data.loader import HostLoader
        from debias_vision_lang_tpu.eval.zero_shot import zero_shot_accuracy
        from debias_vision_lang_tpu.models.loader import CLIP

        cfg, params = tiny_clip
        model = CLIP(params=params, cfg=cfg)

        def tok(texts):
            out = np.zeros((len(texts), 16), np.int32)
            out[:, 0] = cfg.text.vocab_size - 2
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % 400 + 1
                out[i, 2] = cfg.text.vocab_size - 1
            return out

        class DS:
            def __init__(self, n):
                self.n = n
                self.iat_labels = np.arange(n) % 3
                self.rng = np.random.default_rng(0)

            def __len__(self):
                return self.n

            def load_image(self, i):
                return self.rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)

        kw = dict(n_px=32)
        a32 = zero_shot_accuracy(model, tok, HostLoader(DS(10), batch_size=4,
                                                        num_workers=2),
                                 ["cat", "dog", "fish"], **kw)
        a8 = zero_shot_accuracy(model, tok, HostLoader(DS(10), batch_size=4,
                                                       num_workers=2),
                                ["cat", "dog", "fish"], dtype="int8", **kw)
        assert a8["n"] == 10 and 0.0 <= a8["top1"] <= 1.0
        # random tiny tower: scores are near-ties, so only pin structure +
        # that the int8 path executes; exact agreement is asserted at real
        # scale by the rank-stability tests in test_quant.py
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown dtype"):
            zero_shot_accuracy(model, tok, HostLoader(DS(4), batch_size=4,
                                                      num_workers=2),
                               ["cat"], dtype="fp16", **kw)


class TestLoggerNumpyScalars:
    def test_numpy_and_jax_scalars_serialize(self, tmp_path):
        """Metric dicts containing numpy/jax scalars (the natural output of
        a jitted step) must not kill the run with a JSON TypeError."""
        import json

        import jax.numpy as jnp

        from debias_vision_lang_tpu.utils.observability import MetricsLogger

        logger = MetricsLogger(str(tmp_path))
        logger.log({"a": np.float32(0.5), "b": np.int64(3),
                    "c": jnp.float32(1.25), "d": 2.0,
                    "e": np.arange(2)}, step=1)
        logger.close()
        rec = json.loads(open(logger.path).read().splitlines()[-1])
        assert rec["a"] == 0.5 and rec["b"] == 3 and rec["c"] == 1.25
        assert rec["e"] == [0, 1]


class TestPerFamilyNormalization:
    """SLIP/FiT trained with ImageNet normalization, not CLIP's stats
    (round-3 review fix: they were silently normalized with CLIP stats).
    The stats live in VisionConfig and reach preprocess, the device
    normalize, and the folded u8/p8 stems."""

    def test_registry_stats(self):
        from debias_vision_lang_tpu.core.registry import (IMAGENET_STATS,
                                                          resolve_arch)

        slip = resolve_arch("facebookresearch/SLIP/ViT-B/16")
        fit = resolve_arch("m-bain/frozen-in-time/base")
        clip = resolve_arch("openai/CLIP/ViT-B/16")
        assert slip.vision.image_mean == IMAGENET_STATS[0]
        assert fit.vision.image_std == IMAGENET_STATS[1]
        assert clip.vision.image_mean == (0.48145466, 0.4578275, 0.40821073)

    def test_loader_preprocess_carries_stats(self):
        from debias_vision_lang_tpu.models.loader import model_loader

        _, pre_slip, _, _ = model_loader("facebookresearch/SLIP/ViT-B/16",
                                         pretrained=False)
        _, pre_clip, _, _ = model_loader("openai/CLIP/ViT-B/32",
                                         pretrained=False)
        assert pre_slip.mean == (0.485, 0.456, 0.406)
        assert pre_clip.mean == (0.48145466, 0.4578275, 0.40821073)
        # the host chain actually normalizes with them
        img = np.full((32, 32, 3), 128, np.uint8)
        out_slip = pre_slip(img)
        out_clip = pre_clip(img)
        expect_slip = (128 / 255.0 - 0.485) / 0.229
        assert abs(float(out_slip[0, 0, 0]) - expect_slip) < 1e-6
        assert abs(float(out_slip[0, 0, 0]) - float(out_clip[0, 0, 0])) > 1e-3

    def test_device_and_folded_paths_agree_on_imagenet_stats(self, rng):
        """preprocess_batch + tower == the folded-stem staging path when the
        config carries ImageNet stats (tiny slip_vit)."""
        import jax
        import jax.numpy as jnp

        from debias_vision_lang_tpu.core.config import (CLIPConfig,
                                                        TextConfig,
                                                        VisionConfig)
        from debias_vision_lang_tpu.core.registry import IMAGENET_STATS
        from debias_vision_lang_tpu.models import clip as clip_model
        from debias_vision_lang_tpu.vision.preprocess import (patchify_u8,
                                                              preprocess_batch)

        cfg = CLIPConfig(
            name="tiny-slip",
            vision=VisionConfig(kind="slip_vit", image_size=32, patch_size=8,
                                width=64, layers=2, heads=2, embed_dim=32,
                                image_mean=IMAGENET_STATS[0],
                                image_std=IMAGENET_STATS[1]),
            text=TextConfig(vocab_size=128, context_length=16, width=32,
                            layers=2, heads=2, embed_dim=32),
        )
        params = clip_model.init_clip_params(jax.random.key(0), cfg)
        imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        ref = clip_model.encode_image(
            params, preprocess_batch(jnp.asarray(imgs), 32,
                                     mean=cfg.vision.image_mean,
                                     std=cfg.vision.image_std),
            cfg, dtype=jnp.float32, use_pallas=False)
        staged = clip_model.encode_image(
            params, jnp.asarray(patchify_u8(imgs, 8)), cfg,
            dtype=jnp.float32, use_pallas=False)
        np.testing.assert_allclose(np.asarray(staged), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_debias_wrap_preserves_divided_attention(self, rng):
        """cfg-carried video_attention: a DebiasCLIP wrapped around a
        divided-attention FiT runs the divided path (round-3 review fix —
        the joint path ignored trained temporal weights)."""
        import jax
        import jax.numpy as jnp

        from debias_vision_lang_tpu.core.config import (CLIPConfig,
                                                        DebiasConfig,
                                                        TextConfig,
                                                        VisionConfig)
        from debias_vision_lang_tpu.models import clip as clip_model
        from debias_vision_lang_tpu.models.frozen_in_time import (
            encode_video, encode_video_divided, init_video_vit_params)

        vis = VisionConfig(kind="video_vit", image_size=32, patch_size=8,
                           width=64, layers=2, heads=2, embed_dim=32,
                           video_attention="divided")
        cfg = CLIPConfig(name="tiny-fit", vision=vis,
                         text=TextConfig(vocab_size=128, context_length=16,
                                         width=32, layers=2, heads=2,
                                         embed_dim=32))
        params = clip_model.init_clip_params(jax.random.key(0), cfg)
        # make the temporal path matter
        params["visual"]["temporal_attn"]["attn"]["wo"] = (
            0.1 * jax.random.normal(jax.random.key(1),
                                    params["visual"]["temporal_attn"]["attn"]["wo"].shape))
        vids = jnp.asarray(rng.integers(0, 256, (2, 2, 32, 32, 3),
                                        dtype=np.uint8), jnp.float32) / 255.0
        via_dispatch = clip_model.encode_image(params, vids, cfg,
                                               dtype=jnp.float32)
        divided = encode_video_divided(params["visual"], vids, cfg.vision,
                                       dtype=jnp.float32)
        joint = encode_video(params["visual"], vids, cfg.vision,
                             dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(via_dispatch),
                                   np.asarray(divided), rtol=1e-5, atol=1e-6)
        assert np.abs(np.asarray(divided) - np.asarray(joint)).max() > 1e-4
