"""Video ingest: frame-dir/GIF loading, loader batching, and the full
video measure_bias path through a Frozen-in-Time model."""

import os

import jax
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from debias_vision_lang_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
from debias_vision_lang_tpu.data.loader import HostLoader
from debias_vision_lang_tpu.data.video import VideoDataset, load_frames


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(0)
    rows = []
    races = ["White", "Southeast Asian", "Middle Eastern", "Black", "Indian",
             "Latino_Hispanic", "East Asian"]
    ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59", "60-69",
            "more than 70"]
    # 6 frame-dir videos
    for i in range(6):
        vdir = root / f"vid{i}"
        vdir.mkdir()
        for f in range(6):  # 6 frames on disk, sampled down to 4
            Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(vdir / f"frame_{f:03d}.jpg")
        rows.append({"file": f"vid{i}", "gender": "Male" if i % 2 else "Female",
                     "race": races[i % 7], "age": ages[i % 9]})
    # 2 GIF videos
    for i in range(6, 8):
        frames = [Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
                  for _ in range(5)]
        frames[0].save(root / f"vid{i}.gif", save_all=True,
                       append_images=frames[1:])
        rows.append({"file": f"vid{i}.gif",
                     "gender": "Male" if i % 2 else "Female",
                     "race": races[i % 7], "age": ages[i % 9]})
    pd.DataFrame(rows).to_csv(root / "labels.csv", index=False)
    return str(root)


class TestLoadFrames:
    def test_frame_dir_sampling(self, video_root):
        frames = load_frames(os.path.join(video_root, "vid0"), 4)
        assert frames.shape == (4, 32, 32, 3)
        assert frames.dtype == np.uint8

    def test_gif(self, video_root):
        frames = load_frames(os.path.join(video_root, "vid6.gif"), 4)
        assert frames.shape == (4, 32, 32, 3)

    def test_oversampling_repeats(self, video_root):
        frames = load_frames(os.path.join(video_root, "vid0"), 10)
        assert frames.shape == (10, 32, 32, 3)


class TestVideoDataset:
    def test_construction(self, video_root):
        ds = VideoDataset(video_root, iat_type="gender", num_frames=4)
        assert len(ds) == 8
        assert ds.load_image(0).shape == (4, 32, 32, 3)
        assert ds.n_iat_classes == 2

    def test_loader_batches_5d(self, video_root):
        ds = VideoDataset(video_root, iat_type="gender", num_frames=4)
        batch = next(iter(HostLoader(ds, batch_size=4, num_workers=2)))
        assert batch.images.shape == (4, 4, 32, 32, 3)


class TestVideoMeasureBias:
    def test_fit_through_measure_bias(self, video_root):
        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.models.frozen_in_time import (
            FrozenInTime, init_fit_params)
        from debias_vision_lang_tpu.vision.preprocess import Preprocess

        cfg = CLIPConfig(
            name="tiny-fit",
            vision=VisionConfig(kind="video_vit", image_size=32, patch_size=8,
                                width=32, layers=1, heads=2, embed_dim=16),
            text=TextConfig(vocab_size=128, context_length=77, width=32,
                            layers=1, heads=2, embed_dim=16),
        )
        model = FrozenInTime(
            params=init_fit_params(jax.random.key(0), cfg, num_frames=4),
            cfg=cfg)

        def tok(texts):
            out = np.zeros((len(texts), 77), np.int32)
            out[:, 0] = 126
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % 100 + 1
                out[i, 2] = 127
            return out

        res = measure_bias(model, Preprocess(32), tok, "gender",
                           opts={"batch_size": 4, "num_workers": 2, "topn": 4,
                                 "dataset": "video", "data_path": video_root,
                                 "num_frames": 4})
        assert set(res) == {"maxskew", "ndkl"}
        assert np.isfinite(res["ndkl"]["eq_opp"])


def _tiny_vision_cfg():
    return VisionConfig(kind="vit", image_size=32, patch_size=8, width=32,
                        layers=2, heads=2, embed_dim=16)


class TestTemporalIdentity:
    def test_temporal_embedding_zero_init(self):
        """The temporal embedding must be ZERO-initialized (upstream FiT's
        identity trick): a fresh temporal axis must not perturb
        image-pretrained weights."""
        from debias_vision_lang_tpu.models.frozen_in_time import (
            init_video_vit_params)

        p = init_video_vit_params(jax.random.key(0), _tiny_vision_cfg())
        assert not np.asarray(p["temporal_embedding"]).any()

    def test_post_init_injection_matches_explicit_zeros(self):
        """FrozenInTime over plain image-ViT params embeds identically to
        params carrying an explicit zero temporal embedding (no random
        perturbation of pretrained weights)."""
        from debias_vision_lang_tpu.models import clip as clip_model
        from debias_vision_lang_tpu.models.frozen_in_time import FrozenInTime

        vcfg = _tiny_vision_cfg()
        cfg = CLIPConfig(
            name="fit-tiny", vision=vcfg,
            text=TextConfig(vocab_size=64, context_length=8, width=32,
                            layers=1, heads=2, embed_dim=16))
        params = {
            "visual": clip_model.init_vit_params(jax.random.key(2), vcfg),
            "text": clip_model.init_text_params(jax.random.key(3), cfg.text),
            "logit_scale": np.float32(0.0),
        }
        import copy

        explicit = copy.deepcopy(params)
        explicit["visual"]["temporal_embedding"] = np.zeros((4, 32), np.float32)

        imgs = np.asarray(
            np.random.default_rng(0).normal(size=(2, 32, 32, 3)), np.float32)
        a = FrozenInTime(params=params, cfg=cfg).encode_image(imgs)
        b = FrozenInTime(params=explicit, cfg=cfg).encode_image(imgs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDividedRemat:
    @pytest.mark.slow  # >40s on the 1-core gate host; full suite: -m ''
    def test_remat_matches_plain(self):
        """encode_video_divided(remat=True) must apply jax.checkpoint, not
        silently drop the flag — outputs are identical either way."""
        from debias_vision_lang_tpu.models.frozen_in_time import (
            encode_video_divided, init_video_vit_params)

        vcfg = _tiny_vision_cfg()
        p = init_video_vit_params(jax.random.key(1), vcfg, divided=True)
        vids = np.asarray(
            np.random.default_rng(1).normal(size=(2, 3, 32, 32, 3)), np.float32)
        plain = encode_video_divided(p, vids, vcfg, use_pallas=False)
        remat = encode_video_divided(p, vids, vcfg, use_pallas=False,
                                     remat=True)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(remat),
                                   atol=1e-6)

        # the gradient path (where remat actually matters) stays finite
        def loss(pp):
            return encode_video_divided(pp, vids, vcfg, use_pallas=False,
                                        remat=True).sum()

        g = jax.grad(loss)(p)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


class TestFrameOrdering:
    def test_unpadded_frame_numbers_sort_numerically(self, tmp_path):
        """ffmpeg-style unpadded frame numbers (frame_2 vs frame_10) must be
        sampled in temporal, not lexicographic, order."""
        vdir = tmp_path / "vid"
        vdir.mkdir()
        for f in range(1, 13):  # frame_1.jpg .. frame_12.jpg
            Image.fromarray(np.full((8, 8, 3), f * 20, np.uint8)).save(
                vdir / f"frame_{f}.jpg")
        frames = load_frames(str(vdir), 12)
        values = frames[:, 0, 0, 0].astype(int)
        assert list(values) == sorted(values), values
        # uniform sampling respects temporal spacing too
        four = load_frames(str(vdir), 4)[:, 0, 0, 0].astype(int)
        assert list(four) == sorted(four)


class TestVideoSubsample:
    def test_float_n_samples_fraction(self, video_root):
        """VideoDataset shares IATDataset's subsample helper: float
        _n_samples means a fraction (was silently broken by the inline
        int-only copy)."""
        full = VideoDataset(video_root, iat_type="gender")
        half = VideoDataset(video_root, iat_type="gender", _n_samples=0.5)
        assert len(half) == len(full) // 2
