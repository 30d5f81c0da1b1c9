"""Int8 video tower (Frozen-in-Time family): parity vs the fp paths,
QuantizedCLIP dispatch, and the full video measure_bias pipeline at
dtype="int8".  Completes the precision ladder across model families
(reference stubs FiT at debias_clip/model/model.py:115-116; the fp video
paths live in models/frozen_in_time.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from debias_vision_lang_tpu.core.config import (CLIPConfig, TextConfig,
                                                VisionConfig)
from debias_vision_lang_tpu.models.frozen_in_time import (
    FrozenInTime, encode_video, encode_video_divided, init_fit_params)
from debias_vision_lang_tpu.ops.quant import (QuantizedCLIP,
                                              encode_video_divided_q,
                                              encode_video_q,
                                              quantize_video_visual)


def _fit_cfg(attention="joint"):
    return CLIPConfig(
        name="tiny-fit",
        vision=VisionConfig(kind="video_vit", image_size=32, patch_size=8,
                            width=32, layers=2, heads=2, embed_dim=16,
                            video_attention=attention),
        text=TextConfig(vocab_size=128, context_length=16, width=32,
                        layers=1, heads=2, embed_dim=16),
    )


@pytest.fixture(scope="module")
def fit_bundle():
    cfg = _fit_cfg()
    params = init_fit_params(jax.random.key(0), cfg, num_frames=4)
    # give the (zero-init identity) temporal attention real weights so the
    # divided parity test actually exercises the temporal int8 matmuls
    ta = params["visual"]["temporal_attn"]["attn"]
    k1, k2 = jax.random.split(jax.random.key(7))
    ta["wo"] = 0.05 * jax.random.normal(k1, ta["wo"].shape)
    ta["bo"] = 0.01 * jax.random.normal(k2, ta["bo"].shape)
    return cfg, params


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                * np.linalg.norm(b, axis=-1))


@pytest.fixture(scope="module")
def videos():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.normal(size=(3, 4, 32, 32, 3)).astype(np.float32))


class TestVideoInt8Parity:
    def test_joint_cosine_parity(self, fit_bundle, videos):
        cfg, params = fit_bundle
        vq = quantize_video_visual(params["visual"])
        e_fp = encode_video(params["visual"], videos, cfg.vision,
                            dtype=jnp.float32)
        e_q = encode_video_q(vq, videos, cfg.vision, dtype=jnp.float32)
        assert _cos(e_fp, e_q).min() > 0.99

    def test_divided_cosine_parity(self, fit_bundle, videos):
        cfg, params = fit_bundle
        vq = quantize_video_visual(params["visual"])
        e_fp = encode_video_divided(params["visual"], videos, cfg.vision,
                                    dtype=jnp.float32)
        e_q = encode_video_divided_q(vq, videos, cfg.vision,
                                     dtype=jnp.float32)
        assert _cos(e_fp, e_q).min() > 0.99

    def test_single_frame_promotion(self, fit_bundle, videos):
        """4-D [B, H, W, 3] input == the same frames as 1-frame videos
        (bit-exact: identical compute graph after promotion)."""
        cfg, params = fit_bundle
        vq = quantize_video_visual(params["visual"])
        frames = videos[:, 0]
        for fn in (encode_video_q, encode_video_divided_q):
            np.testing.assert_array_equal(
                np.asarray(fn(vq, frames, cfg.vision, dtype=jnp.float32)),
                np.asarray(fn(vq, frames[:, None], cfg.vision,
                              dtype=jnp.float32)))

    def test_zero_temporal_attn_is_identity(self, videos):
        """With the upstream zero-init temporal attention, the divided int8
        temporal block must be an exact identity (quantized zero weights
        stay zero), so int8 divided == the same network without the
        temporal residual."""
        cfg = _fit_cfg("divided")
        params = init_fit_params(jax.random.key(1), cfg, num_frames=4)
        vq = quantize_video_visual(params["visual"])
        out = encode_video_divided_q(vq, videos, cfg.vision,
                                     dtype=jnp.float32)
        # scrambling the temporal QKV must change NOTHING: the zero-init
        # out-proj quantizes to exact zeros, killing the whole branch
        vq2 = jax.tree.map(jnp.copy, vq)
        ta = vq2["temporal_attn"]["attn"]
        ta["wqkv"]["q"] = jnp.asarray(
            np.random.default_rng(5).integers(
                -127, 127, ta["wqkv"]["q"].shape, endpoint=True),
            jnp.int8)
        out2 = encode_video_divided_q(vq2, videos, cfg.vision,
                                      dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        assert np.isfinite(np.asarray(out)).all()

    def test_divided_requires_temporal_attn(self, fit_bundle, videos):
        cfg, params = fit_bundle
        vq = quantize_video_visual(params["visual"])
        vq.pop("temporal_attn")
        with pytest.raises(ValueError, match="temporal_attn"):
            encode_video_divided_q(vq, videos, cfg.vision)


class TestQuantizedCLIPVideo:
    def test_joint_dispatch(self, fit_bundle, videos):
        cfg, params = fit_bundle
        base = FrozenInTime(params=params, cfg=cfg)
        q = QuantizedCLIP(base)
        out = q.encode_image(videos, dtype=jnp.float32)
        ref = encode_video_q(q.visual_q, videos, cfg.vision,
                             dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # encode_video alias (FrozenInTime parity)
        np.testing.assert_array_equal(
            np.asarray(q.encode_video(videos, dtype=jnp.float32)),
            np.asarray(out))

    def test_divided_dispatch_follows_bundle_mode(self, fit_bundle, videos):
        cfg, params = fit_bundle
        base = FrozenInTime(params=params, cfg=cfg, attention="divided")
        q = QuantizedCLIP(base)
        ref = encode_video_divided_q(q.visual_q, videos, cfg.vision,
                                     dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(q.encode_image(videos, dtype=jnp.float32)),
            np.asarray(ref))

    def test_cfg_carried_mode_without_bundle_attr(self, fit_bundle, videos):
        """A bundle without .attention (e.g. DebiasCLIP over FiT) falls back
        to the cfg-carried video_attention."""
        cfg, params = fit_bundle
        dcfg = _fit_cfg("divided")
        base = FrozenInTime(params=params, cfg=dcfg, attention="divided")

        class Bare:  # minimal wrapped-bundle stand-in: params + cfg only
            def __init__(self, p, c):
                self.params, self.cfg = p, c

        q = QuantizedCLIP(Bare(params, dcfg))
        ref = encode_video_divided_q(
            quantize_video_visual(params["visual"]), videos, dcfg.vision,
            dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(q.encode_image(videos, dtype=jnp.float32)),
            np.asarray(ref))

    def test_jit_as_pytree(self, fit_bundle, videos):
        cfg, params = fit_bundle
        q = QuantizedCLIP(FrozenInTime(params=params, cfg=cfg))

        @jax.jit
        def embed(m, x):
            return m.encode_image(x, dtype=jnp.float32)

        out = embed(q, videos)
        assert out.shape == (3, cfg.embed_dim)
        assert np.isfinite(np.asarray(out)).all()


class TestVideoMeasureBiasInt8:
    @pytest.fixture(scope="class")
    def video_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("videos_q")
        rng = np.random.default_rng(0)
        races = ["White", "Southeast Asian", "Middle Eastern", "Black",
                 "Indian", "Latino_Hispanic", "East Asian"]
        ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59",
                "60-69", "more than 70"]
        rows = []
        for i in range(6):
            vdir = root / f"vid{i}"
            vdir.mkdir()
            for f in range(4):
                Image.fromarray(
                    rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                ).save(vdir / f"frame_{f:03d}.jpg")
            rows.append({"file": f"vid{i}",
                         "gender": "Male" if i % 2 else "Female",
                         "race": races[i % 7], "age": ages[i % 9]})
        pd.DataFrame(rows).to_csv(root / "labels.csv", index=False)
        return str(root)

    def test_video_pipeline_int8(self, fit_bundle, video_root):
        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.vision.preprocess import Preprocess

        cfg, params = fit_bundle
        model = FrozenInTime(params=params, cfg=cfg)

        def tok(texts):
            out = np.zeros((len(texts), 16), np.int32)
            out[:, 0] = 126
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % 100 + 1
                out[i, 2] = 127
            return out

        res = measure_bias(model, Preprocess(32), tok, "gender",
                           opts={"batch_size": 4, "num_workers": 2,
                                 "topn": 4, "dataset": "video",
                                 "data_path": video_root, "num_frames": 4,
                                 "dtype": "int8"})
        assert set(res) == {"maxskew", "ndkl"}
        assert np.isfinite(res["ndkl"]["eq_opp"])
