"""Int8 inference path: numerics, rank stability, wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debias_vision_lang_tpu.models.loader import CLIP
from debias_vision_lang_tpu.ops.quant import (
    QuantizedCLIP,
    int8_matmul,
    quantize_weight,
)


def _make_rn_bundle() -> CLIP:
    """A tiny ModifiedResNet bundle (shared by the int8-parity and
    resolve_compute-steering suites)."""
    from debias_vision_lang_tpu.core.config import (
        CLIPConfig, TextConfig, VisionConfig)
    from debias_vision_lang_tpu.models.clip import init_clip_params

    cfg = CLIPConfig(
        name="rn", vision=VisionConfig(kind="resnet", image_size=64, width=16,
                                       layers=(1, 1, 1, 1), heads=8,
                                       embed_dim=32),
        text=TextConfig(vocab_size=64, context_length=8, width=32, layers=1,
                        heads=2, embed_dim=32))
    return CLIP(params=init_clip_params(jax.random.key(0), cfg), cfg=cfg)


class TestQuantPrimitives:
    def test_quantize_weight_range(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        q = quantize_weight(w)
        assert q["q"].dtype == jnp.int8
        assert np.abs(np.asarray(q["q"])).max() <= 127
        # dequantized weight close to original
        deq = np.asarray(q["q"], np.float32) * np.asarray(q["scale"])
        assert np.abs(deq - np.asarray(w)).max() <= np.abs(np.asarray(w)).max() / 127 + 1e-6

    def test_int8_matmul_accuracy(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        exact = np.asarray(x @ w + b)
        approx = np.asarray(int8_matmul(x, quantize_weight(w), b))
        rel = np.abs(approx - exact).max() / np.abs(exact).max()
        assert rel < 0.05

    def test_stacked_weight_scales(self, rng):
        w = jnp.asarray(rng.normal(size=(3, 8, 16)).astype(np.float32))  # [L,in,out]
        q = quantize_weight(w)
        assert q["scale"].shape == (3, 1, 16)  # per layer per out-channel

    def test_patch_embed_q_matches_patchify_oracle(self, rng):
        """Relayout-free int8 patch embedding == int8_matmul over the
        explicitly patchified tensor (same per-patch dynamic quantization,
        same contraction) — bit-level up to f32 reduction order."""
        from debias_vision_lang_tpu.ops.quant import _patchify, patch_embed_q

        patch, width = 4, 24
        x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(patch * patch * 3, width)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(width,)).astype(np.float32))
        wq = quantize_weight(w)
        oracle = np.asarray(
            int8_matmul(_patchify(x, patch), wq, b), np.float32)
        got = np.asarray(
            patch_embed_q(x, patch, wq, b, out_dtype=jnp.float32))
        np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-5)

    def test_patch_embed_dot_general_matches_transpose(self, rng):
        """Float patch_embed (dot_general over split patch dims) == the
        reshape/transpose+matmul formulation."""
        from debias_vision_lang_tpu.models.clip import patch_embed
        from debias_vision_lang_tpu.ops.quant import _patchify

        patch, width = 4, 24
        x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(patch * patch * 3, width)).astype(np.float32))
        oracle = np.asarray(_patchify(x, patch) @ k)
        got = np.asarray(patch_embed({"kernel": k}, x, patch))
        np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-5)


class TestOutlierChannels:
    """De-risk per-row dynamic int8 against the KNOWN failure mode of real
    transformer checkpoints: a few input channels carrying 10-100x the
    typical magnitude (weight rows and/or activation channels).  Per-row
    activation scales are set by the largest channel, crushing resolution
    for the rest of the row — these tests pin where the scheme holds and
    where it measurably degrades, until real CLIP weights can be fetched
    (VERDICT r2 item 8)."""

    def _outlier_matmul_cosine(self, rng, w_scale, a_scale, n_out=8):
        d_in, d_out, b = 256, 256, 32
        w = rng.normal(size=(d_in, d_out)).astype(np.float32)
        w[rng.choice(d_in, n_out, replace=False)] *= w_scale
        x = rng.normal(size=(b, d_in)).astype(np.float32)
        x[:, rng.choice(d_in, n_out, replace=False)] *= a_scale
        exact = x @ w
        approx = np.asarray(int8_matmul(jnp.asarray(x), quantize_weight(jnp.asarray(w))))
        return float((exact * approx).sum()
                     / (np.linalg.norm(exact) * np.linalg.norm(approx)))

    def test_realistic_outliers_hold(self, rng):
        """50x heavy-tailed weight rows and activation channels (the
        magnitude reported for real ViT/CLIP checkpoints) keep matmul
        cosine >= 0.99."""
        assert self._outlier_matmul_cosine(rng, 50.0, 1.0) > 0.99
        assert self._outlier_matmul_cosine(rng, 1.0, 50.0) > 0.99
        assert self._outlier_matmul_cosine(rng, 50.0, 50.0) > 0.99

    def test_extreme_outliers_degrade_measurably(self, rng):
        """100x outliers in DISJOINT weight-row / activation-channel sets
        degrade the per-row scheme (measured ~0.90 cosine): the activation
        outliers set the row scale while the weight outliers amplify
        DIFFERENT channels, so the crushed non-outlier lanes dominate the
        output.  Pinned so the boundary is visible; real-weight validation
        remains network-gated (PERF.md)."""
        d, b = 256, 32
        w = rng.normal(size=(d, d)).astype(np.float32)
        w[:16] *= 100.0
        x = rng.normal(size=(b, d)).astype(np.float32)
        x[:, 128:144] *= 100.0  # disjoint from w's outlier rows
        exact = x @ w
        approx = np.asarray(
            int8_matmul(jnp.asarray(x), quantize_weight(jnp.asarray(w))))
        cos = float((exact * approx).sum()
                    / (np.linalg.norm(exact) * np.linalg.norm(approx)))
        assert cos < 0.99  # the scheme genuinely degrades here
        assert cos > 0.80  # but does not collapse

    def _outlier_tower(self, tiny_clip, rng, paths, factor):
        import jax.tree_util as jtu

        cfg, params = tiny_clip
        params = jtu.tree_map(lambda a: np.array(a, np.float32), params)
        vis = params["visual"]["resblocks"]
        for p0, p1 in paths:
            w = vis[p0][p1]  # [L, in, out]
            idx = rng.choice(w.shape[1], max(2, w.shape[1] // 16), replace=False)
            w[:, idx, :] *= factor
        base = CLIP(params=jtu.tree_map(jnp.asarray, params), cfg=cfg)
        qmodel = QuantizedCLIP(base)
        images = jnp.asarray(rng.normal(size=(12, 32, 32, 3)).astype(np.float32))
        e_fp = np.asarray(base.encode_image(images, use_pallas=False,
                                            dtype=jnp.float32))
        e_q = np.asarray(qmodel.encode_image(images, dtype=jnp.float32))
        cos = np.sum(e_fp * e_q, -1) / (
            np.linalg.norm(e_fp, axis=-1) * np.linalg.norm(e_q, axis=-1))
        prompt = rng.normal(size=(cfg.embed_dim,)).astype(np.float32)
        top_fp = set(np.argsort(-(e_fp @ prompt))[:3])
        top_q = set(np.argsort(-(e_q @ prompt))[:3])
        return cos, len(top_fp & top_q)

    def test_tower_rank_stability_realistic_outliers(self, tiny_clip, rng):
        """Realistic pattern: heavy-tailed input rows at 30x, in the post-LN
        consumer matmuls only (wqkv/w1 — where real checkpoint outliers
        live).  Embeddings stay high-cosine and rank-stable."""
        cos, overlap = self._outlier_tower(
            tiny_clip, rng, (("attn", "wqkv"), ("mlp", "w1")), 30.0)
        # tiny tower = 1/16 of channels outlier (denser than real
        # checkpoints relative to width); measured min 0.956, median 0.998
        assert cos.min() > 0.93, cos
        assert np.median(cos) > 0.99
        assert overlap >= 2

    def test_tower_degrades_under_dense_extreme_outliers(self, tiny_clip, rng):
        """Dense extreme injection (50x rows in ALL FOUR matmuls of every
        layer, 1/16 of channels) compounds across layers: per-image cosine
        measurably drops (min ~0.85 here).  Pins the honest failure
        boundary of per-row dynamic int8 — the motivation for re-validating
        on real weights once the network gate opens."""
        cos, _ = self._outlier_tower(
            tiny_clip, rng,
            (("attn", "wqkv"), ("attn", "wo"), ("mlp", "w1"), ("mlp", "w2")),
            50.0)
        assert cos.min() < 0.99   # degradation is real and visible
        assert cos.min() > 0.60   # but bounded
        assert np.median(cos) > 0.95


class TestQuantizedCLIP:
    def test_embedding_cosine_parity(self, tiny_clip, rng):
        cfg, params = tiny_clip
        base = CLIP(params=params, cfg=cfg)
        qmodel = QuantizedCLIP(base)
        images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
        e_fp = np.asarray(base.encode_image(images, use_pallas=False, dtype=jnp.float32))
        e_q = np.asarray(qmodel.encode_image(images, dtype=jnp.float32))
        cos = np.sum(e_fp * e_q, -1) / (
            np.linalg.norm(e_fp, axis=-1) * np.linalg.norm(e_q, axis=-1))
        assert cos.min() > 0.99

    def test_ranking_stability(self, tiny_clip, rng):
        """Rank order of images against a prompt is preserved under int8."""
        cfg, params = tiny_clip
        base = CLIP(params=params, cfg=cfg)
        qmodel = QuantizedCLIP(base)
        images = jnp.asarray(rng.normal(size=(12, 32, 32, 3)).astype(np.float32))
        prompt = rng.normal(size=(cfg.embed_dim,)).astype(np.float32)
        s_fp = np.asarray(base.encode_image(images, use_pallas=False,
                                            dtype=jnp.float32)) @ prompt
        s_q = np.asarray(qmodel.encode_image(images, dtype=jnp.float32)) @ prompt
        # rank-level check: top-3 sets overlap strongly
        top_fp = set(np.argsort(-s_fp)[:3])
        top_q = set(np.argsort(-s_q)[:3])
        assert len(top_fp & top_q) >= 2

    def test_text_tower_untouched(self, tiny_clip):
        cfg, params = tiny_clip
        base = CLIP(params=params, cfg=cfg)
        qmodel = QuantizedCLIP(base)
        v = cfg.text.vocab_size
        t = np.zeros((1, 16), np.int32)
        t[:, 0], t[:, 1], t[:, 2] = v - 2, 3, v - 1
        np.testing.assert_array_equal(
            np.asarray(base.encode_text(t, use_pallas=False)),
            np.asarray(qmodel.encode_text(t, use_pallas=False)))

    def _rn_bundle(self):
        return _make_rn_bundle()

    def test_resnet_int8_cosine_parity(self, rng):
        """The ladder covers the ModifiedResNet family: BN-folded int8
        convs/matmuls track the fp tower."""
        base = self._rn_bundle()
        qmodel = QuantizedCLIP(base)
        images = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
        e_fp = np.asarray(base.encode_image(images, dtype=jnp.float32))
        e_q = np.asarray(qmodel.encode_image(images, dtype=jnp.float32))
        cos = np.sum(e_fp * e_q, -1) / (
            np.linalg.norm(e_fp, axis=-1) * np.linalg.norm(e_q, axis=-1))
        assert cos.min() > 0.99, cos

    def test_resnet_int8_jit_and_fused_kwarg(self, rng):
        """'fused' (a ViT knob) must be inert, and the bundle jit-able as a
        pytree — the uniform-caller contract every tower obeys."""
        qmodel = QuantizedCLIP(self._rn_bundle())

        @jax.jit
        def embed(m, x):
            return m.encode_image(x, dtype=jnp.float32, fused=True)

        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        out = embed(qmodel, x)
        assert out.shape == (2, 32) and np.isfinite(np.asarray(out)).all()

    def test_unknown_tower_rejected(self):
        base = self._rn_bundle()
        import dataclasses

        bad_cfg = dataclasses.replace(
            base.cfg, vision=dataclasses.replace(base.cfg.vision,
                                                 kind="mystery"))

        class Bundle:
            cfg = bad_cfg
            params = base.params

        with pytest.raises(NotImplementedError, match="mystery"):
            QuantizedCLIP(Bundle())

    def test_jit_as_pytree(self, tiny_clip, rng):
        cfg, params = tiny_clip
        qmodel = QuantizedCLIP(CLIP(params=params, cfg=cfg))

        @jax.jit
        def embed(m, x):
            return m.encode_image(x, dtype=jnp.float32)

        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        out = embed(qmodel, x)
        assert out.shape == (2, 32)

    def test_measure_bias_with_quantized_model(self, tiny_clip, rng, tmp_path):
        """QuantizedCLIP drops into the measure_bias pipeline unchanged."""
        import os

        import pandas as pd
        from PIL import Image

        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.vision.preprocess import Preprocess

        root = tmp_path / "ff"
        os.makedirs(root / "imgs" / "train_val" / "v")
        races = ["White", "Southeast Asian", "Middle Eastern", "Black",
                 "Indian", "Latino_Hispanic", "East Asian"]
        ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59",
                "60-69", "more than 70"]
        rows = []
        for i in range(12):
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

        cfg, params = tiny_clip
        qmodel = QuantizedCLIP(CLIP(params=params, cfg=cfg))

        def tok(texts):
            out = np.zeros((len(texts), 16), np.int32)
            out[:, 0] = cfg.text.vocab_size - 2
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % 400 + 1
                out[i, 2] = cfg.text.vocab_size - 1
            return out

        res = measure_bias(qmodel, Preprocess(32), tok, "gender",
                           opts={"batch_size": 8, "topn": 6,
                                 "data_path": str(root)})
        assert np.isfinite(res["ndkl"]["eq_opp"])


class TestQuantizedSlip:
    def test_slip_arch_branches_match_fp(self, rng):
        """Int8 SLIP tower must take the same architecture branches as fp
        (no ln_pre, plain GELU) — cosine parity like the CLIP kind."""
        import jax

        from debias_vision_lang_tpu.core.config import (
            CLIPConfig, TextConfig, VisionConfig)
        from debias_vision_lang_tpu.models.clip import init_clip_params

        cfg = CLIPConfig(
            name="tiny-slip",
            vision=VisionConfig(kind="slip_vit", image_size=32, patch_size=8,
                                width=64, layers=2, heads=2, embed_dim=32),
            text=TextConfig(vocab_size=512, context_length=16, width=32,
                            layers=2, heads=2, embed_dim=32))
        base = CLIP(params=init_clip_params(jax.random.key(0), cfg), cfg=cfg)
        qmodel = QuantizedCLIP(base)
        images = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
        e_fp = np.asarray(base.encode_image(images, use_pallas=False,
                                            dtype=jnp.float32))
        e_q = np.asarray(qmodel.encode_image(images, dtype=jnp.float32))
        cos = np.sum(e_fp * e_q, -1) / (
            np.linalg.norm(e_fp, axis=-1) * np.linalg.norm(e_q, axis=-1))
        assert cos.min() > 0.99


class TestPatchStagingP8:
    """Exact int8 stem from host-patchified uint8 staging
    (ops/quant.py::patch_embed_q_p8 — the headline int8 eval stem)."""

    def test_patch_embed_q_p8_is_integer_exact(self, rng):
        """The −128 shift + colsum correction makes the activation side
        EXACT: output == (u8 @ q) · scale + bias with the matmul in
        integers (int64 numpy oracle)."""
        from debias_vision_lang_tpu.ops.quant import patch_embed_q_p8

        d, width = 4 * 4 * 3, 24
        w = jnp.asarray(rng.normal(size=(d, width)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(width,)).astype(np.float32))
        wq = quantize_weight(w)
        patches = rng.integers(0, 256, (2, 9, d), dtype=np.uint8)
        acc = patches.astype(np.int64) @ np.asarray(wq["q"], np.int64)
        expected = (acc.astype(np.float32) * np.asarray(wq["scale"])[0]
                    + np.asarray(b))
        got = np.asarray(patch_embed_q_p8(jnp.asarray(patches), wq, b,
                                          out_dtype=jnp.float32))
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-5)

    def test_p8_tower_matches_fp_and_u8(self, tiny_clip, rng):
        """QuantizedCLIP dispatches ndim==3 uint8 input to the staged stem;
        embeddings must agree with (a) the folded-u8 int8 path and (b) the
        full-precision tower on the equivalently preprocessed images."""
        from debias_vision_lang_tpu.ops.quant import encode_image_vit_q_u8
        from debias_vision_lang_tpu.vision.preprocess import (patchify_u8,
                                                              preprocess_batch)

        cfg, params = tiny_clip
        base = CLIP(params=params, cfg=cfg)
        qmodel = QuantizedCLIP(base)
        imgs = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)

        e_p8 = np.asarray(qmodel.encode_image(
            jnp.asarray(patchify_u8(imgs, 8)), dtype=jnp.float32))
        e_u8 = np.asarray(encode_image_vit_q_u8(
            qmodel.visual_q, jnp.asarray(imgs), cfg.vision,
            dtype=jnp.float32))
        e_fp = np.asarray(base.encode_image(
            preprocess_batch(jnp.asarray(imgs), 32), use_pallas=False,
            dtype=jnp.float32))

        def cos(a, b):
            return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                        * np.linalg.norm(b, axis=-1))

        assert cos(e_p8, e_u8).min() > 0.99
        assert cos(e_p8, e_fp).min() > 0.99

    def test_staged_pipeline_matches_unstaged(self, tiny_clip, rng, tmp_path):
        """get_labels_img_embeddings over a patch-staged loader ==
        the plain-u8 loader within stem quantization tolerance, with
        identical labels — the end-to-end wiring measure_bias turns on
        for dtype='int8'."""
        from PIL import Image

        from debias_vision_lang_tpu.data.loader import HostLoader
        from debias_vision_lang_tpu.eval.measure import get_labels_img_embeddings

        paths = []
        for i in range(10):
            p = str(tmp_path / f"{i}.jpg")
            Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                            ).save(p, quality=95)
            paths.append(p)

        class DS:
            _img_fnames = paths
            iat_labels = np.arange(10) % 2

            def __len__(self):
                return 10

            def load_image(self, i):
                with Image.open(paths[i]) as im:
                    return np.asarray(im.convert("RGB"))

        cfg, params = tiny_clip
        model = CLIP(params=params, cfg=cfg)
        ds = DS()
        lab_a, emb_a = get_labels_img_embeddings(
            HostLoader(ds, batch_size=4, num_workers=1, native_n_px=32),
            model, n_px=32, dtype="int8")
        lab_b, emb_b = get_labels_img_embeddings(
            HostLoader(ds, batch_size=4, num_workers=1, native_n_px=32,
                       native_patch=8),
            model, n_px=32, dtype="int8")
        np.testing.assert_array_equal(lab_a, lab_b)
        a, b = np.asarray(emb_a), np.asarray(emb_b)
        cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                   * np.linalg.norm(b, axis=-1))
        assert cos.min() > 0.99

    def test_measure_bias_int8_picks_patch_staging(self, tiny_clip, monkeypatch,
                                                   rng, tmp_path):
        """measure_bias(dtype='int8') on a plain ViT at native resolution
        must route batches through the patch-contiguous staging (and still
        produce finite metrics)."""
        import os

        import pandas as pd
        from PIL import Image

        import debias_vision_lang_tpu.data.loader as loader_mod
        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.vision.preprocess import Preprocess

        root = tmp_path / "ff"
        os.makedirs(root / "imgs" / "train_val" / "v")
        races = ["White", "Southeast Asian", "Middle Eastern", "Black",
                 "Indian", "Latino_Hispanic", "East Asian"]
        ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59",
                "60-69", "more than 70"]
        rows = []
        for i in range(12):
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

        seen = {}
        orig_init = loader_mod.HostLoader.__init__

        def spy_init(self, *a, **kw):
            seen["native_patch"] = kw.get("native_patch")
            return orig_init(self, *a, **kw)

        monkeypatch.setattr(loader_mod.HostLoader, "__init__", spy_init)

        cfg, params = tiny_clip

        def tok(texts):
            out = np.zeros((len(texts), 16), np.int32)
            out[:, 0] = cfg.text.vocab_size - 2
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % 400 + 1
                out[i, 2] = cfg.text.vocab_size - 1
            return out

        res = measure_bias(CLIP(params=params, cfg=cfg), Preprocess(32), tok,
                           "gender",
                           opts={"batch_size": 8, "topn": 6, "dtype": "int8",
                                 "data_path": str(root)})
        assert seen["native_patch"] == cfg.vision.patch_size
        assert np.isfinite(res["ndkl"]["eq_opp"])

    def test_ambiguous_3d_input_rejected(self, tiny_clip, rng):
        """encode_image routes ONLY the genuine uint8 patch staging to the
        p8 stem; any other 3-D input (a float tensor shaped like the
        staging, a single HWC image) must raise, not return silent
        garbage — mirrors the _is_patch_staging guard on the fp path."""
        from debias_vision_lang_tpu.vision.preprocess import patchify_u8

        cfg, params = tiny_clip
        qmodel = QuantizedCLIP(CLIP(params=params, cfg=cfg))
        fake = jnp.asarray(rng.normal(size=(2, 16, 192)).astype(np.float32))
        with pytest.raises(ValueError, match="patch-contiguous"):
            qmodel.encode_image(fake)
        single = jnp.asarray(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        with pytest.raises(ValueError, match="batch single images"):
            qmodel.encode_image(single)
        imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        out = qmodel.encode_image(jnp.asarray(patchify_u8(imgs, 8)),
                                  dtype=jnp.float32)
        assert np.isfinite(np.asarray(out)).all()


class TestQuantizedText:
    """Optional int8 text tower (quantize_text=True / dtype='int8-text'):
    same surround as the fp path, only the resblock matmuls int8."""

    def _tokens(self, cfg, n=6):
        v = cfg.text.vocab_size
        rng = np.random.default_rng(5)
        t = np.zeros((n, cfg.text.context_length), np.int32)
        t[:, 0] = v - 2
        for i in range(n):
            ln = 2 + i % 5
            t[i, 1:ln + 1] = rng.integers(1, 400, ln)
            t[i, ln + 1] = v - 1  # EOT = max id
        return jnp.asarray(t)

    def test_text_cosine_parity_and_eot(self, tiny_clip):
        cfg, params = tiny_clip
        base = CLIP(params=params, cfg=cfg)
        qmodel = QuantizedCLIP(base, quantize_text=True)
        toks = self._tokens(cfg)
        e_fp = np.asarray(base.encode_text(toks, dtype=jnp.float32))
        e_q = np.asarray(qmodel.encode_text(toks, dtype=jnp.float32))
        cos = np.sum(e_fp * e_q, -1) / (
            np.linalg.norm(e_fp, axis=-1) * np.linalg.norm(e_q, axis=-1))
        assert cos.min() > 0.99
        # causal contract: future tokens cannot change earlier EOT pooling —
        # append garbage AFTER EOT and the embedding must not move
        toks2 = np.asarray(toks).copy()
        row = toks2[0]
        eot = int(np.argmax(row))
        if eot + 2 < row.shape[0]:
            toks2[0, eot + 1:] = 3  # ids below EOT keep argmax at EOT
            e_q2 = np.asarray(qmodel.encode_text(jnp.asarray(toks2),
                                                 dtype=jnp.float32))
            np.testing.assert_allclose(e_q2[0], e_q[0], rtol=1e-5, atol=1e-5)

    def test_default_keeps_text_fp(self, tiny_clip):
        cfg, params = tiny_clip
        base = CLIP(params=params, cfg=cfg)
        qmodel = QuantizedCLIP(base)
        assert qmodel.text_q is None
        toks = self._tokens(cfg, 2)
        np.testing.assert_array_equal(
            np.asarray(qmodel.encode_text(toks, dtype=jnp.float32)),
            np.asarray(base.encode_text(toks, dtype=jnp.float32)))

    def test_debias_bundle_injection_preserved(self, tiny_clip):
        """DebiasCLIP + int8 text: the prompt array still injects (fp, at
        the embedding level) and the output tracks the fp debiased path."""
        from debias_vision_lang_tpu.core.config import DebiasConfig
        from debias_vision_lang_tpu.models.debias import (DebiasCLIP,
                                                          init_debias_tokens)

        cfg, params = tiny_clip
        dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=cfg.text.width)
        deb = init_debias_tokens(jax.random.key(0), params, dcfg) + 0.5
        model = DebiasCLIP(clip_params=params, debias_tokens=deb,
                           clip_cfg=cfg, debias_cfg=dcfg)
        qmodel = QuantizedCLIP(model, quantize_text=True)
        toks = self._tokens(cfg)
        e_fp = np.asarray(model.encode_text(toks, dtype=jnp.float32))
        e_q = np.asarray(qmodel.encode_text(toks, dtype=jnp.float32))
        cos = np.sum(e_fp * e_q, -1) / (
            np.linalg.norm(e_fp, axis=-1) * np.linalg.norm(e_q, axis=-1))
        assert cos.min() > 0.99
        # the prompts actually matter: zeroing them must move the output
        model0 = DebiasCLIP(clip_params=params,
                            debias_tokens=jnp.zeros_like(deb),
                            clip_cfg=cfg, debias_cfg=dcfg)
        e_q0 = np.asarray(QuantizedCLIP(model0, quantize_text=True)
                          .encode_text(toks, dtype=jnp.float32))
        assert np.abs(e_q0 - e_q).max() > 1e-3

    def test_resolve_compute_ladder(self, tiny_clip):
        from debias_vision_lang_tpu.ops.quant import resolve_compute

        cfg, params = tiny_clip
        base = CLIP(params=params, cfg=cfg)
        m8, act = resolve_compute(base, "int8")
        assert isinstance(m8, QuantizedCLIP) and m8.text_q is None
        m8t, act_t = resolve_compute(base, "int8-text")
        assert isinstance(m8t, QuantizedCLIP) and m8t.text_q is not None
        assert act == act_t == jnp.bfloat16
        with pytest.raises(ValueError, match="int8-text"):
            resolve_compute(base, "int4")

    def test_jit_as_pytree_with_text(self, tiny_clip):
        cfg, params = tiny_clip
        qmodel = QuantizedCLIP(CLIP(params=params, cfg=cfg),
                               quantize_text=True)
        toks = self._tokens(cfg, 2)

        @jax.jit
        def f(m, t):
            return m.encode_text(t, dtype=jnp.float32)

        out = np.asarray(f(qmodel, toks))
        np.testing.assert_allclose(
            out, np.asarray(qmodel.encode_text(toks, dtype=jnp.float32)),
            rtol=1e-5, atol=1e-6)


class TestResolveComputeAuto:
    """dtype='auto' + the ResNet int8 steer (round-4: the API must stop
    callers silently picking the measured-slower rung — PERF.md arch sweep:
    RN int8 = 0.90-0.93x of bf16; docs-only guidance doesn't reach code)."""

    def _vit_bundle(self, tiny_clip):
        cfg, params = tiny_clip
        return CLIP(params=params, cfg=cfg)

    def _rn_bundle(self):
        return _make_rn_bundle()

    def test_auto_picks_int8_on_vit(self, tiny_clip):
        from debias_vision_lang_tpu.ops.quant import resolve_compute

        model, dt = resolve_compute(self._vit_bundle(tiny_clip), "auto")
        assert isinstance(model, QuantizedCLIP)
        assert dt == jnp.bfloat16

    def test_auto_picks_bf16_on_resnet(self):
        from debias_vision_lang_tpu.ops.quant import resolve_compute

        base = self._rn_bundle()
        model, dt = resolve_compute(base, "auto")
        assert model is base  # NOT wrapped
        assert dt == jnp.bfloat16

    def test_auto_on_unknown_tower_falls_back_bf16(self):
        from debias_vision_lang_tpu.ops.quant import resolve_compute

        class Custom:  # a custom ClipLike without a discoverable cfg
            pass

        model, dt = resolve_compute(Custom(), "auto")
        assert isinstance(model, Custom) and dt == jnp.bfloat16

    def test_explicit_int8_on_resnet_warns_but_runs(self):
        from debias_vision_lang_tpu.ops.quant import resolve_compute

        with pytest.warns(UserWarning, match="0.90-0.93x"):
            model, dt = resolve_compute(self._rn_bundle(), "int8")
        assert isinstance(model, QuantizedCLIP)  # still honored
        assert dt == jnp.bfloat16

    def test_explicit_int8_on_vit_does_not_warn(self, tiny_clip):
        import warnings

        from debias_vision_lang_tpu.ops.quant import resolve_compute

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            model, _ = resolve_compute(self._vit_bundle(tiny_clip), "int8")
        assert isinstance(model, QuantizedCLIP)


class TestImplicitFp32Hint:
    """The fp32-default decision (docs/API.md "Precision ladder"): the
    default stays float32 for reference parity, but choosing itself on a
    TPU backend emits a one-line pointer at the measured ladder.  Explicit
    dtype="float32" must stay silent everywhere."""

    def test_hints_on_tpu_backend(self, monkeypatch):
        from debias_vision_lang_tpu.ops import quant

        monkeypatch.setattr(quant.jax, "default_backend", lambda: "tpu")
        with pytest.warns(UserWarning, match="dtype='auto'"):
            quant.hint_implicit_fp32("measure_bias")

    def test_silent_off_tpu(self, monkeypatch):
        import warnings

        from debias_vision_lang_tpu.ops import quant

        monkeypatch.setattr(quant.jax, "default_backend", lambda: "cpu")
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            quant.hint_implicit_fp32("measure_bias")

    def test_measure_bias_gate_is_omission_not_value(self, monkeypatch):
        """measure_bias hints iff 'dtype' is absent from opts — an explicit
        "float32" is the user's choice.  Exercised through the real entry
        point up to (and only up to) the opts-validation layer: a typo'd
        opt aborts the call right after the hint gate, so no dataset or
        model is needed."""
        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.ops import quant

        monkeypatch.setattr(quant.jax, "default_backend", lambda: "tpu")
        with pytest.warns(UserWarning, match="dtype='auto'"):
            with pytest.raises(ValueError, match="unknown measure_bias"):
                measure_bias(None, None, None, opts={"bogus_opt": 1})
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            with pytest.raises(ValueError, match="unknown measure_bias"):
                measure_bias(None, None, None,
                             opts={"dtype": "float32", "bogus_opt": 1})

    def test_measure_bias_rejects_empty_prompt_battery(self, monkeypatch):
        """An EMPTY opts['prompts'] must fail loudly up front, not silently
        fall back to the 319-prompt default battery (the numbers would be
        measured over the wrong sensitive set).  None is the documented
        "use the default battery" spelling (docs/API.md) and must pass the
        validation layer like an absent key."""
        from debias_vision_lang_tpu.eval.measure import measure_bias
        from debias_vision_lang_tpu.ops import quant

        monkeypatch.setattr(quant.jax, "default_backend", lambda: "cpu")
        for battery in ([], ()):
            with pytest.raises(ValueError, match="prompts.*is empty"):
                measure_bias(None, None, None,
                             opts={"dtype": "float32", "prompts": battery})
        # None sails through opts validation (the next failure is the
        # engine field of the EvalConfig resolving on a None model — any
        # non-prompts error proves the validation layer accepted it)
        with pytest.raises(Exception) as ei:
            measure_bias(None, None, None,
                         opts={"dtype": "float32", "prompts": None,
                               "dataset": "nonexistent-dataset"})
        assert "prompts" not in str(ei.value)
