import numpy as np
import pytest
from PIL import Image

from debias_vision_lang_tpu.vision.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    Preprocess,
    preprocess_batch,
    preprocess_host_exact,
    resize_bicubic,
    resize_bicubic_pil_exact,
    resize_output_size,
    resize_weights,
    to_rgb_array,
)


class TestResizeWeights:
    def test_rows_normalized(self):
        w = resize_weights(300, 224)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)

    def test_identity_when_same_size(self):
        w = resize_weights(224, 224)
        np.testing.assert_allclose(w, np.eye(224), atol=1e-6)

    def test_shape(self):
        assert resize_weights(448, 224).shape == (224, 448)


class TestResizeOutputSize:
    def test_short_side_semantics(self):
        # torchvision TRUNCATES the long side: int(224 * 400 / 300) = 298
        assert resize_output_size(300, 400, 224) == (224, 298)
        assert resize_output_size(400, 300, 224) == (298, 224)

    def test_truncation_matches_torchvision(self):
        # _compute_resized_output_size uses int(size * long / short)
        for (h, w) in [(300, 421), (129, 500), (333, 500), (97, 311)]:
            rh, rw = resize_output_size(h, w, 224)
            short, long = (h, w) if h <= w else (w, h)
            expect_long = int(224 * long / short)
            assert max(rh, rw) == expect_long

    def test_short_circuit(self):
        # torchvision skips when short side already matches
        assert resize_output_size(224, 224, 224) == (224, 224)
        assert resize_output_size(224, 500, 224) == (224, 500)


def _pil_resize(arr, out_w, out_h):
    return np.asarray(Image.fromarray(arr).resize((out_w, out_h), Image.BICUBIC))


class TestPILParity:
    @pytest.mark.parametrize("in_size,out_size", [(300, 224), (448, 224), (100, 224), (224, 288)])
    def test_bicubic_matches_pil(self, rng, in_size, out_size):
        arr = rng.integers(0, 256, (in_size, in_size, 3), dtype=np.uint8)
        ours = np.asarray(
            resize_bicubic(arr[None].astype(np.float32), out_size, out_size,
                           emulate_uint8_rounding=True)
        )[0]
        ref = _pil_resize(arr, out_size, out_size).astype(np.float32)
        # PIL uses fixed-point coefficients; float path agrees within 1 LSB
        assert np.abs(ours - ref).max() <= 1.0 + 1e-4

    def test_non_square(self, rng):
        arr = rng.integers(0, 256, (180, 320, 3), dtype=np.uint8)
        ours = np.asarray(
            resize_bicubic(arr[None].astype(np.float32), 224, 398,
                           emulate_uint8_rounding=True)
        )[0]
        ref = _pil_resize(arr, 398, 224).astype(np.float32)
        assert np.abs(ours - ref).max() <= 1.0 + 1e-4


class TestPILBitExact:
    """The host path must be BIT-exact (0 LSB) vs PIL's uint8 fixed-point
    resample — the offline-verifiable prerequisite for golden-prob parity."""

    @pytest.mark.parametrize("shape,out", [
        ((300, 400), (224, 298)),   # downsample
        ((196, 198), (224, 226)),   # upsample (woman.jpg geometry)
        ((500, 333), (336, 224)),
        ((224, 160), (313, 224)),
    ])
    def test_resize_bit_exact_vs_pil(self, rng, shape, out):
        arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(arr).resize((out[1], out[0]), Image.BICUBIC))
        got = resize_bicubic_pil_exact(arr, out[0], out[1])
        assert np.array_equal(ref, got)

    def test_resize_bit_exact_fuzz(self, rng):
        """Property fuzz: 40 random (in, out) geometries — odd sizes,
        extreme aspect ratios, 1-pixel edges, up/down in each axis — every
        one bit-identical to PIL."""
        for _ in range(40):
            h = int(rng.integers(1, 96))
            w = int(rng.integers(1, 96))
            oh = int(rng.integers(1, 96))
            ow = int(rng.integers(1, 96))
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ref = np.asarray(
                Image.fromarray(arr).resize((ow, oh), Image.BICUBIC))
            got = resize_bicubic_pil_exact(arr, oh, ow)
            assert np.array_equal(ref, got), (h, w, oh, ow)

    @pytest.mark.parametrize("name", ["woman.jpg", "man.jpg"])
    def test_reference_figures_bit_exact(self, name):
        import os
        path = f"/root/reference/figures/{name}"
        if not os.path.exists(path):
            pytest.skip("reference figures not available")
        img = Image.open(path)
        arr = to_rgb_array(img)
        h, w = arr.shape[:2]
        rh, rw = resize_output_size(h, w, 224)
        ref = np.asarray(img.convert("RGB").resize((rw, rh), Image.BICUBIC))
        got = resize_bicubic_pil_exact(arr, rh, rw)
        assert np.array_equal(ref, got), (
            f"max err {np.abs(ref.astype(int) - got.astype(int)).max()} LSB")

    def test_full_chain_bit_exact(self, rng):
        """preprocess_host_exact == PIL resize + torchvision crop + float32
        ToTensor/Normalize, bit-for-bit."""
        import torch
        for (h, w) in [(320, 280), (196, 198), (64, 100), (224, 224)]:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            img = Image.fromarray(arr)
            rh, rw = resize_output_size(h, w, 224)
            if (rh, rw) != (h, w):
                img = img.resize((rw, rh), Image.BICUBIC)
            a = np.asarray(img)
            if rh < 224 or rw < 224:
                ph, pw = max(224 - rh, 0), max(224 - rw, 0)
                a = np.pad(a, ((ph // 2, (ph + 1) // 2),
                               (pw // 2, (pw + 1) // 2), (0, 0)))
            hh, ww_ = a.shape[:2]
            top = int(round((hh - 224) / 2.0))
            left = int(round((ww_ - 224) / 2.0))
            a = a[top:top + 224, left:left + 224]
            t = torch.from_numpy(a.copy()).to(torch.float32).div(255)
            t = t.sub(torch.as_tensor(CLIP_MEAN)).div(torch.as_tensor(CLIP_STD))
            ref = t.numpy()
            got = preprocess_host_exact(arr, 224)
            assert np.array_equal(ref, got), (h, w)


class TestPreprocessBatch:
    def test_output_shape_layout(self, rng):
        imgs = rng.integers(0, 256, (4, 300, 300, 3), dtype=np.uint8)
        out = np.asarray(preprocess_batch(imgs, 224))
        assert out.shape == (4, 224, 224, 3)

    def test_normalization_constants(self):
        # a constant image of exactly the mean must map to ~0
        mean_img = np.tile(
            (np.array(CLIP_MEAN) * 255.0).astype(np.uint8), (1, 224, 224, 1)
        )
        out = np.asarray(preprocess_batch(mean_img, 224))
        assert np.abs(out).max() < 0.02  # uint8 quantization slack

    def test_identity_resize_path(self, rng):
        # FairFace images are already 224×224: only crop+normalize applies
        imgs = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
        out = np.asarray(preprocess_batch(imgs, 224))
        expected = (imgs.astype(np.float32) / 255.0 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_upscale_pad_crop(self, rng):
        imgs = rng.integers(0, 256, (1, 100, 80, 3), dtype=np.uint8)
        out = np.asarray(preprocess_batch(imgs, 224))
        assert out.shape == (1, 224, 224, 3)


class TestPerImageWrapper:
    def test_pil_input(self, rng):
        arr = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        pre = Preprocess(224)
        out = pre(Image.fromarray(arr))
        assert out.shape == (224, 224, 3)
        assert out.dtype == np.float32

    def test_grayscale_converted(self, rng):
        arr = rng.integers(0, 256, (256, 256), dtype=np.uint8)
        out = Preprocess(224)(Image.fromarray(arr, mode="L"))
        assert out.shape == (224, 224, 3)

    def test_full_chain_vs_pil_oracle(self, rng):
        """End-to-end vs PIL resize + crop + normalize (the reference chain)."""
        arr = rng.integers(0, 256, (320, 280, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        # oracle: torchvision semantics via PIL
        rh, rw = resize_output_size(320, 280, 224)
        ref = np.asarray(img.resize((rw, rh), Image.BICUBIC)).astype(np.float32)
        top = int(round((rh - 224) / 2.0))
        left = int(round((rw - 224) / 2.0))
        ref = ref[top : top + 224, left : left + 224]
        ref = (ref / 255.0 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
        ours = Preprocess(224)(img)
        assert np.abs(ours - ref).max() <= (1.0 / 255.0) / min(CLIP_STD) + 1e-4


class TestPatchifyU8:
    """Host patch-contiguous staging layout (the exact int8 stem's input —
    ops/quant.py::patch_embed_q_p8; native writer in native/ingest.cc)."""

    def test_matches_manual_patch_extraction(self, rng):
        from debias_vision_lang_tpu.vision.preprocess import patchify_u8

        arr = rng.integers(0, 256, (2, 12, 12, 3), dtype=np.uint8)
        out = patchify_u8(arr, 4)
        assert out.shape == (2, 9, 4 * 4 * 3)
        assert out.dtype == np.uint8
        for b in range(2):
            for gy in range(3):
                for gx in range(3):
                    patch = arr[b, gy * 4:(gy + 1) * 4, gx * 4:(gx + 1) * 4]
                    np.testing.assert_array_equal(
                        out[b, gy * 3 + gx], patch.reshape(-1))

    def test_single_image_form(self, rng):
        from debias_vision_lang_tpu.vision.preprocess import patchify_u8

        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        one = patchify_u8(arr, 8)
        batched = patchify_u8(arr[None], 8)
        assert one.shape == (4, 8 * 8 * 3)
        np.testing.assert_array_equal(one, batched[0])

    def test_matches_quant_patchify_ordering(self, rng):
        """Same element ordering as the device-side _patchify the int8 stem
        contracts over — the two layouts must agree or the staged stem would
        silently permute patch pixels."""
        import jax.numpy as jnp

        from debias_vision_lang_tpu.ops.quant import _patchify
        from debias_vision_lang_tpu.vision.preprocess import patchify_u8

        arr = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        dev = np.asarray(_patchify(jnp.asarray(arr, jnp.float32), 8))
        host = patchify_u8(arr, 8).astype(np.float32)
        np.testing.assert_array_equal(host, dev)
