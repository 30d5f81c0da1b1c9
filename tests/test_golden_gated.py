"""Golden-value acceptance tests — the reference's de-facto test oracle
(README probabilities for figures/woman.jpg + man.jpg, README.md:63-75, and
the headline metric table).  These need the real CLIP weights / BPE vocab /
pretrained prompt checkpoint, which require network to fetch; each test
auto-skips when its asset is absent and runs on asset-provisioned machines.
"""

import os

import numpy as np
import pytest

from debias_vision_lang_tpu.core.paths import BPE_VOCAB_PATH, CACHE_PATH

HAVE_VOCAB = os.path.exists(BPE_VOCAB_PATH)
WEIGHTS_DIR = os.environ.get("DEBIAS_VLT_WEIGHTS_DIR")
REFERENCE_FIGURES = "/root/reference/figures"
HAVE_FIGURES = os.path.exists(os.path.join(REFERENCE_FIGURES, "woman.jpg"))


def _have_base_weights() -> bool:
    if WEIGHTS_DIR and any(
        f.startswith("oai-clip-vit-b-16") for f in os.listdir(WEIGHTS_DIR)
    ):
        return True
    try:  # HF cache present?
        from transformers import CLIPModel

        CLIPModel.from_pretrained("openai/clip-vit-base-patch16",
                                  local_files_only=True)
        return True
    except Exception:
        return False


requires_assets = pytest.mark.skipif(
    not (HAVE_VOCAB and HAVE_FIGURES and _have_base_weights()),
    reason="real CLIP weights / BPE vocab not present (network-gated assets)",
)


@requires_assets
class TestReadmeGoldenProbs:
    """Golden outputs from README.md:63-75 within fp32 tolerance."""

    PROMPTS = ["a photo of a smart person", "a photo of a dumb person"]

    def _probs(self, model, preprocess, tokenizer, fname):
        import jax
        from PIL import Image

        img = preprocess(Image.open(os.path.join(REFERENCE_FIGURES, fname)))
        logits, _ = model(img[None], tokenizer(self.PROMPTS))
        return np.asarray(jax.nn.softmax(logits, axis=-1))[0]

    def test_vanilla_clip_probs(self):
        from debias_vision_lang_tpu.models.loader import model_loader

        model, preprocess, tokenizer, _ = model_loader("openai/CLIP/ViT-B/16")
        probs = self._probs(model, preprocess, tokenizer, "woman.jpg")
        np.testing.assert_allclose(probs, [0.32719618, 0.6728038], atol=5e-3)
        probs = self._probs(model, preprocess, tokenizer, "man.jpg")
        np.testing.assert_allclose(probs, [0.2949169, 0.70508313], atol=5e-3)

    def test_debiased_probs(self):
        import debias_vision_lang_tpu as debias_clip

        model, preprocess = debias_clip.load("ViT-B/16-gender")
        tokenizer = debias_clip.load_tokenizer()
        probs = self._probs(model, preprocess, tokenizer, "woman.jpg")
        np.testing.assert_allclose(probs, [0.47607774, 0.5239223], atol=5e-3)
        probs = self._probs(model, preprocess, tokenizer, "man.jpg")
        np.testing.assert_allclose(probs, [0.43179944, 0.5682006], atol=5e-3)


@pytest.mark.skipif(not HAVE_VOCAB, reason="real BPE vocab absent")
class TestRealVocabProperties:
    def test_eot_trick_on_real_prompts(self):
        from debias_vision_lang_tpu.eval.measure import gen_prompts
        from debias_vision_lang_tpu.text.tokenizer import load_tokenizer

        tok = load_tokenizer()
        ids = tok(gen_prompts())
        assert ids.shape == (319, 77)
        for row in ids:
            assert row[int(np.argmax(row))] == 49407
