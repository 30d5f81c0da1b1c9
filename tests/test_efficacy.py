"""The trainer-efficacy proof: adversarial prompt tuning REDUCES measured
bias on a synthetic engineered-bias corpus, end-to-end through
``run_training`` (the framework's product claim — reference README.md:148-157
and the README metric table 0.233 → 0.113, README.md:32-36 — made
offline-testable; see train/efficacy.py for the construction).

Measured record (this exact config, seed 0, single-device CPU; PERF.md
"Trainer efficacy"):  NDKL 0.341 → 0.136 (-60%), MaxSkew@50 0.647 → 0.411
(-37%), concept-probe zero-shot accuracy 1.000 → 0.998.  The before-values
shift a few hundredths across float configurations (e.g. the 8-virtual-
device CPU mesh this suite runs under) — thresholds below leave margin.
"""

import numpy as np
import pytest

from debias_vision_lang_tpu.train.efficacy import (
    CONCEPTS,
    CTX,
    EOT,
    SOT,
    VOCAB,
    build_world,
    render_image,
    run_efficacy_experiment,
    sensitive_prompts,
    word_tokenize,
)

pytestmark = pytest.mark.slow  # full pretrain+train+eval: minutes on 1-core


class TestWorldConstruction:
    def test_tokenizer_contract(self):
        toks = word_tokenize(["a photo of a good person"])
        assert toks.shape == (1, CTX) and toks.dtype == np.int32
        assert toks[0, 0] == SOT
        # EOT is the max id — the EOT-argmax pooling trick
        # (reference model/model.py:265) must hold for this vocabulary
        assert toks[0].max() == EOT == VOCAB - 1
        assert int(np.argmax(toks[0])) == 7  # SOT + 6 words + EOT

    def test_images_carry_both_factors(self):
        rng = np.random.default_rng(0)
        f = render_image(1, 0, rng).astype(np.int32)
        m = render_image(0, 0, rng).astype(np.int32)
        # gender: left-half red vs blue tint
        assert f[:, :16, 0].mean() - f[:, :16, 2].mean() > 80
        assert m[:, :16, 2].mean() - m[:, :16, 0].mean() > 80
        c0 = render_image(0, 0, rng).astype(np.int32)
        c1 = render_image(0, 1, rng).astype(np.int32)
        # concept: green vs magenta right-half tint
        g0 = c0[:, 16:, 1].mean() - (c0[:, 16:, 0].mean() + c0[:, 16:, 2].mean()) / 2
        g1 = c1[:, 16:, 1].mean() - (c1[:, 16:, 0].mean() + c1[:, 16:, 2].mean()) / 2
        assert g0 > 80 and g1 < -40

    def test_world_layout(self, tmp_path):
        world = build_world(str(tmp_path), n_train=8, n_val=4, seed=0)
        from debias_vision_lang_tpu.data.datasets import FairFace
        from debias_vision_lang_tpu.data.pairs import ImageCaptionPairs

        tr = FairFace(mode="train", iat_type="gender",
                      data_path=world["fairface"])
        assert "concept" in tr.labels.columns
        pairs = ImageCaptionPairs(world["pairs"], image_size=32)
        assert len(pairs) == 8
        img = pairs.load_image(0)
        assert img.shape == (32, 32, 3)
        # every pairs caption tokenizes under the strict vocabulary
        word_tokenize(list(pairs.captions["caption"]))

    def test_planted_cooccurrence_skew(self, tmp_path):
        world = build_world(str(tmp_path), n_train=256, n_val=4, seed=0)
        from debias_vision_lang_tpu.train.efficacy import FEMALE_ADJS

        fem_adj_fem_img = fem_adj_total = 0
        import pandas as pd

        labels = pd.read_csv(
            f"{world['fairface']}/labels/train/train_labels.csv")
        for cap, gender in zip(world["train_captions"], labels["gender"]):
            words = set(cap.split())
            if words & set(FEMALE_ADJS):
                fem_adj_total += 1
                fem_adj_fem_img += gender == "Female"
        assert fem_adj_total > 20  # adjectives actually present
        assert fem_adj_fem_img / fem_adj_total > 0.7  # and gender-skewed


class TestEfficacy:
    def test_training_reduces_measured_bias(self, tmp_path):
        """The headline experiment: run the REAL run_training on the
        engineered-bias world and assert the framework's own metrics drop
        materially while zero-shot alignment survives (the reference's
        68.1 → 67.6 contract in miniature)."""
        out = run_efficacy_experiment(str(tmp_path), seed=0, progress=False)
        before, after = out["before"], out["after"]

        # the plant took: material initial bias (else the test is vacuous)
        assert before["ndkl_eq_opp"] > 0.2, before
        assert before["maxskew@50_eq_opp"] > 0.3, before
        # and an aligned model: the concept probe works at init (0.85 =
        # well above the 0.5 chance level; the tiny 2-layer tower lands
        # 0.92-1.00 depending on the host's float configuration)
        assert before["probe_acc"] >= 0.85, before

        # the product claim: adversarial training reduces measured bias
        assert after["ndkl_eq_opp"] < 0.6 * before["ndkl_eq_opp"], (before,
                                                                    after)
        assert after["maxskew@50_eq_opp"] < before["maxskew@50_eq_opp"]
        # without collapsing image-text alignment
        assert after["probe_acc"] >= before["probe_acc"] - 0.05

        # best-NDKL selection: the in-training eval curve must itself show
        # a material improvement over its first evaluation (strict — the
        # old `min(curve) <= curve[0]` was vacuously true by definition)
        curve = [c["ndkl_eq_opp"] for c in out["curve"]]
        assert len(curve) >= 3
        assert min(curve) < 0.9 * curve[0], curve

        # prompts for the record: 8 adjectives, reference-style template
        assert len(sensitive_prompts()) == 8
        assert len(CONCEPTS) == 2
