"""Direct parity with the REFERENCE'S OWN metric code.

The strongest offline acceptance oracle available: load
``/root/reference/debias_clip/measuring_bias.py`` itself (read-only
checkout; its package-level imports stubbed — we execute only its two pure
pandas/numpy metric functions) and property-test our numpy oracle
(metrics/oracle.py) against it, including engineered boundary ties where
``nlargest(keep="all")`` extends the kept set.  This upgrades the
"exact transliteration" claim to a machine-checked equivalence.

Auto-skips where the reference checkout is absent (end-user machines).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/debias_clip/measuring_bias.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_mod():
    """Load the reference module with its package graph stubbed (gdown and
    the external `clip` package are not installed; we never call anything
    that needs them)."""
    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("debias_clip",
         PROMPT_DATA_PATH="/root/reference/data/prompt_templates.csv")
    stub("debias_clip.datasets", IATDataset=object, FairFace=object)
    stub("debias_clip.model")
    stub("debias_clip.model.model", ClipLike=object,
         model_loader=lambda *a, **k: None)
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_measuring_bias", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _cases():
    rng = np.random.default_rng(0)
    for n, c in [(40, 2), (137, 3), (64, 5)]:
        for quant in (0, 8, 2):  # 0 = continuous; else quantized → ties
            scores = rng.normal(size=n)
            if quant:
                scores = np.round(scores * quant) / quant
            # dense labels: every class present (the reference's
            # gen_labels asserts completeness, datasets.py:43)
            labels = np.concatenate(
                [np.arange(c), rng.integers(0, c, n - c)]).astype(np.int64)
            rng.shuffle(labels)
            yield scores, labels


class TestAgainstReferenceCode:
    def test_ndkl_matches(self, ref_mod):
        import pandas as pd

        from debias_vision_lang_tpu.metrics import oracle

        checked = 0
        for scores, labels in _cases():
            df = pd.DataFrame({"score": scores, "label": labels})
            n = len(scores)
            for top_n in (1, 5, n // 2, n):
                ref = ref_mod.normalized_discounted_KL(df, top_n)
                got = oracle.ndkl(scores, labels, top_n)
                for k, v in ref.items():
                    assert abs(got[k] - v) < 1e-10, (
                        f"{k}: ours {got[k]} != reference {v} "
                        f"(n={n}, top_n={top_n})")
                checked += 1
        assert checked == 36

    def test_maxskew_matches(self, ref_mod):
        import pandas as pd

        from debias_vision_lang_tpu.metrics import oracle

        checked = 0
        for scores, labels in _cases():
            df = pd.DataFrame({"score": scores, "label": labels})
            n = len(scores)
            for top_n in (1, 5, n // 2, n):
                ref = ref_mod.compute_skew_metrics(df, top_n)
                got = oracle.maxskew(scores, labels, top_n)
                for k, v in ref.items():
                    assert abs(got[k] - v) < 1e-12, (
                        f"{k}: ours {got[k]} != reference {v} "
                        f"(n={n}, top_n={top_n})")
                checked += 1
        assert checked == 36

    def test_tie_extension_against_reference(self, ref_mod):
        """All-equal scores: keep='all' keeps the ENTIRE set at any
        top_n — the sharpest tie edge."""
        import pandas as pd

        from debias_vision_lang_tpu.metrics import oracle

        n = 30
        scores = np.zeros(n)
        labels = np.array([i % 3 for i in range(n)], np.int64)
        df = pd.DataFrame({"score": scores, "label": labels})
        for top_n in (1, 7, n):
            ref_nd = ref_mod.normalized_discounted_KL(df, top_n)
            got_nd = oracle.ndkl(scores, labels, top_n)
            for k, v in ref_nd.items():
                assert abs(got_nd[k] - v) < 1e-10, (k, top_n)
            ref_sk = ref_mod.compute_skew_metrics(df, top_n)
            got_sk = oracle.maxskew(scores, labels, top_n)
            for k, v in ref_sk.items():
                assert abs(got_sk[k] - v) < 1e-12, (k, top_n)

    def test_gen_prompts_against_reference_generator(self, ref_mod):
        """Our prompt battery equals the reference's OWN generator run on
        the reference's own CSV (319 prompts, order included) — the
        fixture binds PROMPT_DATA_PATH to the reference file."""
        if not os.path.exists("/root/reference/data/prompt_templates.csv"):
            pytest.skip("reference CSV absent")

        from debias_vision_lang_tpu.eval.measure import gen_prompts

        ref_prompts = ref_mod.gen_prompts()
        assert len(ref_prompts) == 319
        assert gen_prompts() == ref_prompts

    def test_eval_ranking_matches_reference(self, ref_mod):
        """End-to-end eval_ranking vs the reference's own function (torch
        tensors in, per-prompt metric averaging, float-topn ceil, the
        evaluation-prefix key stripping) — both our oracle engine and the
        jitted TPU engine."""
        torch = pytest.importorskip("torch")

        from debias_vision_lang_tpu.eval.measure import eval_ranking

        rng = np.random.default_rng(3)
        n, d, n_prompts, c = 60, 8, 5, 3
        img = rng.normal(size=(n, d)).astype(np.float32)
        prompts = rng.normal(size=(n_prompts, d)).astype(np.float32)
        labels = np.concatenate(
            [np.arange(c), rng.integers(0, c, n - c)]).astype(np.int64)
        rng.shuffle(labels)
        for evaluation in ("maxskew", "ndkl"):
            for topn in (10, 0.25, 1.0):
                ref = ref_mod.eval_ranking(
                    labels, torch.from_numpy(img), torch.from_numpy(prompts),
                    evaluation, topn)
                for engine, atol in (("oracle", 1e-8), ("tpu", 2e-4)):
                    got = eval_ranking(labels, img, prompts, evaluation,
                                       topn, engine=engine)
                    assert set(got) == set(ref) == {"eq_opp", "dem_par"}
                    for k, v in ref.items():
                        assert abs(got[k] - v) < atol, (
                            evaluation, topn, engine, k, got[k], v)
