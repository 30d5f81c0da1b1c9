"""Adversarial training loop tests: losses, alternating dynamics, freezing,
checkpoint round-trips, reference-format export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debias_vision_lang_tpu.core.config import (
    AdversaryConfig,
    CLIPConfig,
    DebiasConfig,
    TextConfig,
    TrainConfig,
    VisionConfig,
)
from debias_vision_lang_tpu.models.adversary import Adversary, init_adversary_params
from debias_vision_lang_tpu.models.clip import init_clip_params
from debias_vision_lang_tpu.models.debias import DebiasCLIP, init_debias_tokens
from debias_vision_lang_tpu.train.adversarial import (
    AdversarialTrainer,
    clip_contrastive_loss,
    sigmoid_bce,
    similarity_scores,
)

CTX = 16
VOCAB = 128


pytestmark = pytest.mark.slow  # multi-minute on 1-core hosts; run with -m '' for the full gate

@pytest.fixture(scope="module")
def setup():
    cfg = CLIPConfig(
        name="tiny",
        vision=VisionConfig(kind="vit", image_size=16, patch_size=8, width=32,
                            layers=2, heads=2, embed_dim=16),
        text=TextConfig(vocab_size=VOCAB, context_length=CTX, width=32,
                        layers=2, heads=2, embed_dim=16),
    )
    params = init_clip_params(jax.random.key(0), cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=32, max_tokens=CTX)
    deb = init_debias_tokens(jax.random.key(1), params, dcfg,
                             tokenizer=None)
    model = DebiasCLIP(clip_params=params, debias_tokens=deb, clip_cfg=cfg,
                       debias_cfg=dcfg)
    n_prompts = 6
    adv = Adversary(
        params=init_adversary_params(
            jax.random.key(2), AdversaryConfig(n_input=n_prompts, hidden_size=8)),
        cfg=AdversaryConfig(n_input=n_prompts, hidden_size=8),
    )
    rng = np.random.default_rng(0)
    sens = np.zeros((n_prompts, CTX), np.int32)
    sens[:, 0] = VOCAB - 2
    sens[:, 1] = rng.integers(1, 100, n_prompts)
    sens[:, 2] = VOCAB - 1
    return model, adv, sens


def _batch(rng, b=8):
    images = rng.normal(size=(b, 16, 16, 3)).astype(np.float32)
    labels = (rng.random(b) < 0.5).astype(np.float32)
    cap_images = rng.normal(size=(b, 16, 16, 3)).astype(np.float32)
    cap_tokens = np.zeros((b, CTX), np.int32)
    cap_tokens[:, 0] = VOCAB - 2
    cap_tokens[:, 1] = rng.integers(1, 100, b)
    cap_tokens[:, 2] = VOCAB - 1
    return images, labels, cap_images, cap_tokens


class TestLosses:
    def test_sigmoid_bce_matches_manual(self, rng):
        logits = jnp.asarray(rng.normal(size=8).astype(np.float32))
        labels = jnp.asarray((rng.random(8) < 0.5).astype(np.float32))
        p = 1 / (1 + np.exp(-np.asarray(logits)))
        manual = -np.mean(np.asarray(labels) * np.log(p)
                          + (1 - np.asarray(labels)) * np.log(1 - p))
        np.testing.assert_allclose(float(sigmoid_bce(logits, labels)), manual,
                                   atol=1e-5)

    def test_contrastive_loss_identity_alignment(self):
        # perfectly aligned pairs with high scale → near-zero loss
        embs = jnp.eye(4, 8)
        loss = clip_contrastive_loss(embs, embs, jnp.log(100.0))
        assert float(loss) < 1e-3

    def test_contrastive_loss_misaligned_higher(self, rng):
        embs = jnp.eye(4, 8)
        shuffled = embs[jnp.asarray([1, 0, 3, 2])]
        aligned = clip_contrastive_loss(embs, embs, jnp.log(10.0))
        mis = clip_contrastive_loss(embs, shuffled, jnp.log(10.0))
        assert float(mis) > float(aligned)

    def test_similarity_scores_shape(self, rng):
        img = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
        txt = jnp.asarray(rng.normal(size=(7, 16)).astype(np.float32))
        s = similarity_scores(img, txt, jnp.asarray(0.0))
        assert s.shape == (5, 7)
        # cosine bound (scale=1)
        assert np.abs(np.asarray(s)).max() <= 1.0 + 1e-5


class TestTrainerDynamics:
    def test_adversary_learns(self, setup):
        """On a separable task (labels correlated with embeddings), adversary
        BCE decreases over updates."""
        model, adv, sens = setup
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        rng = np.random.default_rng(3)
        images, labels, cap_i, cap_t = _batch(rng, b=16)
        first = None
        for i in range(12):
            m = trainer.step(images, labels, cap_i, cap_t)
            if first is None:
                first = m["adversary_bce"]
        assert m["adversary_bce"] < first  # adversary improved on fixed batch

    def test_prompt_tokens_update(self, setup):
        model, adv, sens = setup
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        before = np.asarray(trainer.model.debias_tokens).copy()
        rng = np.random.default_rng(4)
        trainer.step(*_batch(rng))
        after = np.asarray(trainer.model.debias_tokens)
        assert np.abs(after - before).max() > 0

    def test_clip_params_frozen(self, setup):
        """Only the prompt array and adversary train; the CLIP tower must be
        bit-identical after steps (reference default freezing)."""
        model, adv, sens = setup
        before = jax.tree.map(lambda x: np.asarray(x).copy(), model.clip_params)
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        rng = np.random.default_rng(5)
        for _ in range(3):
            trainer.step(*_batch(rng))
        after = trainer.model.clip_params
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_adversary_cadence(self, setup):
        model, adv, sens = setup
        cfg = TrainConfig(adversary_steps_per_prompt_step=3)
        trainer = AdversarialTrainer.create(model, adv, cfg, sens,
                                            use_pallas=False)
        rng = np.random.default_rng(6)
        m = trainer.step(*_batch(rng))
        assert m["step"] == 1 and np.isfinite(m["adversary_bce"])

    def test_adversary_cadence_zero_freezes(self, setup):
        """cadence 0 = frozen adversary: the step must complete (prompt
        still updates), adversary params stay bit-identical, and the BCE
        metric reports NaN rather than crashing on float(None)."""
        model, adv, sens = setup
        cfg = TrainConfig(adversary_steps_per_prompt_step=0)
        trainer = AdversarialTrainer.create(model, adv, cfg, sens,
                                            use_pallas=False)
        adv_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                                  trainer.adversary_params)
        tok_before = np.asarray(trainer.model.debias_tokens).copy()
        rng = np.random.default_rng(13)
        m = trainer.step(*_batch(rng))
        assert m["step"] == 1 and np.isnan(m["adversary_bce"])
        for a, b in zip(jax.tree.leaves(adv_before),
                        jax.tree.leaves(trainer.adversary_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(trainer.model.debias_tokens)
                      - tok_before).max() > 0

    def test_adversary_cadence_negative_rejected(self, setup):
        model, adv, sens = setup
        cfg = TrainConfig(adversary_steps_per_prompt_step=-1)
        trainer = AdversarialTrainer.create(model, adv, cfg, sens,
                                            use_pallas=False)
        rng = np.random.default_rng(14)
        with pytest.raises(ValueError, match=">= 0"):
            trainer.step(*_batch(rng))

    def test_schedule_and_clip_step(self, setup):
        """warmup_cosine + grad clipping through the full trainer: the first
        step's prompt update is exactly zero (lr starts at 0), the second
        is not, and losses stay finite."""
        model, adv, sens = setup
        cfg = TrainConfig(lr_schedule="warmup_cosine", warmup_steps=5,
                          decay_steps=50, grad_clip_norm=1.0)
        trainer = AdversarialTrainer.create(model, adv, cfg, sens,
                                            use_pallas=False)
        rng = np.random.default_rng(11)
        before = np.asarray(trainer.model.debias_tokens).copy()
        m = trainer.step(*_batch(rng))
        assert np.isfinite(m["loss"]) and np.isfinite(m["adversary_bce"])
        np.testing.assert_array_equal(
            np.asarray(trainer.model.debias_tokens), before)
        trainer.step(*_batch(rng))
        assert np.abs(np.asarray(trainer.model.debias_tokens)
                      - before).max() > 0

    def test_best_ndkl_selection(self, setup):
        model, adv, sens = setup
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        assert trainer.maybe_update_best(0.5) is True
        tok_at_best = np.asarray(trainer.model.debias_tokens).copy()
        assert trainer.maybe_update_best(0.7) is False  # worse → keep best
        assert trainer.maybe_update_best(0.3) is True
        np.testing.assert_allclose(trainer.best_tokens, tok_at_best)
        assert trainer.best_ndkl == 0.3


class TestCheckpointing:
    def test_orbax_roundtrip(self, setup, tmp_path):
        from debias_vision_lang_tpu.train.state import (
            restore_checkpoint, save_checkpoint)

        model, adv, sens = setup
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        rng = np.random.default_rng(7)
        trainer.step(*_batch(rng))
        trainer.maybe_update_best(0.42)
        path = save_checkpoint(str(tmp_path / "ckpt"), trainer)

        trainer2 = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                             use_pallas=False)
        restore_checkpoint(path, trainer2)
        np.testing.assert_allclose(
            np.asarray(trainer2.model.debias_tokens),
            np.asarray(trainer.model.debias_tokens))
        assert trainer2.step_count == 1
        assert trainer2.best_ndkl == pytest.approx(0.42)
        np.testing.assert_allclose(trainer2.best_tokens, trainer.best_tokens)

    def test_mismatched_optimizer_config_actionable_error(self, setup,
                                                          tmp_path):
        """Resuming with a different optimizer structure (e.g. grad clipping
        added after the save) fails with a message naming TrainConfig, not
        an opaque orbax tree error."""
        from debias_vision_lang_tpu.train.state import (
            restore_checkpoint, save_checkpoint)

        model, adv, sens = setup
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        trainer.step(*_batch(np.random.default_rng(8)))
        path = save_checkpoint(str(tmp_path / "ckpt"), trainer)

        changed = AdversarialTrainer.create(
            model, adv, TrainConfig(grad_clip_norm=1.0), sens,
            use_pallas=False)
        with pytest.raises(ValueError, match="TrainConfig"):
            restore_checkpoint(path, changed)

    def test_reference_pt_export(self, setup, tmp_path):
        import torch

        from debias_vision_lang_tpu.train.state import export_reference_pt

        model, adv, sens = setup
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        trainer.maybe_update_best(0.1)
        path = export_reference_pt(trainer, str(tmp_path / "best.pt"))
        t = torch.load(path, map_location="cpu", weights_only=True)
        assert tuple(t.shape) == (2, 32)  # bare [P, width] tensor


class TestMulticlassAdversary:
    def test_race_debiasing_loop(self, setup):
        """n_output=7 adversary (race): softmax-CE path, full step runs."""
        from debias_vision_lang_tpu.core.config import AdversaryConfig
        from debias_vision_lang_tpu.models.adversary import (
            Adversary, init_adversary_params)

        model, _, sens = setup
        acfg = AdversaryConfig(n_input=sens.shape[0], n_output=7, hidden_size=8)
        adv = Adversary(params=init_adversary_params(jax.random.key(9), acfg),
                        cfg=acfg)
        trainer = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                            use_pallas=False)
        rng = np.random.default_rng(11)
        images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
        labels = rng.integers(0, 7, 8).astype(np.float32)  # class ids
        cap_images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
        cap_tokens = np.zeros((8, CTX), np.int32)
        cap_tokens[:, 0], cap_tokens[:, 1], cap_tokens[:, 2] = VOCAB - 2, 4, VOCAB - 1
        m = trainer.step(images, labels, cap_images, cap_tokens)
        assert np.isfinite(m["loss"]) and np.isfinite(m["adversary_bce"])

        # adversary-only updates (prompts held fixed) must reduce the CE
        img_embs = trainer.fns.embed_images(model.clip_params,
                                            jnp.asarray(images))
        scores = trainer.fns.eval_scores(model.clip_params,
                                         model.debias_tokens, img_embs)
        lbls = jnp.asarray(labels)
        ap, ast = trainer.adversary_params, trainer.adv_opt_state
        first = last = None
        for _ in range(10):
            ap, ast, loss = trainer.fns.adversary_step(ap, ast, scores, lbls)
            first = first if first is not None else float(loss)
            last = float(loss)
        assert last < first


class TestEmbedDtype:
    """train_cfg.embed_dtype: the frozen image tower's compute precision."""

    def test_bf16_embed_close_to_fp32(self, setup):
        model, adv, sens = setup
        t32 = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                        use_pallas=False)
        t16 = AdversarialTrainer.create(
            model, adv, TrainConfig(embed_dtype="bfloat16"), sens,
            use_pallas=False)
        rng = np.random.default_rng(5)
        images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
        e32 = np.asarray(t32.fns.embed_images(model.clip_params,
                                              jnp.asarray(images)))
        e16 = np.asarray(t16.fns.embed_images(model.clip_params,
                                              jnp.asarray(images)))
        assert e16.dtype == np.float32  # upcast on exit either way
        cos = np.sum(e32 * e16, -1) / (
            np.linalg.norm(e32, axis=-1) * np.linalg.norm(e16, axis=-1))
        assert cos.min() > 0.99  # bf16 rounding only

    def test_bf16_full_step_finite(self, setup):
        model, adv, sens = setup
        trainer = AdversarialTrainer.create(
            model, adv, TrainConfig(embed_dtype="bfloat16"), sens,
            use_pallas=False)
        rng = np.random.default_rng(6)
        images, labels, cap_images, cap_tokens = _batch(rng)
        before = np.asarray(trainer.model.debias_tokens)
        m = trainer.step(images, labels, cap_images, cap_tokens)
        assert np.isfinite(m["loss"]) and np.isfinite(m["adversary_bce"])
        assert not np.allclose(before, np.asarray(trainer.model.debias_tokens))

    def test_bf16_train_dtype_matches_fp32_dynamics(self, setup):
        """Mixed-precision prompt step: loss close to fp32, update correlated,
        and grads/optimizer state remain fp32 (cast-in/cast-out contract)."""
        model, adv, sens = setup
        rng = np.random.default_rng(7)
        images, labels, cap_images, cap_tokens = _batch(rng)

        results = {}
        for td in ("float32", "bfloat16"):
            tr = AdversarialTrainer.create(
                model, adv, TrainConfig(train_dtype=td), sens,
                use_pallas=False)
            before = np.asarray(tr.model.debias_tokens)
            m = tr.step(images, labels, cap_images, cap_tokens)
            after = np.asarray(tr.model.debias_tokens)
            assert after.dtype == np.float32
            results[td] = (m["loss"], after - before)

        l32, u32 = results["float32"]
        l16, u16 = results["bfloat16"]
        # Tolerances are wide on purpose: a 2-layer width-32 random tower
        # amplifies bf16 rounding through the exp(logit_scale)-scaled
        # adversarial sigmoid (measured here: ~11% loss shift, cos≈0.69).
        # At real scale the option is tight — ViT-B/16 batch-256 losses match
        # fp32 to 4 decimals (PERF.md, benchmarks/train_step.py).
        assert abs(l16 - l32) < 0.2 * (abs(l32) + 1e-6)
        cos = float(np.sum(u32 * u16) /
                    (np.linalg.norm(u32) * np.linalg.norm(u16)))
        assert cos > 0.5

    def test_int8_embed_dtype(self, setup):
        """embed_dtype='int8': frozen tower quantizes in-jit from cp; full
        step runs and embeddings stay close to fp32."""
        model, adv, sens = setup
        t8 = AdversarialTrainer.create(
            model, adv, TrainConfig(embed_dtype="int8"), sens,
            use_pallas=False)
        t32 = AdversarialTrainer.create(model, adv, TrainConfig(), sens,
                                        use_pallas=False)
        rng = np.random.default_rng(8)
        images, labels, cap_images, cap_tokens = _batch(rng)
        e8 = np.asarray(t8.fns.embed_images(model.clip_params,
                                            jnp.asarray(images)))
        e32 = np.asarray(t32.fns.embed_images(model.clip_params,
                                              jnp.asarray(images)))
        cos = np.sum(e8 * e32, -1) / (
            np.linalg.norm(e8, axis=-1) * np.linalg.norm(e32, axis=-1))
        assert cos.min() > 0.97  # tiny random tower: int8+bf16 rounding
        m = t8.step(images, labels, cap_images, cap_tokens)
        assert np.isfinite(m["loss"]) and np.isfinite(m["adversary_bce"])
