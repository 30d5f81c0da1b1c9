"""Layer-training mode: top-N resblocks / projections update under the
freezing policy; everything else stays bit-identical."""

import dataclasses

import jax
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
from debias_vision_lang_tpu.train.adversarial import AdversarialTrainer

CTX, VOCAB = 16, 128


pytestmark = pytest.mark.slow  # multi-minute on 1-core hosts; run with -m '' for the full gate

def make_model(**debias_kw):
    cfg = CLIPConfig(
        name="tiny",
        vision=VisionConfig(kind="vit", image_size=16, patch_size=8, width=32,
                            layers=2, heads=2, embed_dim=16),
        text=TextConfig(vocab_size=VOCAB, context_length=CTX, width=32,
                        layers=2, heads=2, embed_dim=16),
    )
    params = init_clip_params(jax.random.key(0), cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=32, max_tokens=CTX,
                        **debias_kw)
    deb = init_debias_tokens(jax.random.key(1), params, dcfg)
    return DebiasCLIP(clip_params=params, debias_tokens=deb, clip_cfg=cfg,
                      debias_cfg=dcfg)


def make_adversary(n):
    cfg = AdversaryConfig(n_input=n, hidden_size=8)
    return Adversary(params=init_adversary_params(jax.random.key(2), cfg), cfg=cfg)


def sens_tokens(n):
    rng = np.random.default_rng(0)
    t = np.zeros((n, CTX), np.int32)
    t[:, 0] = VOCAB - 2
    t[:, 1] = rng.integers(1, 100, n)
    t[:, 2] = VOCAB - 1
    return t


def batch(rng, b=8):
    return (rng.normal(size=(b, 16, 16, 3)).astype(np.float32),
            (rng.random(b) < 0.5).astype(np.float32),
            rng.normal(size=(b, 16, 16, 3)).astype(np.float32),
            sens_tokens(b))


class TestLayerTraining:
    def test_top_text_layer_trains(self):
        model = make_model(n_train_text_layers=1)
        before = jax.tree.map(lambda x: np.asarray(x).copy(), model.clip_params)
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        assert trainer.grad_mask is not None
        rng = np.random.default_rng(3)
        for _ in range(2):
            m = trainer.step(*batch(rng))
        after = trainer.model.clip_params

        # top text layer changed
        b_w = before["text"]["resblocks"]["attn"]["wqkv"]
        a_w = np.asarray(after["text"]["resblocks"]["attn"]["wqkv"])
        assert np.abs(a_w[1] - b_w[1]).max() > 0  # layer 1 (top) trained
        np.testing.assert_array_equal(a_w[0], b_w[0])  # bottom frozen

        # image tower + projections + token embedding bit-identical
        for path in (("visual", "resblocks", "attn", "wqkv"),
                     ("text", "token_embedding"),
                     ("text", "text_projection")):
            b_leaf, a_leaf = before, after
            for k in path:
                b_leaf, a_leaf = b_leaf[k], a_leaf[k]
            np.testing.assert_array_equal(np.asarray(a_leaf), np.asarray(b_leaf))
        assert np.isfinite(m["loss"])

    def test_unfreeze_proj_trains_projections(self):
        model = make_model(freeze_proj=False)
        before_proj = np.asarray(model.clip_params["text"]["text_projection"]).copy()
        before_tok = np.asarray(model.clip_params["text"]["token_embedding"]).copy()
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        rng = np.random.default_rng(4)
        trainer.step(*batch(rng))
        after = trainer.model.clip_params
        assert np.abs(np.asarray(after["text"]["text_projection"]) - before_proj).max() > 0
        # tokens never train (reference model/model.py:323-324)
        np.testing.assert_array_equal(
            np.asarray(after["text"]["token_embedding"]), before_tok)

    def test_frozen_default_has_no_mask(self):
        model = make_model()
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        assert trainer.grad_mask is None

    def test_text_only_step_matches_full_with_layers_step(self):
        """For text-side-only configs the trainer takes the cheap
        prompt_step_text_layers (images embed once, frozen); it must produce
        the SAME updates as the full with-layers step — the image-path
        gradients it skips are identically zero there."""
        rng = np.random.default_rng(6)
        b = batch(rng)

        model_a = make_model(n_train_text_layers=1)
        trainer_a = AdversarialTrainer.create(model_a, make_adversary(4),
                                              TrainConfig(), sens_tokens(4),
                                              use_pallas=False)
        assert not trainer_a.trains_image  # routes to the text-only step
        trainer_a.step(*b)

        model_b = make_model(n_train_text_layers=1)
        trainer_b = AdversarialTrainer.create(model_b, make_adversary(4),
                                              TrainConfig(), sens_tokens(4),
                                              use_pallas=False)
        trainer_b.trains_image = True  # force the full with-layers step
        trainer_b.step(*b)

        np.testing.assert_allclose(
            np.asarray(trainer_a.model.debias_tokens),
            np.asarray(trainer_b.model.debias_tokens), rtol=1e-5, atol=1e-6)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6),
            trainer_a.model.clip_params, trainer_b.model.clip_params)

    def test_unfreeze_proj_routes_to_full_step(self):
        """freeze_proj=False unfreezes the VISUAL projection too — image
        embeddings depend on trainable params, so the cheap text-only step
        must NOT be taken."""
        model = make_model(freeze_proj=False)
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        assert trainer.trains_image

    def test_approx_scores_routes_and_trains(self):
        """approx_frozen_scores with vid layers: the approximate step runs,
        the top vid layer still trains (via the contrastive term)."""
        model = make_model(n_train_vid_layers=1)
        before = np.asarray(
            model.clip_params["visual"]["resblocks"]["attn"]["wqkv"]).copy()
        trainer = AdversarialTrainer.create(
            model, make_adversary(4),
            TrainConfig(approx_frozen_scores=True), sens_tokens(4),
            use_pallas=False)
        assert trainer.trains_image
        rng = np.random.default_rng(7)
        m = trainer.step(*batch(rng))
        assert np.isfinite(m["loss"])
        after = np.asarray(
            trainer.model.clip_params["visual"]["resblocks"]["attn"]["wqkv"])
        assert np.abs(after[1] - before[1]).max() > 0  # top vid layer trained
        np.testing.assert_array_equal(after[0], before[0])  # bottom frozen

    def test_approx_matches_exact_at_zero_adversarial_weight(self):
        """With adversarial_weight=0 the dropped gradient path (adversary →
        attribute-batch image embeddings → vid layers) contributes nothing,
        so the approximate and exact with-layers steps must produce the same
        updates — the approximation's ONLY gradient difference is that
        path."""
        rng = np.random.default_rng(8)
        b = batch(rng)

        model_a = make_model(n_train_vid_layers=1)
        trainer_a = AdversarialTrainer.create(
            model_a, make_adversary(4),
            TrainConfig(adversarial_weight=0.0, approx_frozen_scores=True),
            sens_tokens(4), use_pallas=False)
        trainer_a.step(*b)

        model_b = make_model(n_train_vid_layers=1)
        trainer_b = AdversarialTrainer.create(
            model_b, make_adversary(4),
            TrainConfig(adversarial_weight=0.0), sens_tokens(4),
            use_pallas=False)
        trainer_b.step(*b)

        np.testing.assert_allclose(
            np.asarray(trainer_a.model.debias_tokens),
            np.asarray(trainer_b.model.debias_tokens), rtol=1e-5, atol=1e-6)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6),
            trainer_a.model.clip_params, trainer_b.model.clip_params)

    def test_approx_differs_with_adversarial_weight(self):
        """With adversarial_weight>0 the approximation genuinely changes the
        vid-layer gradients (the direct adversary→image path is dropped) —
        this is why the flag is opt-in."""
        rng = np.random.default_rng(9)
        b = batch(rng)

        model_a = make_model(n_train_vid_layers=1)
        trainer_a = AdversarialTrainer.create(
            model_a, make_adversary(4),
            TrainConfig(adversarial_weight=5.0, approx_frozen_scores=True),
            sens_tokens(4), use_pallas=False)
        trainer_a.step(*b)

        model_b = make_model(n_train_vid_layers=1)
        trainer_b = AdversarialTrainer.create(
            model_b, make_adversary(4),
            TrainConfig(adversarial_weight=5.0), sens_tokens(4),
            use_pallas=False)
        trainer_b.step(*b)

        wa = np.asarray(
            trainer_a.model.clip_params["visual"]["resblocks"]["attn"]["wqkv"])
        wb = np.asarray(
            trainer_b.model.clip_params["visual"]["resblocks"]["attn"]["wqkv"])
        assert np.abs(wa[1] - wb[1]).max() > 1e-7

    def test_approx_flag_ignored_when_image_path_frozen(self):
        """Frozen / text-only configs ignore the flag — their fast paths are
        already exact, so the approximation must not engage (updates match a
        flagless trainer bit-for-bit)."""
        rng = np.random.default_rng(10)
        b = batch(rng)

        model_a = make_model(n_train_text_layers=1)
        trainer_a = AdversarialTrainer.create(
            model_a, make_adversary(4),
            TrainConfig(approx_frozen_scores=True), sens_tokens(4),
            use_pallas=False)
        assert not trainer_a.trains_image
        trainer_a.step(*b)

        model_b = make_model(n_train_text_layers=1)
        trainer_b = AdversarialTrainer.create(
            model_b, make_adversary(4), TrainConfig(), sens_tokens(4),
            use_pallas=False)
        trainer_b.step(*b)

        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)),
            trainer_a.model.clip_params, trainer_b.model.clip_params)
        np.testing.assert_array_equal(
            np.asarray(trainer_a.model.debias_tokens),
            np.asarray(trainer_b.model.debias_tokens))

    def test_vision_layer_trains(self):
        """n_train_vid_layers: the with-layers step embeds images inside the
        loss, so the top image resblock receives gradients."""
        model = make_model(n_train_vid_layers=1)
        before = np.asarray(
            model.clip_params["visual"]["resblocks"]["attn"]["wqkv"]).copy()
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        assert trainer.grad_mask is not None
        rng = np.random.default_rng(5)
        m = trainer.step(*batch(rng))
        assert np.isfinite(m["loss"])
        after = np.asarray(
            trainer.model.clip_params["visual"]["resblocks"]["attn"]["wqkv"])
        assert np.abs(after[1] - before[1]).max() > 0  # top vid layer trained
        np.testing.assert_array_equal(after[0], before[0])  # bottom frozen


class TestLayerTrainingCheckpoint:
    def test_clip_params_checkpointed(self, tmp_path):
        """Layer-training runs must checkpoint the mutated CLIP weights."""
        from debias_vision_lang_tpu.train.state import (
            restore_checkpoint, save_checkpoint)

        model = make_model(n_train_text_layers=1)
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        rng = np.random.default_rng(0)
        trainer.step(*batch(rng))
        mutated = np.asarray(
            trainer.model.clip_params["text"]["resblocks"]["attn"]["wqkv"]).copy()
        path = save_checkpoint(str(tmp_path / "ck"), trainer)

        fresh = make_model(n_train_text_layers=1)
        trainer2 = AdversarialTrainer.create(fresh, make_adversary(4),
                                             TrainConfig(), sens_tokens(4),
                                             use_pallas=False)
        restore_checkpoint(path, trainer2)
        np.testing.assert_allclose(
            np.asarray(trainer2.model.clip_params["text"]["resblocks"]["attn"]["wqkv"]),
            mutated)


class TestDataParallelTrainer:
    def test_dp_step_matches_single_device(self):
        """One trainer step with batches sharded over the 8-device mesh must
        produce the same prompt update as single-device execution."""
        from debias_vision_lang_tpu.parallel.mesh import create_mesh

        rng = np.random.default_rng(0)
        b = batch(rng, b=16)

        t_single = AdversarialTrainer.create(make_model(), make_adversary(4),
                                             TrainConfig(), sens_tokens(4),
                                             use_pallas=False)
        m1 = t_single.step(*b)

        mesh = create_mesh()
        t_dp = AdversarialTrainer.create(make_model(), make_adversary(4),
                                         TrainConfig(), sens_tokens(4),
                                         use_pallas=False, mesh=mesh)
        m2 = t_dp.step(*b)

        np.testing.assert_allclose(
            np.asarray(t_dp.model.debias_tokens),
            np.asarray(t_single.model.debias_tokens), atol=1e-5)
        assert abs(m1["loss"] - m2["loss"]) < 1e-4

    def test_dp_with_layer_training(self):
        from debias_vision_lang_tpu.parallel.mesh import create_mesh

        rng = np.random.default_rng(1)
        mesh = create_mesh()
        trainer = AdversarialTrainer.create(
            make_model(n_train_text_layers=1), make_adversary(4),
            TrainConfig(), sens_tokens(4), use_pallas=False, mesh=mesh)
        m = trainer.step(*batch(rng, b=16))
        assert np.isfinite(m["loss"])


class TestRound3ReviewFixes:
    def test_logit_scale_trains_when_proj_unfrozen(self):
        """freeze_proj=False puts logit_scale in the trainable proj group
        (reference model/model.py:49-55) — it must actually receive
        gradients (round-3 review: an explicit stop_gradient silently left
        it at init forever)."""
        model = make_model(freeze_proj=False)
        before = float(np.asarray(model.clip_params["logit_scale"]))
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        rng = np.random.default_rng(7)
        for _ in range(2):
            trainer.step(*batch(rng))
        after = float(np.asarray(trainer.model.clip_params["logit_scale"]))
        assert after != before

    def test_logit_scale_frozen_by_default(self):
        model = make_model(n_train_text_layers=1)  # layers train, proj frozen
        before = float(np.asarray(model.clip_params["logit_scale"]))
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        rng = np.random.default_rng(8)
        trainer.step(*batch(rng))
        after = float(np.asarray(trainer.model.clip_params["logit_scale"]))
        assert after == before

    def test_best_snapshot_includes_clip_weights_in_layer_mode(self):
        """maybe_update_best must snapshot the CLIP weights the best tokens
        were evaluated WITH (round-3 review: tokens-only snapshots produce
        a composite never evaluated)."""
        model = make_model(n_train_text_layers=1)
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        rng = np.random.default_rng(9)
        trainer.step(*batch(rng))
        assert trainer.maybe_update_best(0.5)
        # probe a leaf the config actually trains: the TOP text resblock
        best_w = np.asarray(
            trainer.best_clip_params["text"]["resblocks"]["attn"]["wqkv"][-1]
        ).copy()
        trainer.step(*batch(rng))  # weights move past the snapshot
        live_w = np.asarray(
            trainer.model.clip_params["text"]["resblocks"]["attn"]["wqkv"][-1])
        assert np.abs(live_w - best_w).max() > 0
        # a worse eval must NOT overwrite the snapshot
        assert not trainer.maybe_update_best(0.9)
        np.testing.assert_array_equal(
            np.asarray(
                trainer.best_clip_params["text"]["resblocks"]["attn"]["wqkv"][-1]),
            best_w)

    def test_best_clip_snapshot_roundtrips_checkpoint(self, tmp_path):
        from debias_vision_lang_tpu.train.state import (restore_checkpoint,
                                                        save_checkpoint)

        model = make_model(n_train_text_layers=1)
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        rng = np.random.default_rng(10)
        trainer.step(*batch(rng))
        trainer.maybe_update_best(0.4)
        best = np.asarray(
            trainer.best_clip_params["text"]["text_projection"]).copy()
        path = save_checkpoint(str(tmp_path), trainer)

        fresh_model = make_model(n_train_text_layers=1)
        fresh = AdversarialTrainer.create(fresh_model, make_adversary(4),
                                          TrainConfig(), sens_tokens(4),
                                          use_pallas=False)
        restore_checkpoint(path, fresh)
        assert fresh.best_clip_params is not None
        np.testing.assert_allclose(
            np.asarray(fresh.best_clip_params["text"]["text_projection"]),
            best, rtol=0, atol=0)

    def test_frozen_mode_skips_best_clip_snapshot(self):
        model = make_model()
        trainer = AdversarialTrainer.create(model, make_adversary(4),
                                            TrainConfig(), sens_tokens(4),
                                            use_pallas=False)
        trainer.maybe_update_best(0.5)
        assert trainer.best_clip_params is None
