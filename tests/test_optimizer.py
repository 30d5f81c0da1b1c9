"""make_optimizer unit tests: schedules, clipping, default parity.

Fast (pure optax, no model) — runs in the default gate, unlike the
slow-marked trainer suites.
"""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from debias_vision_lang_tpu.core.config import TrainConfig
from debias_vision_lang_tpu.train.adversarial import make_optimizer


def _tree(val=1.0):
    return {"w": jnp.full((3, 4), val, jnp.float32),
            "b": jnp.full((4,), val, jnp.float32)}


def _run_steps(tx, grads, n=1, params=None):
    params = _tree(0.0) if params is None else params
    state = tx.init(params)
    for _ in range(n):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, updates


class TestMakeOptimizer:
    def test_constant_default_is_plain_adam(self):
        """lr_schedule='constant' + no clip reproduces optax.adam(lr)
        bit-for-bit — the historical update rule must not drift."""
        cfg = TrainConfig()
        grads = _tree(0.5)
        _, ours = _run_steps(make_optimizer(cfg.prompt_lr, cfg), grads)
        _, ref = _run_steps(optax.adam(cfg.prompt_lr), grads)
        for k in ours:
            np.testing.assert_array_equal(np.asarray(ours[k]),
                                          np.asarray(ref[k]))

    def test_warmup_first_update_is_zero(self):
        """warmup_cosine starts at lr=0: the first update is exactly 0."""
        cfg = TrainConfig(lr_schedule="warmup_cosine", warmup_steps=10,
                          decay_steps=100)
        _, upd = _run_steps(make_optimizer(1e-2, cfg), _tree(0.5))
        assert float(jnp.abs(upd["w"]).max()) == 0.0

    def test_cosine_decays_update_magnitude(self):
        """Same gradient every step: cosine updates shrink toward the
        horizon (constant-lr adam would keep the same magnitude)."""
        cfg = TrainConfig(lr_schedule="cosine", decay_steps=20)
        tx = make_optimizer(1e-2, cfg)
        grads = _tree(0.5)
        params = _tree(0.0)
        state = tx.init(params)
        mags = []
        for _ in range(20):
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            mags.append(float(jnp.abs(updates["w"]).max()))
        assert mags[-1] < 0.2 * mags[1]

    def test_clip_matches_manually_clipped_gradient(self):
        """chain(clip_by_global_norm, adam) == adam on the pre-clipped
        gradient — exact, not approximate."""
        cfg = TrainConfig(grad_clip_norm=1.0)
        grads = _tree(100.0)
        gnorm = float(optax.global_norm(grads))
        assert gnorm > 1.0
        clipped = {k: v / gnorm for k, v in grads.items()}
        _, ours = _run_steps(make_optimizer(1e-3, cfg), grads)
        _, ref = _run_steps(optax.adam(1e-3), clipped)
        for k in ours:
            np.testing.assert_allclose(np.asarray(ours[k]),
                                       np.asarray(ref[k]), rtol=1e-6)

    def test_small_gradient_passes_clip_unchanged(self):
        cfg = TrainConfig(grad_clip_norm=1e6)
        grads = _tree(0.5)
        _, ours = _run_steps(make_optimizer(1e-3, cfg), grads)
        _, ref = _run_steps(optax.adam(1e-3), grads)
        for k in ours:
            np.testing.assert_array_equal(np.asarray(ours[k]),
                                          np.asarray(ref[k]))

    def test_cosine_without_decay_steps_raises(self):
        for sched in ("cosine", "warmup_cosine"):
            with pytest.raises(ValueError, match="decay_steps"):
                make_optimizer(1e-3, TrainConfig(lr_schedule=sched))

    def test_warmup_must_be_shorter_than_horizon(self):
        with pytest.raises(ValueError, match="warmup_steps"):
            make_optimizer(1e-3, TrainConfig(lr_schedule="warmup_cosine",
                                             warmup_steps=50, decay_steps=50))

    def test_warmup_with_plain_cosine_raises(self):
        """warmup_steps would be silently ignored by 'cosine' — reject."""
        with pytest.raises(ValueError, match="warmup_cosine"):
            make_optimizer(1e-3, TrainConfig(lr_schedule="cosine",
                                             warmup_steps=10,
                                             decay_steps=100))

    def test_unknown_schedule_raises(self):
        with pytest.raises(ValueError, match="lr_schedule"):
            make_optimizer(1e-3, TrainConfig(lr_schedule="linear"))


class TestAdversaryHorizonScaling:
    def test_cadence_scales_adversary_horizon(self):
        """adversary_steps_per_prompt_step=N means the adversary optimizer
        steps N× per trainer step: its default cosine horizon must scale by
        N or its lr hits ~0 after 1/N of training (frozen adversary)."""
        from debias_vision_lang_tpu.train.adversarial import build_train_steps
        from debias_vision_lang_tpu.core.config import (
            AdversaryConfig, CLIPConfig, DebiasConfig, TextConfig,
            VisionConfig)

        cfg = CLIPConfig(
            name="tiny-h",
            vision=VisionConfig(kind="vit", image_size=16, patch_size=8,
                                width=32, layers=1, heads=2, embed_dim=16),
            text=TextConfig(vocab_size=64, context_length=8, width=32,
                            layers=1, heads=2, embed_dim=16))
        tcfg = TrainConfig(lr_schedule="cosine", decay_steps=10,
                           adversary_steps_per_prompt_step=4)
        sens = np.zeros((3, 8), np.int32)
        sens[:, 0], sens[:, 1] = 62, 63
        _, p_opt, a_opt = build_train_steps(
            cfg, DebiasConfig(num_debias_tokens=1, hidden_dim=32,
                              max_tokens=8),
            AdversaryConfig(n_input=3, hidden_size=4), tcfg, sens,
            use_pallas=False)

        def lr_ratio(tx, steps):
            """update magnitude after `steps` warm steps vs step 1, same
            constant gradient — tracks the schedule's lr decay."""
            grads = {"w": jnp.ones((2, 2), jnp.float32)}
            params = {"w": jnp.zeros((2, 2), jnp.float32)}
            state = tx.init(params)
            first = None
            for i in range(steps):
                updates, state = tx.update(grads, state, params)
                if i == 0:
                    first = float(jnp.abs(updates["w"]).max())
            return float(jnp.abs(updates["w"]).max()) / first

        # after 10 updates the PROMPT optimizer is at its horizon (lr≈0)...
        assert lr_ratio(p_opt, 10) < 0.05
        # ...but the adversary (horizon 40) still has most of its lr
        assert lr_ratio(a_opt, 10) > 0.5
