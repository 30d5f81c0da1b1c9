"""Prompt-injection parity tests.

The expected values encode the reference's verified behavior (SURVEY.md §3.2,
confirmed by executing the reference `DebiasCLIP.encode_text` against a mock
backbone): positional-embedding asymmetry in prepend mode, EOT-shift pooling
with clamping, interval placement for append modes, and the zeros-init quirk.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debias_vision_lang_tpu.core.config import (
    CLIPConfig,
    DebiasConfig,
    TextConfig,
    VisionConfig,
)
from debias_vision_lang_tpu.models import debias as debias_model
from debias_vision_lang_tpu.models.clip import add_positional, embed_tokens, init_clip_params
from debias_vision_lang_tpu.models.debias import (
    DebiasCLIP,
    debias_eot_index,
    init_debias_tokens,
    inject_prompts,
    layer_counts,
    trainable_mask,
)

S, D, V = 8, 4, 32  # context length, width, vocab


def mock_text_params():
    """token_embedding = 0, positional_embedding of slot i = constant i —
    the same probe used to verify the reference's semantics."""
    return {
        "token_embedding": jnp.zeros((V, D)),
        "positional_embedding": jnp.arange(S, dtype=jnp.float32)[:, None] * jnp.ones((1, D)),
    }


def embed(text):
    p = mock_text_params()
    return add_positional(p, embed_tokens(p, jnp.asarray(text)))


def toks(eot_pos):
    t = np.zeros((1, S), np.int32)
    t[0, 0] = V - 2
    t[0, 1:eot_pos] = 1
    t[0, eot_pos] = V - 1
    return t


class TestPrependMode:
    def test_verified_reference_semantics(self):
        """Transformer input slots must be [99, 99, 0, 1, ..., S-P-1]:
        learned tokens get NO positional embedding; shifted raw tokens keep
        their ORIGINAL positions (reference model/model.py:209-225)."""
        debias = 99.0 * jnp.ones((2, D))
        out = inject_prompts(embed(toks(3)), debias, jnp.asarray(toks(3)), "prepend")
        got = np.asarray(out[0, :, 0])
        expected = np.array([99.0, 99.0, 0, 1, 2, 3, 4, 5])
        np.testing.assert_allclose(got, expected)

    def test_p0_identity(self):
        out = inject_prompts(embed(toks(3)), jnp.zeros((0, D)), jnp.asarray(toks(3)), "prepend")
        np.testing.assert_allclose(np.asarray(out), np.asarray(embed(toks(3))))

    def test_last_p_slots_truncated(self):
        # raw slot S-1 and S-2 embeddings never appear in the output
        out = inject_prompts(embed(toks(3)), jnp.full((2, D), 99.0), jnp.asarray(toks(3)), "prepend")
        assert np.asarray(out[0, :, 0]).max() == 99.0  # position S-1 value (7.0) gone... 99 dominates
        assert (S - 1) not in np.asarray(out[0, 2:, 0])


class TestEotPooling:
    def test_shifted_index(self):
        # argmax(text)=3, P=2 → pooled slot 5 (verified reference behavior)
        idx = debias_eot_index(jnp.asarray(toks(3)), 2, S)
        assert int(idx[0]) == 5

    def test_clamped_at_end(self):
        # EOT at last raw slot: argmax+P exceeds sequence → clamp to S-1,
        # which (after prepend truncation) no longer holds the EOT embedding —
        # reference quirk, reproduced (model/model.py:265-266)
        idx = debias_eot_index(jnp.asarray(toks(S - 1)), 2, S)
        assert int(idx[0]) == S - 1

    def test_applies_to_all_modes(self):
        # pooling shift is mode-independent in the reference
        idx = debias_eot_index(jnp.asarray(toks(2)), 3, S)
        assert int(idx[0]) == 5


class TestAppendMode:
    def test_overwrites_from_eot_slot(self):
        """append places learned tokens starting AT the EOT slot
        (reference model/model.py:230-242): l=eot, e=l+min(P, S-l-1)."""
        text = toks(3)
        out = inject_prompts(embed(text), jnp.full((2, D), 99.0), jnp.asarray(text), "append")
        got = np.asarray(out[0, :, 0])
        # slots: 0,1,2 raw; 3,4 learned; 5,6,7 raw
        np.testing.assert_allclose(got, [0, 1, 2, 99, 99, 5, 6, 7])

    def test_eot_at_last_slot_no_insert(self):
        # l = S-1 → e = l + min(P, 0) = l → empty interval → raw unchanged
        text = toks(S - 1)
        out = inject_prompts(embed(text), jnp.full((2, D), 99.0), jnp.asarray(text), "append")
        np.testing.assert_allclose(np.asarray(out), np.asarray(embed(text)))

    def test_truncated_interval_near_end(self):
        # l = S-2 → e = l + min(2, 1) = S-1 → only 1 learned token inserted
        text = toks(S - 2)
        out = inject_prompts(embed(text), jnp.full((2, D), 99.0), jnp.asarray(text), "append")
        got = np.asarray(out[0, :, 0])
        np.testing.assert_allclose(got, [0, 1, 2, 3, 4, 5, 99, 7])


class TestAppendAfterEosMode:
    def test_inserts_after_eot(self):
        # l = eot+1, e = min(l+P, S)  (reference model/model.py:243-254)
        text = toks(3)
        out = inject_prompts(embed(text), jnp.full((2, D), 99.0), jnp.asarray(text), "append_after_eos")
        got = np.asarray(out[0, :, 0])
        np.testing.assert_allclose(got, [0, 1, 2, 3, 99, 99, 6, 7])

    def test_clipped_at_sequence_end(self):
        text = toks(S - 1)  # l = S → empty interval
        out = inject_prompts(embed(text), jnp.full((2, D), 99.0), jnp.asarray(text), "append_after_eos")
        np.testing.assert_allclose(np.asarray(out), np.asarray(embed(text)))


class TestAddMode:
    def test_adds_at_positions_1_to_p(self):
        # (reference model/model.py:255-258)
        text = toks(4)
        out = inject_prompts(embed(text), jnp.full((2, D), 99.0), jnp.asarray(text), "add")
        got = np.asarray(out[0, :, 0])
        np.testing.assert_allclose(got, [0, 1 + 99, 2 + 99, 3, 4, 5, 6, 7])


class TestTokenInit:
    @pytest.fixture(scope="class")
    def clip_setup(self):
        cfg = CLIPConfig(
            name="tiny",
            vision=VisionConfig(kind="vit", image_size=16, patch_size=8, width=16,
                                layers=1, heads=2, embed_dim=8),
            text=TextConfig(vocab_size=64, context_length=8, width=16, layers=1,
                            heads=2, embed_dim=8),
        )
        params = init_clip_params(jax.random.key(0), cfg)
        return cfg, params

    def test_zeros_init_is_token0_embedding(self, clip_setup):
        """'zeros' = embeddings of token id 0, NOT zero vectors
        (reference model/model.py:176-184)."""
        _, params = clip_setup
        deb = init_debias_tokens(jax.random.key(1), params,
                                 DebiasConfig(num_debias_tokens=3, hidden_dim=16))
        tok0 = np.asarray(params["text"]["token_embedding"][0])
        assert np.abs(tok0).max() > 0  # genuinely non-zero
        for row in np.asarray(deb):
            np.testing.assert_allclose(row, tok0)

    def test_rand_init(self, clip_setup):
        _, params = clip_setup
        deb = init_debias_tokens(
            jax.random.key(1), params,
            DebiasConfig(num_debias_tokens=2, hidden_dim=16, debias_token_init="rand"),
        )
        assert deb.shape == (2, 16)
        assert 0.5 < np.asarray(deb).std() < 2.0  # N(0,1)

    def test_wordlist_init(self, clip_setup):
        _, params = clip_setup

        def fake_tokenizer(texts):
            # [SOT, 7, 9, EOT, pad...]
            return np.array([[62, 7, 9, 63, 0, 0, 0, 0]], np.int32)

        deb = init_debias_tokens(
            jax.random.key(1), params,
            DebiasConfig(num_debias_tokens=2, hidden_dim=16,
                         debias_token_init=["fair", "just"]),
            tokenizer=fake_tokenizer,
        )
        emb = np.asarray(params["text"]["token_embedding"])
        np.testing.assert_allclose(np.asarray(deb), emb[[7, 9]])


class TestFreezing:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = CLIPConfig(
            name="tiny",
            vision=VisionConfig(kind="vit", image_size=16, patch_size=8, width=16,
                                layers=3, heads=2, embed_dim=8),
            text=TextConfig(vocab_size=64, context_length=8, width=16, layers=3,
                            heads=2, embed_dim=8),
        )
        params = init_clip_params(jax.random.key(0), cfg)
        return cfg, params

    def test_layer_counts(self, setup):
        _, params = setup
        assert layer_counts(params) == {"image": 3, "text": 3}

    def test_default_everything_frozen(self, setup):
        _, params = setup
        mask = trainable_mask(params, DebiasConfig())
        total = sum(float(np.sum(np.asarray(m))) for m in jax.tree.leaves(mask))
        assert total == 0.0

    def test_top_layers_trainable(self, setup):
        _, params = setup
        mask = trainable_mask(params, DebiasConfig(n_train_text_layers=2))
        m = np.asarray(mask["text"]["resblocks"]["attn"]["wqkv"]).ravel()
        np.testing.assert_allclose(m, [0.0, 1.0, 1.0])  # top-2 of 3 layers
        # image tower stays frozen
        assert np.sum(np.asarray(mask["visual"]["resblocks"]["attn"]["wqkv"])) == 0

    def test_unfreeze_proj(self, setup):
        _, params = setup
        mask = trainable_mask(params, DebiasConfig(freeze_proj=False))
        assert float(mask["logit_scale"]) == 1.0
        assert float(np.asarray(mask["text"]["text_projection"])) == 1.0
        assert float(np.asarray(mask["visual"]["proj"])) == 1.0
        # token embedding NEVER trains (reference model/model.py:323-324)
        assert np.sum(np.asarray(mask["text"]["token_embedding"])) == 0.0

    def test_out_of_range_raises(self, setup):
        _, params = setup
        with pytest.raises(ValueError):
            trainable_mask(params, DebiasConfig(n_train_text_layers=5))
        with pytest.raises(ValueError):
            trainable_mask(params, DebiasConfig(n_train_vid_layers=-1))

    def test_grad_mask_application(self, setup):
        _, params = setup
        from debias_vision_lang_tpu.models.debias import apply_grad_mask

        mask = trainable_mask(params, DebiasConfig(n_train_text_layers=1))
        grads = jax.tree.map(jnp.ones_like, params)
        masked = apply_grad_mask(grads, mask)
        wqkv = np.asarray(masked["text"]["resblocks"]["attn"]["wqkv"])
        assert wqkv[:2].sum() == 0 and (wqkv[2] == 1).all()


class TestEndToEnd:
    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_from_cfg_and_forward(self):
        model, preprocess, tokenizer, alias = DebiasCLIP.from_cfg(
            {
                "CLIP_ARCH": "openai/CLIP/ViT-B/16",
                "NUM_DEBIAS_TOKENS": 2,
                "PRETRAINED": False,  # offline test: random init, no warning
                "DEVICE": "tpu",  # ignored: sharding decides placement
            }
        )
        assert alias == "oai-clip-vit-b-16"
        assert model.debias_tokens.shape == (2, 512)
        assert model.clip_params["visual"]["proj"].shape == (768, 512)
        assert preprocess.n_px == 224
        # (full-size forward is exercised by __graft_entry__ / bench paths;
        # running it here on CPU costs ~40s for no extra coverage)

    def test_tiny_forward_consistency(self, tiny_clip):
        cfg, params = tiny_clip
        dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=cfg.text.width,
                            max_tokens=cfg.text.context_length)
        deb = init_debias_tokens(jax.random.key(5), params, dcfg)
        model = DebiasCLIP(clip_params=params, debias_tokens=deb,
                           clip_cfg=cfg, debias_cfg=dcfg)
        v = cfg.text.vocab_size
        t = np.zeros((2, 16), np.int32)
        t[:, 0] = v - 2
        t[:, 1] = 3
        t[:, 2] = v - 1
        imgs = jax.random.normal(jax.random.key(6), (2, 32, 32, 3))
        li, lt = model(imgs, t, use_pallas=False)
        assert li.shape == (2, 2)
        np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-5)

    def test_debias_tokens_change_text_embedding(self, tiny_clip):
        cfg, params = tiny_clip
        dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=cfg.text.width,
                            max_tokens=cfg.text.context_length)
        v = cfg.text.vocab_size
        t = np.zeros((1, 16), np.int32)
        t[:, 0] = v - 2
        t[:, 1] = 3
        t[:, 2] = v - 1
        # NB: a constant-vector perturbation would be invisible to LayerNorm
        # (it normalizes away uniform feature shifts) — use a random one.
        deb1 = jnp.zeros((2, cfg.text.width))
        deb2 = jax.random.normal(jax.random.key(7), (2, cfg.text.width))
        e1 = debias_model.encode_text(params, deb1, jnp.asarray(t), cfg, dcfg, use_pallas=False)
        e2 = debias_model.encode_text(params, deb2, jnp.asarray(t), cfg, dcfg, use_pallas=False)
        assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 1e-4


class TestClassifyParams:
    def test_classification_groups(self, tiny_clip):
        from debias_vision_lang_tpu.models.debias import classify_params

        cfg, params = tiny_clip
        metadata, classed = classify_params(params)
        by_name = {c["name"]: c["type"] for c in classed}
        assert by_name["logit_scale"] == "proj"
        assert by_name["visual/proj"] == "proj"
        assert by_name["text/text_projection"] == "proj"
        assert by_name["text/token_embedding"] == "tokens"
        assert by_name["visual/class_embedding"] == "other"
        assert by_name["text/positional_embedding"] == "other"
        assert all(v == "image" for k, v in by_name.items()
                   if k.startswith("visual/resblocks"))
        # metadata reports resblock counts per tower (reference semantics)
        assert metadata["image"] == cfg.vision.layers
        assert metadata["text"] == cfg.text.layers
