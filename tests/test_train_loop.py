"""End-to-end run_training on a synthetic FairFace + tiny model, and CLI."""

import json
import os

import jax
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from debias_vision_lang_tpu.core.config import (
    CLIPConfig,
    DebiasConfig,
    TextConfig,
    TrainConfig,
    VisionConfig,
)
from debias_vision_lang_tpu.models.clip import init_clip_params
from debias_vision_lang_tpu.models.debias import DebiasCLIP, init_debias_tokens

CTX, VOCAB, PX = 16, 128, 32


pytestmark = pytest.mark.slow  # multi-minute on 1-core hosts; run with -m '' for the full gate

@pytest.fixture(scope="module")
def ff_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ff_train")
    img_dir = root / "imgs" / "train_val" / "x"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    races = ["White", "Southeast Asian", "Middle Eastern", "Black", "Indian",
             "Latino_Hispanic", "East Asian"]
    ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59", "60-69",
            "more than 70"]
    rows = []
    for i in range(16):
        f = f"x/{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (PX, PX, 3), dtype=np.uint8)).save(
            root / "imgs" / "train_val" / f)
        rows.append({"file": f, "age": ages[i % 9],
                     "gender": "Male" if i % 2 else "Female",
                     "race": races[i % 7]})
    for mode in ("train", "val"):
        d = root / "labels" / mode
        d.mkdir(parents=True)
        pd.DataFrame(rows).to_csv(d / f"{mode}_labels.csv", index=False)
    return str(root)


def tiny_model(name="tiny-loop"):
    cfg = CLIPConfig(
        name=name,
        vision=VisionConfig(kind="vit", image_size=PX, patch_size=8, width=32,
                            layers=1, heads=2, embed_dim=16),
        text=TextConfig(vocab_size=VOCAB, context_length=CTX, width=32,
                        layers=1, heads=2, embed_dim=16),
    )
    params = init_clip_params(jax.random.key(0), cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=32, max_tokens=CTX)
    deb = init_debias_tokens(jax.random.key(1), params, dcfg)
    return DebiasCLIP(clip_params=params, debias_tokens=deb, clip_cfg=cfg,
                      debias_cfg=dcfg)


def tok(texts):
    out = np.zeros((len(texts), CTX), np.int32)
    out[:, 0] = VOCAB - 2
    for i, t in enumerate(texts):
        out[i, 1] = abs(hash(t)) % 100 + 1
        out[i, 2] = VOCAB - 1
    return out


class TestRunTraining:
    def test_full_loop(self, ff_root, tmp_path):
        from debias_vision_lang_tpu.train.loop import run_training

        result = run_training(
            model=tiny_model(),
            tokenizer=tok,
            attribute="gender",
            epochs=1,
            batch_size=8,
            data_path=ff_root,
            checkpoint_dir=str(tmp_path / "ckpt"),
            eval_every=1,
            eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person", "a kind person"],
            use_pallas=False,
            progress=False,
        )
        assert result["steps"] == 2  # 16 imgs / batch 8
        assert np.isfinite(result["best_ndkl"])
        assert os.path.exists(result["export"])
        # orbax checkpoint directory exists
        assert any(d.startswith("step_") for d in os.listdir(result["checkpoint_dir"]))
        # metrics were logged
        log = os.path.join(result["checkpoint_dir"], "logs", "metrics.jsonl")
        lines = [json.loads(l) for l in open(log)]
        assert any("ndkl_eq_opp" in l for l in lines)
        assert any("adversary_bce" in l for l in lines)

    def test_schedule_horizon_derived(self, ff_root, tmp_path):
        """lr_schedule through run_training with decay_steps=None: the
        cosine horizon derives from epochs × steps-per-epoch instead of
        raising (make_optimizer requires it for direct callers)."""
        from debias_vision_lang_tpu.train.loop import run_training

        result = run_training(
            model=tiny_model(),
            tokenizer=tok,
            attribute="gender",
            epochs=1,
            batch_size=8,
            data_path=ff_root,
            checkpoint_dir=str(tmp_path / "ckpt"),
            eval_every=10,
            eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person"],
            use_pallas=False,
            progress=False,
            lr_schedule="warmup_cosine",
            warmup_steps=1,
            grad_clip_norm=1.0,
        )
        assert result["steps"] == 2
        assert np.isfinite(result["best_ndkl"])

    def test_train_cfg_drives_loop_knobs(self, ff_root, tmp_path):
        """A provided TrainConfig's num_epochs/batch_size/eval_every_steps
        drive the loop when the kwargs are left unset (they used to lose
        silently to the kwarg defaults)."""
        from debias_vision_lang_tpu.core.config import TrainConfig
        from debias_vision_lang_tpu.train.loop import run_training

        result = run_training(
            model=tiny_model(),
            tokenizer=tok,
            attribute="gender",
            data_path=ff_root,
            checkpoint_dir=str(tmp_path / "ckpt"),
            eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person"],
            use_pallas=False,
            progress=False,
            train_cfg=TrainConfig(num_epochs=2, batch_size=8,
                                  eval_every_steps=100),
        )
        assert result["steps"] == 4  # 2 epochs × (16 imgs / batch 8)

    def test_export_loads_in_hub(self, ff_root, tmp_path):
        from debias_vision_lang_tpu.train.loop import run_training

        result = run_training(
            model=tiny_model(), tokenizer=tok, attribute="gender", epochs=1,
            batch_size=8, data_path=ff_root,
            checkpoint_dir=str(tmp_path / "ckpt2"), eval_every=100,
            eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person"],
            use_pallas=False, progress=False,
        )
        import torch

        t = torch.load(result["export"], map_location="cpu", weights_only=True)
        assert tuple(t.shape) == (2, 32)


class TestEmbedCache:
    """TrainConfig.cache_frozen_embeddings: frozen-image configs embed the
    train rows + caption corpus ONCE and train epochs from gathered rows.
    The contract is bit-identical trajectories vs the decode path (same
    batch index sequences by construction, same jitted embed program per
    row) — load-bearing: the shipped efficacy record was measured through
    the decode path and must stay valid under the default-on cache."""

    @pytest.fixture(scope="class")
    def pairs_root(self, ff_root, tmp_path_factory):
        """A caption-pair corpus over ff_root's images (the pairs branch is
        the efficacy experiment's path — it must be equivalence-covered)."""
        root = tmp_path_factory.mktemp("pairs")
        os.symlink(os.path.join(ff_root, "imgs", "train_val"),
                   root / "images")
        pd.DataFrame({
            "file": [f"x/{i}.jpg" for i in range(16)],
            "caption": [f"a photo number {i}" for i in range(16)],
        }).to_csv(root / "captions.csv", index=False)
        return str(root)

    def _run(self, ff_root, ckpt_dir, cached, pairs_path=None, epochs=2,
             resume=False, cache_dir=None, model=None):
        from debias_vision_lang_tpu.train.loop import run_training

        return run_training(
            model=model if model is not None else tiny_model(),
            tokenizer=tok,
            attribute="gender",
            data_path=ff_root,
            pairs_path=pairs_path,
            checkpoint_dir=ckpt_dir,
            eval_every=1,
            eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person"],
            use_pallas=False,
            progress=False,
            resume=resume,
            train_cfg=TrainConfig(batch_size=8, num_epochs=epochs,
                                  eval_every_steps=1,
                                  cache_frozen_embeddings=cached,
                                  embedding_cache_dir=cache_dir),
        )

    @pytest.mark.parametrize("use_pairs", [False, True],
                             ids=["fairface-fallback", "pairs-corpus"])
    def test_cached_equals_decode_path(self, ff_root, pairs_root, tmp_path,
                                       use_pairs):
        import torch

        runs = {}
        for cached in (True, False):
            res = self._run(ff_root, str(tmp_path / f"c{cached}_{use_pairs}"),
                            cached,
                            pairs_path=pairs_root if use_pairs else None)
            assert res["embed_cache"] is cached
            export = torch.load(res["export"], map_location="cpu",
                                weights_only=True).numpy()
            log = os.path.join(res["checkpoint_dir"], "logs",
                               "metrics.jsonl")
            losses = [l["loss"] for l in map(json.loads, open(log))
                      if "loss" in l]
            runs[cached] = (res, export, losses)

        (a, ea, la), (b, eb, lb) = runs[True], runs[False]
        assert a["steps"] == b["steps"] == 4  # 2 epochs × (16 imgs / 8)
        # same batch sequences + same arithmetic → identical step losses,
        # identical selection, identical exported prompt array
        np.testing.assert_array_equal(la, lb)
        assert a["best_ndkl"] == b["best_ndkl"]
        np.testing.assert_array_equal(ea, eb)

    def test_disk_cache_roundtrip_and_invalidation(self, ff_root, pairs_root,
                                                   tmp_path):
        """TrainConfig.embedding_cache_dir (sweep persistence): the second
        run over the same tower + data loads both corpora from disk and
        produces an identical trajectory; a different tower misses instead
        of silently reusing wrong rows; a corrupted file is recomputed."""
        import torch

        cache = str(tmp_path / "emb_cache")
        r1 = self._run(ff_root, str(tmp_path / "d1"), True,
                       pairs_path=pairs_root, cache_dir=cache)
        assert r1["embed_cache_disk"] == {"train": "miss",
                                          "captions": "miss"}
        files = sorted(os.listdir(cache))
        assert len(files) == 2  # train_rows_* + caption_rows_*
        # the ORIGINAL tower's train file — captured now, before the
        # perturbed-tower run below adds its own pair under different keys
        train_file = [f for f in files if f.startswith("train_rows_")][0]

        r2 = self._run(ff_root, str(tmp_path / "d2"), True,
                       pairs_path=pairs_root, cache_dir=cache)
        assert r2["embed_cache_disk"] == {"train": "hit", "captions": "hit"}
        e1 = torch.load(r1["export"], map_location="cpu",
                        weights_only=True).numpy()
        e2 = torch.load(r2["export"], map_location="cpu",
                        weights_only=True).numpy()
        np.testing.assert_array_equal(e1, e2)
        assert r1["best_ndkl"] == r2["best_ndkl"]

        # a different tower (perturbed weight) must MISS — the params
        # fingerprint is load-bearing, not decorative
        other = tiny_model()
        other.clip_params["logit_scale"] = (
            other.clip_params["logit_scale"] + 0.25)
        r3 = self._run(ff_root, str(tmp_path / "d3"), True,
                       pairs_path=pairs_root, cache_dir=cache, model=other)
        assert r3["embed_cache_disk"] == {"train": "miss",
                                          "captions": "miss"}

        # corrupt one cache file in place: treated as a miss, recomputed,
        # and the NEXT run hits again off the rewritten file
        with open(os.path.join(cache, train_file), "wb") as f:
            f.write(b"not an npz")
        r4 = self._run(ff_root, str(tmp_path / "d4"), True,
                       pairs_path=pairs_root, cache_dir=cache)
        assert r4["embed_cache_disk"]["train"] == "miss"
        assert r4["embed_cache_disk"]["captions"] == "hit"
        r5 = self._run(ff_root, str(tmp_path / "d5"), True,
                       pairs_path=pairs_root, cache_dir=cache)
        assert r5["embed_cache_disk"] == {"train": "hit", "captions": "hit"}

    def test_disk_cache_fallback_branch_shares_train_rows(self, ff_root,
                                                          tmp_path):
        """FairFace caption fallback: one disk file (the caption stream
        reuses the attribute rows' embeddings)."""
        cache = str(tmp_path / "emb_cache_fb")
        r1 = self._run(ff_root, str(tmp_path / "f1"), True, cache_dir=cache)
        assert r1["embed_cache_disk"] == {"train": "miss",
                                          "captions": "train-rows"}
        assert len(os.listdir(cache)) == 1
        r2 = self._run(ff_root, str(tmp_path / "f2"), True, cache_dir=cache)
        assert r2["embed_cache_disk"] == {"train": "hit",
                                          "captions": "train-rows"}

    def test_resume_of_complete_recipe_skips_precompute(self, ff_root,
                                                        tmp_path):
        """Resuming an already-finished recipe must stay lazy like the
        decode path — no full precompute pass to then train zero steps
        (summary reports embed_cache False for that run)."""
        ckpt = str(tmp_path / "ckpt_resume")
        first = self._run(ff_root, ckpt, True, epochs=1)
        assert first["embed_cache"] is True and first["steps"] == 2
        again = self._run(ff_root, ckpt, True, epochs=1, resume=True)
        assert again["steps"] == 2  # recipe not extended (round-3 contract)
        assert again["embed_cache"] is False  # precompute skipped

    def test_cache_auto_disabled_when_image_path_trains(self, ff_root,
                                                        tmp_path):
        """Unfrozen projections (trains_image) must bypass the cache even
        with the config flag on — stale embeddings would corrupt training."""
        from debias_vision_lang_tpu.train.loop import run_training

        model = tiny_model()
        model.debias_cfg = DebiasConfig(
            num_debias_tokens=2, hidden_dim=32, max_tokens=CTX,
            freeze_proj=False)
        res = run_training(
            model=model,
            tokenizer=tok,
            attribute="gender",
            data_path=ff_root,
            checkpoint_dir=str(tmp_path / "ckpt_layers"),
            eval_every=2,
            eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person"],
            use_pallas=False,
            progress=False,
            train_cfg=TrainConfig(batch_size=8, num_epochs=1,
                                  eval_every_steps=2,
                                  cache_frozen_embeddings=True),
        )
        assert res["embed_cache"] is False
        assert np.isfinite(res["best_ndkl"])

    def test_step_from_embeddings_guard(self, ff_root):
        """Direct trainer API: step_from_embeddings refuses image-training
        configs loudly instead of silently training on stale rows."""
        from debias_vision_lang_tpu.models.adversary import Adversary
        from debias_vision_lang_tpu.train.adversarial import AdversarialTrainer

        model = tiny_model()
        model.debias_cfg = DebiasConfig(
            num_debias_tokens=2, hidden_dim=32, max_tokens=CTX,
            freeze_proj=False)
        adv = Adversary.from_cfg({"ADV_N_INPUT": 2, "ADV_N_OUTPUT": 1,
                                  "ADV_HIDDEN_SIZE": 8, "SEED": 0})
        trainer = AdversarialTrainer.create(
            model, adv, TrainConfig(batch_size=4, num_epochs=1),
            tok(["a good person", "a bad person"]), use_pallas=False)
        assert trainer.trains_image
        with pytest.raises(ValueError, match="frozen image path"):
            trainer.step_from_embeddings(
                np.zeros((4, 16), np.float32), np.zeros(4, np.float32),
                np.zeros((4, 16), np.float32), tok(["a"] * 4))


class TestLoopFixes:
    def test_slash_alias_and_eval_every_zero(self, ff_root, tmp_path):
        """A passed-in model whose cfg name contains '/' (e.g. 'ViT-B/16')
        must export to a sanitized filename, not a nonexistent directory;
        eval_every=0 disables periodic eval instead of ZeroDivisionError."""
        from debias_vision_lang_tpu.train.loop import run_training

        result = run_training(
            model=tiny_model(name="ViT-B/16"),
            tokenizer=tok, attribute="gender", epochs=1, batch_size=8,
            data_path=ff_root, checkpoint_dir=str(tmp_path / "ckpt_alias"),
            eval_every=0, eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person"],
            use_pallas=False, progress=False,
        )
        assert os.path.exists(result["export"])
        assert "/16" not in os.path.basename(result["export"])
        # periodic eval disabled: only the final ndkl_eq_opp line is logged
        log = os.path.join(result["checkpoint_dir"], "logs", "metrics.jsonl")
        evals = [l for l in (json.loads(x) for x in open(log))
                 if "ndkl_eq_opp" in l]
        assert len(evals) == 0  # the final eval returns, it isn't logged

    def test_caption_batches_not_lockstep(self, ff_root):
        """Contrastive batch B must not be byte-identical to debias batch A:
        the caption stream is seeded independently of the loader shuffle
        (both draw permutation(n) per epoch, so a shared seed = lockstep)."""
        from debias_vision_lang_tpu.data.datasets import FairFace
        from debias_vision_lang_tpu.data.loader import HostLoader
        from debias_vision_lang_tpu.train.loop import _caption_batches

        ds = FairFace(mode="train", iat_type="gender", data_path=ff_root)
        seed = 0
        loader = HostLoader(ds, batch_size=8, drop_remainder=True,
                            shuffle=True, seed=seed)
        cap_iter = _caption_batches(None, tok, 8, ds, PX,
                                    np.random.default_rng([seed, 1]))
        batch_a = next(iter(loader))
        cap_images, _ = next(cap_iter)
        assert not np.array_equal(batch_a.images, cap_images)


class TestCLI:
    def test_help(self):
        from debias_vision_lang_tpu.cli import main

        with pytest.raises(SystemExit) as e:
            main(["--help"])
        assert e.value.code == 0

    def test_measure_bias_cmd(self, ff_root, capsys, monkeypatch):
        """measure-bias subcommand end-to-end with injected tiny tokenizer."""
        import debias_vision_lang_tpu.cli as cli
        from debias_vision_lang_tpu.models import loader as loader_mod

        def fake_loader(name, pretrained=True, **kw):
            m = tiny_model()
            from debias_vision_lang_tpu.vision.preprocess import Preprocess

            return m, Preprocess(PX), tok, "tiny"

        monkeypatch.setattr("debias_vision_lang_tpu.models.loader.model_loader",
                            fake_loader)
        cli.main(["measure-bias", "--model", "openai/CLIP/ViT-B/16",
                  "--attribute", "gender", "--data-path", ff_root,
                  "--topn", "5", "--batch-size", "8", "--random-weights"])
        out = json.loads(capsys.readouterr().out)
        assert set(out) == {"maxskew", "ndkl"}

    def test_train_embed_cache_flags_plumb_through(self, monkeypatch,
                                                   capsys):
        """--embed-cache-dir / --no-embed-cache reach run_training as
        embedding_cache_dir / cache_frozen_embeddings."""
        import debias_vision_lang_tpu.cli as cli

        seen = {}

        def fake_run_training(**kw):
            seen.update(kw)
            return {"ok": True}

        monkeypatch.setattr("debias_vision_lang_tpu.train.loop.run_training",
                            fake_run_training)
        cli.main(["train", "--random-weights", "--epochs", "1",
                  "--embed-cache-dir", "/tmp/sweep_cache"])
        assert seen["embedding_cache_dir"] == "/tmp/sweep_cache"
        assert seen["cache_frozen_embeddings"] is True
        cli.main(["train", "--random-weights", "--epochs", "1",
                  "--no-embed-cache"])
        assert seen["embedding_cache_dir"] is None
        assert seen["cache_frozen_embeddings"] is False

    def test_measure_bias_mesh_cache_flags(self, ff_root, capsys,
                                           monkeypatch, tmp_path):
        """--mesh auto / --sharded-metrics / --cache-embeddings /
        --n-samples plumb through to measure_bias opts end-to-end."""
        import debias_vision_lang_tpu.cli as cli

        def fake_loader(name, pretrained=True, **kw):
            from debias_vision_lang_tpu.vision.preprocess import Preprocess

            return tiny_model(), Preprocess(PX), tok, "tiny"

        monkeypatch.setattr(
            "debias_vision_lang_tpu.models.loader.model_loader", fake_loader)
        cache = str(tmp_path / "cli_cache")
        cli.main(["measure-bias", "--model", "openai/CLIP/ViT-B/16",
                  "--attribute", "gender", "--data-path", ff_root,
                  "--topn", "5", "--batch-size", "8", "--random-weights",
                  "--mesh", "auto", "--sharded-metrics",
                  "--cache-embeddings", cache, "--n-samples", "16"])
        out = json.loads(capsys.readouterr().out)
        assert set(out) == {"maxskew", "ndkl"}
        assert os.path.exists(cache)

    def test_sharded_metrics_requires_mesh(self):
        import debias_vision_lang_tpu.cli as cli

        with pytest.raises(SystemExit, match="requires --mesh"):
            cli.main(["measure-bias", "--sharded-metrics"])


class TestResume:
    def test_resume_restores_latest(self, ff_root, tmp_path):
        from debias_vision_lang_tpu.train.loop import run_training
        from debias_vision_lang_tpu.train.state import latest_checkpoint

        ckpt_dir = str(tmp_path / "ckpt_resume")
        common = dict(
            tokenizer=tok, attribute="gender", epochs=1, batch_size=8,
            data_path=ff_root, checkpoint_dir=ckpt_dir, eval_every=100,
            eval_n_samples=None,
            sensitive_prompts=["a good person", "a bad person"],
            use_pallas=False, progress=False,
        )
        r1 = run_training(model=tiny_model(), **common)
        assert latest_checkpoint(ckpt_dir) is not None
        # resume COMPLETES the configured recipe rather than extending it:
        # 1 epoch already done + epochs=1 → nothing left to run
        r2 = run_training(model=tiny_model(), resume=True, **common)
        assert r2["steps"] == r1["steps"]
        # raising the target trains only the remaining epochs
        common2 = {**common, "epochs": 2}
        r3 = run_training(model=tiny_model(), resume=True, **common2)
        assert r3["steps"] == r1["steps"] + 2  # one more epoch of 2 steps


class TestRound3LoopFixes:
    def test_caption_corpus_smaller_than_batch_raises(self, ff_root):
        """A too-small corpus used to make the infinite caption iterator
        busy-loop forever without yielding (round-3 review fix)."""
        from debias_vision_lang_tpu.data.datasets import FairFace
        from debias_vision_lang_tpu.train.loop import _caption_batches

        ff = FairFace(mode="val", iat_type="gender", data_path=ff_root,
                      download=False)
        gen = _caption_batches(None, tok, batch_size=10_000, fairface=ff,
                               preprocess_px=PX,
                               rng=np.random.default_rng(0))
        with pytest.raises(ValueError, match="fewer than"):
            next(gen)

    def test_resume_does_not_extend_the_recipe(self, ff_root, tmp_path):
        """Resuming from a mid-recipe checkpoint must stop at
        epochs*steps_per_epoch total steps, not re-run extra ones
        (round-3 review fix)."""
        from debias_vision_lang_tpu.train.loop import run_training

        kw = dict(model=tiny_model(), tokenizer=tok, attribute="gender",
                  epochs=2, batch_size=8, data_path=ff_root,
                  checkpoint_dir=str(tmp_path / "ck"), eval_every=1,
                  eval_n_samples=None,
                  sensitive_prompts=["a good person", "a bad person"],
                  use_pallas=False, progress=False)
        first = run_training(**kw)
        assert first["steps"] == 4  # 2 epochs x (16/8)
        # resume from the completed run: the recipe is already done, so NO
        # additional training steps may happen
        second = run_training(**{**kw, "model": tiny_model(),
                                 "resume": True})
        assert second["steps"] == 4  # unchanged — not 4 + extra

    def test_caption_fallback_resizes_to_model_px(self, ff_root):
        """The FairFace caption fallback yields fixed [B, PX, PX, 3] uint8
        batches (threaded native ingest or bit-exact host resize), not raw
        variable-size decodes (round-3 review fix)."""
        from debias_vision_lang_tpu.data.datasets import FairFace
        from debias_vision_lang_tpu.train.loop import _caption_batches

        ff = FairFace(mode="val", iat_type="gender", data_path=ff_root,
                      download=False)
        gen = _caption_batches(None, tok, batch_size=4, fairface=ff,
                               preprocess_px=PX,
                               rng=np.random.default_rng(0))
        images, tokens = next(gen)
        assert images.shape == (4, PX, PX, 3) and images.dtype == np.uint8
        assert tokens.shape[0] == 4
