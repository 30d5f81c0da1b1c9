"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 implication (e)): sharded execution must equal single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from debias_vision_lang_tpu.models import clip as clip_model
from debias_vision_lang_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    clip_param_pspecs,
    create_mesh,
    replicate_params,
    shard_clip_params,
)


pytestmark = pytest.mark.slow  # multi-minute on 1-core hosts; run with -m '' for the full gate

class TestMeshCreation:
    def test_eight_devices(self):
        mesh = create_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data", "model")

    def test_2d_shape(self):
        mesh = create_mesh((4, 2))
        assert mesh.devices.shape == (4, 2)

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh((3, 2))


class TestShardedEmbedEquivalence:
    def test_dp_embed_matches_single_device(self, tiny_clip):
        """Image embeddings computed with batch sharded over 8 devices must
        equal the unsharded result."""
        cfg, params = tiny_clip
        rng = np.random.default_rng(0)
        images = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)

        single = np.asarray(
            clip_model.encode_image(params, jnp.asarray(images), cfg,
                                    use_pallas=False))

        mesh = create_mesh()
        params_r = replicate_params(params, mesh)
        images_s = jax.device_put(images, batch_sharding(mesh, 4))

        @jax.jit
        def embed(p, x):
            return clip_model.encode_image(p, x, cfg, use_pallas=False)

        sharded = np.asarray(embed(params_r, images_s))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_tp_forward_matches_replicated(self, tiny_clip):
        """Tensor-parallel params (attn/MLP sharded over `model`) must produce
        the same logits as fully-replicated params."""
        cfg, params = tiny_clip
        rng = np.random.default_rng(1)
        images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
        v = cfg.text.vocab_size
        t = np.zeros((4, 16), np.int32)
        t[:, 0] = v - 2
        t[:, 1] = rng.integers(1, 100, 4)
        t[:, 2] = v - 1

        base, _ = clip_model.forward(params, jnp.asarray(images), jnp.asarray(t),
                                     cfg, use_pallas=False)

        mesh = create_mesh((4, 2))
        params_tp = shard_clip_params(params, mesh)
        images_s = jax.device_put(images, NamedSharding(mesh, P(DATA_AXIS)))

        @jax.jit
        def fwd(p, x, tt):
            return clip_model.forward(p, x, tt, cfg, use_pallas=False)

        tp_logits, _ = fwd(params_tp, images_s, jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(base),
                                   atol=1e-4)

    def test_sharded_metrics_match(self, rng):
        """The ranking-metric kernel under a data-sharded score matrix equals
        the single-device result (psum'd top-k path)."""
        from debias_vision_lang_tpu.metrics.ranking import ranking_metrics

        scores = rng.normal(size=(8, 64)).astype(np.float32)
        labels = (rng.random(64) < 0.5).astype(np.int32)
        labels[:2] = [0, 1]
        base = ranking_metrics(scores, labels, 16, 2)

        mesh = create_mesh()
        scores_s = jax.device_put(scores, NamedSharding(mesh, P(DATA_AXIS, None)))
        labels_r = jax.device_put(labels, NamedSharding(mesh, P()))
        sharded = ranking_metrics(scores_s, labels_r, 16, 2)
        for k in base:
            np.testing.assert_allclose(np.asarray(sharded[k]), np.asarray(base[k]),
                                       atol=1e-5)


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dryrun_multichip_4(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(4)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out[0])).all()


class TestShardedRankingMetrics:
    """Exact equivalence of the ICI top-k-merge path vs single-device."""

    @pytest.mark.parametrize("topn", [7, 1.0, 0.5])
    def test_equivalence(self, rng, topn):
        from debias_vision_lang_tpu.metrics.distributed import sharded_eval_ranking
        from debias_vision_lang_tpu.metrics.ranking import eval_ranking

        n, d, p_n = 64, 16, 4
        img = rng.normal(size=(n, d)).astype(np.float32)
        prm = rng.normal(size=(p_n, d)).astype(np.float32)
        labels = (rng.random(n) < 0.5).astype(np.int32)
        labels[:2] = [0, 1]
        mesh = create_mesh()
        for ev in ("maxskew", "ndkl"):
            a = sharded_eval_ranking(labels, img, prm, ev, topn, mesh)
            b = eval_ranking(labels, img, prm, ev, topn)
            for k in a:
                np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=f"{ev}/{k}")

    def test_multiclass(self, rng):
        from debias_vision_lang_tpu.metrics.distributed import sharded_eval_ranking
        from debias_vision_lang_tpu.metrics.ranking import eval_ranking

        n = 56
        img = rng.normal(size=(n, 8)).astype(np.float32)
        prm = rng.normal(size=(3, 8)).astype(np.float32)
        labels = np.concatenate([np.arange(7), rng.integers(0, 7, n - 7)]).astype(np.int32)
        mesh = create_mesh()
        a = sharded_eval_ranking(labels, img, prm, "ndkl", 10, mesh)
        b = eval_ranking(labels, img, prm, "ndkl", 10)
        np.testing.assert_allclose(a["eq_opp"], b["eq_opp"], atol=1e-5)

    @pytest.mark.parametrize("n", [30, 61, 7])
    def test_ragged_n_exact(self, rng, n):
        """N not divisible by the axis size: the sharded engine pads with
        −inf-scoring rows and matches the single-device engine EXACTLY (no
        tail dropping)."""
        from debias_vision_lang_tpu.metrics.distributed import sharded_eval_ranking
        from debias_vision_lang_tpu.metrics.ranking import eval_ranking

        img = rng.normal(size=(n, 8)).astype(np.float32)
        prm = rng.normal(size=(3, 8)).astype(np.float32)
        labels = (rng.random(n) < 0.5).astype(np.int32)
        labels[:2] = [0, 1]
        mesh = create_mesh()
        for ev in ("maxskew", "ndkl"):
            a = sharded_eval_ranking(labels, img, prm, ev, 5, mesh)
            b = eval_ranking(labels, img, prm, ev, 5)
            for k in a:
                np.testing.assert_allclose(a[k], b[k], atol=1e-5,
                                           err_msg=f"n={n} {ev}/{k}")

    def test_boundary_ties_exact(self, rng):
        """Engineered boundary ties spanning shards: sharded == oracle
        (nlargest keep='all'), including the escalation path."""
        from debias_vision_lang_tpu.metrics import oracle
        from debias_vision_lang_tpu.metrics.distributed import sharded_eval_ranking

        n = 64
        img = np.zeros((n, 4), np.float32)
        img[:, 0] = 1.0          # all images identical → ALL scores tied
        img[5, 0] = 2.0          # except one clear winner
        prm = np.zeros((2, 4), np.float32)
        prm[:, 0] = 1.0
        labels = (np.arange(n) % 2).astype(np.int32)
        mesh = create_mesh()
        a = sharded_eval_ranking(labels, img, prm, "maxskew", 3, mesh)
        ms = oracle.maxskew(img @ prm[0], labels, 3)
        np.testing.assert_allclose(a["eq_opp"], ms["maxskew_eq_opp"], atol=1e-5)
        nd_sh = sharded_eval_ranking(labels, img, prm, "ndkl", 3, mesh)
        nd = oracle.ndkl(img @ prm[0], labels, 3)
        np.testing.assert_allclose(nd_sh["eq_opp"], nd["ndkl_eq_opp"], atol=1e-4)


class TestRaggedMeshEmbed:
    def test_non_divisible_batch_stays_sharded(self, tiny_clip):
        """get_labels_img_embeddings with a mesh and batch % data_size != 0
        pads to the mesh and slices back — identical to single-device, never
        a silent one-chip fallback."""
        from debias_vision_lang_tpu.eval.measure import (
            get_labels_img_embeddings)
        from debias_vision_lang_tpu.models.loader import CLIP

        cfg, params = tiny_clip
        model = CLIP(params=params, cfg=cfg)
        rng = np.random.default_rng(3)

        class Batch:
            def __init__(self, images, labels):
                self.images = images
                self.labels = labels
                self.num_valid = len(labels)

        batches = [Batch(rng.integers(0, 256, (10, 32, 32, 3), np.uint8),
                         np.arange(10) % 2) for _ in range(2)]  # 10 % 8 != 0

        labels_s, emb_s = get_labels_img_embeddings(
            batches, model, n_px=32, mesh=create_mesh())
        labels_1, emb_1 = get_labels_img_embeddings(batches, model, n_px=32)
        np.testing.assert_array_equal(labels_s, labels_1)
        np.testing.assert_allclose(np.asarray(emb_s), np.asarray(emb_1),
                                   atol=1e-5)


class TestInitDistributed:
    """Multi-host init utility: safe no-op single-host, env-driven."""

    def test_single_host_noop(self, monkeypatch):
        from debias_vision_lang_tpu.parallel.mesh import init_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert init_distributed() is False  # no coordinator → no-op

    def test_already_distributed_short_circuits(self, monkeypatch):
        import debias_vision_lang_tpu.parallel.mesh as mesh_mod

        monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 4)
        called = {"n": 0}
        monkeypatch.setattr(
            mesh_mod.jax.distributed, "initialize",
            lambda **kw: called.__setitem__("n", called["n"] + 1))
        assert mesh_mod.init_distributed() is True
        assert called["n"] == 0  # idempotent: no re-handshake

    def test_env_args_forwarded(self, monkeypatch):
        import debias_vision_lang_tpu.parallel.mesh as mesh_mod

        seen = {}

        def fake_init(**kw):
            seen.update(kw)

        monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", fake_init)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        # still single-process after the (mocked) handshake → returns False
        assert mesh_mod.init_distributed() is False
        assert seen == {"coordinator_address": "10.0.0.1:1234",
                        "num_processes": 4, "process_id": 2}


class TestInt8UnderMesh:
    """Round-4: the production int8 ladder certified under the mesh — a
    DP-sharded QuantizedCLIP embed, the sharded metric merge on int8
    embeddings, and the mesh serving engine at compute_dtype='int8' must
    all equal their single-device counterparts (XLA int8 lowers on the
    CPU mesh; the Pallas kernels stay auto-gated off here)."""

    def _qmodel(self, tiny_clip):
        from debias_vision_lang_tpu.models.loader import CLIP
        from debias_vision_lang_tpu.ops.quant import QuantizedCLIP

        cfg, params = tiny_clip
        return QuantizedCLIP(CLIP(params=params, cfg=cfg)), cfg

    def test_dp_int8_embed_matches_single_device(self, tiny_clip):
        qmodel, _ = self._qmodel(tiny_clip)
        rng = np.random.default_rng(3)
        images = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)

        single = np.asarray(qmodel.encode_image(jnp.asarray(images),
                                                dtype=jnp.float32))

        mesh = create_mesh()
        q_repl = jax.device_put(qmodel, NamedSharding(mesh, P()))
        images_s = jax.device_put(images, batch_sharding(mesh, 4))

        @jax.jit
        def embed(m, x):
            return m.encode_image(x, dtype=jnp.float32)

        sharded = np.asarray(embed(q_repl, images_s))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_sharded_metric_merge_on_int8_embeddings(self, tiny_clip):
        from debias_vision_lang_tpu.metrics.distributed import (
            sharded_eval_ranking)
        from debias_vision_lang_tpu.metrics.ranking import eval_ranking

        qmodel, cfg = self._qmodel(tiny_clip)
        rng = np.random.default_rng(4)
        n = 19  # ragged vs the 8-wide data axis on purpose
        images = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
        embs = np.asarray(qmodel.encode_image(jnp.asarray(images),
                                              dtype=jnp.float32))
        embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        prompts = rng.normal(size=(5, cfg.embed_dim)).astype(np.float32)
        prompts /= np.linalg.norm(prompts, axis=1, keepdims=True)
        labels = (np.arange(n) % 2).astype(np.int32)

        mesh = create_mesh()
        for evaluation in ("ndkl", "maxskew"):
            sharded = sharded_eval_ranking(labels, embs, prompts, evaluation,
                                           1.0, mesh)
            single = eval_ranking(labels, embs, prompts, evaluation, 1.0)
            for k in single:
                np.testing.assert_allclose(sharded[k], single[k], atol=1e-5)

    def test_mesh_engine_int8_matches_single_device(self, tiny_clip):
        from debias_vision_lang_tpu.models.loader import CLIP
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        cfg, params = tiny_clip
        bundle = CLIP(params=params, cfg=cfg)
        rng = np.random.default_rng(5)
        imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                for _ in range(9)]  # ragged vs bucket

        mesh = create_mesh()
        e_mesh = InferenceEngine(bundle, max_batch=16, compute_dtype="int8",
                                 mesh=mesh).embed_image_arrays(imgs)
        e_single = InferenceEngine(bundle, max_batch=16,
                                   compute_dtype="int8").embed_image_arrays(imgs)
        assert e_mesh.shape == (9, cfg.embed_dim)
        np.testing.assert_allclose(e_mesh, e_single, atol=1e-5)

    def _tokens(self, cfg, rng, b):
        v, ctx = cfg.text.vocab_size, cfg.text.context_length
        t = np.zeros((b, ctx), np.int32)
        t[:, 0] = v - 2
        t[:, 1] = rng.integers(1, 100, b)
        t[:, 2] = v - 1
        return t

    def test_dp_int8_text_encode_matches_single_device(self, tiny_clip):
        """The int8-text rung (prompt-side quantization) under the mesh:
        a DP-sharded QuantizedCLIP(quantize_text=True).encode_text must
        equal the single-device int8 text embed (VERDICT r4 item 4)."""
        from debias_vision_lang_tpu.models.loader import CLIP
        from debias_vision_lang_tpu.ops.quant import QuantizedCLIP

        cfg, params = tiny_clip
        qmodel = QuantizedCLIP(CLIP(params=params, cfg=cfg),
                               quantize_text=True)
        rng = np.random.default_rng(6)
        tokens = self._tokens(cfg, rng, 16)

        single = np.asarray(qmodel.encode_text(jnp.asarray(tokens),
                                               dtype=jnp.float32))

        mesh = create_mesh()
        q_repl = jax.device_put(qmodel, NamedSharding(mesh, P()))
        tokens_s = jax.device_put(tokens, batch_sharding(mesh, 2))

        @jax.jit
        def embed(m, t):
            return m.encode_text(t, dtype=jnp.float32)

        sharded = np.asarray(embed(q_repl, tokens_s))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_dp_int8_text_debias_injection_matches_single_device(self,
                                                                 tiny_clip):
        """int8-text through the DEBIAS bundle (prompt injection in fp at
        the embedding level, int8 resblocks after — ops/quant.py::
        encode_text_q_debias) DP-sharded == single-device."""
        from debias_vision_lang_tpu.core.config import DebiasConfig
        from debias_vision_lang_tpu.models.debias import (DebiasCLIP,
                                                          init_debias_tokens)
        from debias_vision_lang_tpu.ops.quant import QuantizedCLIP

        cfg, params = tiny_clip
        dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=cfg.text.width,
                            max_tokens=cfg.text.context_length)
        deb = init_debias_tokens(jax.random.key(9), params, dcfg)
        bundle = DebiasCLIP(clip_params=params, debias_tokens=deb,
                            clip_cfg=cfg, debias_cfg=dcfg)
        qmodel = QuantizedCLIP(bundle, quantize_text=True)
        rng = np.random.default_rng(7)
        tokens = self._tokens(cfg, rng, 16)

        single = np.asarray(qmodel.encode_text(jnp.asarray(tokens),
                                               dtype=jnp.float32))
        mesh = create_mesh()
        q_repl = jax.device_put(qmodel, NamedSharding(mesh, P()))
        tokens_s = jax.device_put(tokens, batch_sharding(mesh, 2))

        @jax.jit
        def embed(m, t):
            return m.encode_text(t, dtype=jnp.float32)

        sharded = np.asarray(embed(q_repl, tokens_s))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_tp_int8_towers_match_single_device(self, tiny_clip):
        """TP-sharded int8 towers under a {data: 4, model: 2} mesh: the
        quantized resblock weights Megatron-sharded (column/row-parallel
        q+scale pairs, parallel/mesh.py::quantized_resblock_pspecs) must
        reproduce the single-device int8 embeddings for BOTH towers
        (VERDICT r4 item 4: 'a TP-sharded int8 tower')."""
        from debias_vision_lang_tpu.models.loader import CLIP
        from debias_vision_lang_tpu.ops.quant import QuantizedCLIP
        from debias_vision_lang_tpu.parallel.mesh import shard_quantized_clip

        cfg, params = tiny_clip
        qmodel = QuantizedCLIP(CLIP(params=params, cfg=cfg),
                               quantize_text=True)
        rng = np.random.default_rng(8)
        images = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
        tokens = self._tokens(cfg, rng, 16)

        i_single = np.asarray(qmodel.encode_image(jnp.asarray(images),
                                                  dtype=jnp.float32))
        t_single = np.asarray(qmodel.encode_text(jnp.asarray(tokens),
                                                 dtype=jnp.float32))

        mesh = create_mesh((4, 2))
        q_tp = shard_quantized_clip(qmodel, mesh)
        images_s = jax.device_put(images, NamedSharding(mesh, P(DATA_AXIS)))
        tokens_s = jax.device_put(tokens, NamedSharding(mesh, P(DATA_AXIS)))

        @jax.jit
        def embed_i(m, x):
            return m.encode_image(x, dtype=jnp.float32)

        @jax.jit
        def embed_t(m, t):
            return m.encode_text(t, dtype=jnp.float32)

        np.testing.assert_allclose(np.asarray(embed_i(q_tp, images_s)),
                                   i_single, atol=1e-5)
        np.testing.assert_allclose(np.asarray(embed_t(q_tp, tokens_s)),
                                   t_single, atol=1e-5)


class TestTrainerUnderMesh:
    """The REAL AdversarialTrainer on the DP mesh (not the dryrun's
    hand-jitted step): one mesh step must match one single-device step —
    both for the decode-path ``step`` and for the frozen-embedding-cache
    ``step_from_embeddings`` (round-5, TrainConfig.cache_frozen_embeddings).
    The cache path's only mesh-specific code is ``_shard`` on the
    precomputed embedding rows; this pins that the gathered-row batches
    shard like decoded batches do."""

    CTX, VOCAB, PX = 16, 128, 32

    def _tok(self, texts):
        out = np.zeros((len(texts), self.CTX), np.int32)
        out[:, 0] = self.VOCAB - 2
        for i, t in enumerate(texts):
            out[i, 1] = abs(hash(t)) % 100 + 1
            out[i, 2] = self.VOCAB - 1
        return out

    def _trainer(self, mesh):
        from debias_vision_lang_tpu.core.config import (
            CLIPConfig, DebiasConfig, TextConfig, TrainConfig, VisionConfig)
        from debias_vision_lang_tpu.models.adversary import Adversary
        from debias_vision_lang_tpu.models.clip import init_clip_params
        from debias_vision_lang_tpu.models.debias import (
            DebiasCLIP, init_debias_tokens)
        from debias_vision_lang_tpu.train.adversarial import AdversarialTrainer

        cfg = CLIPConfig(
            name="mesh-trainer",
            vision=VisionConfig(kind="vit", image_size=self.PX, patch_size=8,
                                width=32, layers=1, heads=2, embed_dim=16),
            text=TextConfig(vocab_size=self.VOCAB, context_length=self.CTX,
                            width=32, layers=1, heads=2, embed_dim=16),
        )
        params = init_clip_params(jax.random.key(0), cfg)
        dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=32,
                            max_tokens=self.CTX)
        deb = init_debias_tokens(jax.random.key(1), params, dcfg)
        model = DebiasCLIP(clip_params=params, debias_tokens=deb,
                           clip_cfg=cfg, debias_cfg=dcfg)
        adv = Adversary.from_cfg({"ADV_N_INPUT": 2, "ADV_N_OUTPUT": 1,
                                  "ADV_HIDDEN_SIZE": 8, "SEED": 0})
        return AdversarialTrainer.create(
            model, adv, TrainConfig(batch_size=16, num_epochs=1),
            self._tok(["a good person", "a bad person"]),
            use_pallas=False, mesh=mesh)

    def _batch(self):
        rng = np.random.default_rng(3)
        B = 16
        images = rng.normal(size=(B, self.PX, self.PX, 3)).astype(np.float32)
        cap_images = rng.normal(
            size=(B, self.PX, self.PX, 3)).astype(np.float32)
        labels = (np.arange(B) % 2).astype(np.float32)
        cap_tokens = self._tok([f"caption {i}" for i in range(B)])
        return images, labels, cap_images, cap_tokens

    def test_step_mesh_matches_single_device(self):
        images, labels, cap_images, cap_tokens = self._batch()
        t1, t8 = self._trainer(None), self._trainer(create_mesh())
        for _ in range(2):  # second step exercises in-flight optimizer state
            m1 = t1.step(images, labels, cap_images, cap_tokens)
            m8 = t8.step(images, labels, cap_images, cap_tokens)
        assert m1["step"] == m8["step"] == 2
        for k in m1:
            np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=2e-5,
                                       err_msg=f"metric {k}")
        np.testing.assert_allclose(
            np.asarray(t1.model.debias_tokens),
            np.asarray(t8.model.debias_tokens), rtol=2e-4, atol=2e-5)

    def test_step_from_embeddings_mesh_matches_single_device(self):
        import jax.numpy as jnp_  # noqa: F401 (parity of imports with step)

        images, labels, cap_images, cap_tokens = self._batch()
        t1, t8 = self._trainer(None), self._trainer(create_mesh())
        # precompute the frozen rows exactly like the training loop's cache
        # (same jitted embed program each trainer would run in step())
        img_e = np.asarray(t1.fns.embed_images(
            t1.model.clip_params, jnp.asarray(images)), np.float32)
        cap_e = np.asarray(t1.fns.embed_images(
            t1.model.clip_params, jnp.asarray(cap_images)), np.float32)
        for _ in range(2):
            m1 = t1.step_from_embeddings(img_e, labels, cap_e, cap_tokens)
            m8 = t8.step_from_embeddings(img_e, labels, cap_e, cap_tokens)
        for k in m1:
            np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=2e-5,
                                       err_msg=f"metric {k}")
        np.testing.assert_allclose(
            np.asarray(t1.model.debias_tokens),
            np.asarray(t8.model.debias_tokens), rtol=2e-4, atol=2e-5)
