"""Int8 fused transformer-block kernels (ops/fused_block_q.py):
interpret-mode equivalence vs the XLA int8 path, accuracy vs fp32, F-split
consistency, causal variant, and the auto policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debias_vision_lang_tpu.models.layers import (
    causal_mask, init_resblocks, resblock, transformer)
from debias_vision_lang_tpu.ops.fused_block_q import (
    fused_q_fits_vmem, fused_resblock_q, fused_transformer_q, mlp_block_q)
from debias_vision_lang_tpu.ops.quant import (
    _use_fused_q, quantize_resblocks, resblock_q, transformer_q)

B, S, D, H, L = 4, 13, 32, 2, 3


@pytest.fixture(scope="module")
def stacked():
    return init_resblocks(jax.random.key(0), L, D)


@pytest.fixture(scope="module")
def stacked_q(stacked):
    return quantize_resblocks(stacked)


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))


class TestEquivalence:
    def test_block_close_to_xla_int8(self, stacked, stacked_q, x):
        """Same quantized weights + same dynamic activation scheme — the
        kernel and ops/quant.resblock_q differ only in fp op order (the
        kernel LNs/dequantizes in f32 where the XLA path works in x.dtype),
        so agreement is tight but not bit-exact."""
        layer0 = jax.tree.map(lambda a: a[0], stacked_q)
        ref = np.asarray(resblock_q(layer0, x, H), np.float32)
        got = np.asarray(fused_resblock_q(layer0, x, H, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got, ref, atol=5e-3)
        cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
        assert cos > 0.99999

    def test_tower_close_to_fp32(self, stacked, stacked_q, x):
        """Quantization error bound across the full L-layer tower."""
        ref = np.asarray(transformer(stacked, x, H, use_pallas=False),
                         np.float32)
        got = np.asarray(fused_transformer_q(stacked_q, x, H, interpret=True),
                         np.float32)
        cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
        assert cos > 0.999

    def test_batch_chain_kernels_bit_identical(self, stacked_q, x):
        """The bb>1 interleaved-chain kernels (round-3 ILP win) reorder
        INDEPENDENT batch items only — per-row quantization and every
        per-item op sequence are unchanged.  Attention is bit-identical;
        the MLP pipe differs from the bb=1 (scratch-accumulator) kernel by
        <=1 ulp of compiler-level FMA/reassociation."""
        from debias_vision_lang_tpu.ops.fused_block_q import attention_block_q

        layer0 = jax.tree.map(lambda a: a[0], stacked_q)
        a = layer0["attn"]
        m = layer0["mlp"]
        base_attn = attention_block_q(
            x, layer0["ln_1"]["scale"], layer0["ln_1"]["bias"],
            a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
            a["wo"]["q"], a["wo"]["scale"], a["bo"],
            heads=H, bb=1, interpret=True)
        base_mlp = mlp_block_q(
            x, layer0["ln_2"]["scale"], layer0["ln_2"]["bias"],
            m["w1"]["q"], m["w1"]["scale"], m["b1"],
            m["w2"]["q"], m["w2"]["scale"], m["b2"], bb=1, interpret=True)
        for bb in (2, 4):
            got_attn = attention_block_q(
                x, layer0["ln_1"]["scale"], layer0["ln_1"]["bias"],
                a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
                a["wo"]["q"], a["wo"]["scale"], a["bo"],
                heads=H, bb=bb, interpret=True)
            got_mlp = mlp_block_q(
                x, layer0["ln_2"]["scale"], layer0["ln_2"]["bias"],
                m["w1"]["q"], m["w1"]["scale"], m["b1"],
                m["w2"]["q"], m["w2"]["scale"], m["b2"], bb=bb,
                interpret=True)
            np.testing.assert_array_equal(np.asarray(got_attn),
                                          np.asarray(base_attn))
            np.testing.assert_allclose(np.asarray(got_mlp),
                                       np.asarray(base_mlp), atol=1e-6)

    def test_batch_chain_causal_bit_identical(self, stacked_q, x):
        from debias_vision_lang_tpu.ops.fused_block_q import attention_block_q

        layer0 = jax.tree.map(lambda a: a[0], stacked_q)
        a = layer0["attn"]
        args = (x, layer0["ln_1"]["scale"], layer0["ln_1"]["bias"],
                a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
                a["wo"]["q"], a["wo"]["scale"], a["bo"])
        base = attention_block_q(*args, heads=H, bb=1, causal=True,
                                 interpret=True)
        got = attention_block_q(*args, heads=H, bb=2, causal=True,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    def test_chain_bb_validation(self, stacked_q, x):
        from debias_vision_lang_tpu.ops.fused_block_q import attention_block_q

        layer0 = jax.tree.map(lambda a: a[0], stacked_q)
        a = layer0["attn"]
        with pytest.raises(ValueError, match="not divisible"):
            attention_block_q(
                x, layer0["ln_1"]["scale"], layer0["ln_1"]["bias"],
                a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
                a["wo"]["q"], a["wo"]["scale"], a["bo"],
                heads=H, bb=3, interpret=True)
        # explicit bb>1 WITH an F-split is the batched F-split grid (bb =
        # plain batch tile, not chains) — per-item math identical to bb=1
        m = layer0["mlp"]
        args = (x, layer0["ln_2"]["scale"], layer0["ln_2"]["bias"],
                m["w1"]["q"], m["w1"]["scale"], m["b1"],
                m["w2"]["q"], m["w2"]["scale"], m["b2"])
        base = mlp_block_q(*args, bb=1, fb=(4 * D) // 2, interpret=True)
        tiled = mlp_block_q(*args, bb=2, fb=(4 * D) // 2, interpret=True)
        np.testing.assert_array_equal(np.asarray(tiled), np.asarray(base))

    def test_fsplit_within_quant_error(self, stacked_q, x):
        """fb < F quantizes the hidden activation per F-tile (documented
        semantic relaxation) — split and unsplit agree within quantization
        error, not bit-exactly."""
        layer0 = jax.tree.map(lambda a: a[0], stacked_q)
        m = layer0["mlp"]
        args = (x, layer0["ln_2"]["scale"], layer0["ln_2"]["bias"],
                m["w1"]["q"], m["w1"]["scale"], m["b1"],
                m["w2"]["q"], m["w2"]["scale"], m["b2"])
        full = np.asarray(mlp_block_q(*args, fb=4 * D, interpret=True),
                          np.float32)
        split = np.asarray(mlp_block_q(*args, fb=2 * D, interpret=True),
                           np.float32)
        cos = (full * split).sum() / (
            np.linalg.norm(full) * np.linalg.norm(split))
        assert cos > 0.99999
        np.testing.assert_allclose(split, full, atol=5e-2)

    def test_causal_variant(self, stacked, stacked_q, x):
        """In-kernel iota mask == XLA additive causal mask (int8 path)."""
        layer0_q = jax.tree.map(lambda a: a[0], stacked_q)
        ref = np.asarray(
            resblock_q(layer0_q, x, H, mask=causal_mask(S)), np.float32)
        got = np.asarray(
            fused_resblock_q(layer0_q, x, H, causal=True, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, atol=5e-3)

    def test_bf16_activations(self, stacked_q, x):
        got = np.asarray(fused_transformer_q(
            stacked_q, x.astype(jnp.bfloat16), H, interpret=True), np.float32)
        assert np.isfinite(got).all()


class TestPolicy:
    def test_gate_off_on_cpu(self):
        assert _use_fused_q(197, 768, jnp.bfloat16, None) is False  # cpu backend

    def test_gate_explicit_override(self):
        assert _use_fused_q(197, 768, jnp.float32, True) is True
        assert _use_fused_q(197, 768, jnp.bfloat16, False) is False

    def test_vmem_fit_all_archs(self):
        for seq, width in ((50, 768), (197, 768), (257, 1024), (197, 1024),
                           (50, 640), (77, 512)):  # ViT-B/L, SLIP, text
            assert fused_q_fits_vmem(seq, width)

    def test_vmem_gate_excludes_video_joint(self):
        """s = 1 + 4·196 = 785 (T=4 joint video): the bb=1 attention live
        set (~20.6 MB) crashes the Mosaic compile subprocess on TPU
        (measured round 4, jax 0.9.0 — HTTP 500, not a clean OOM); the
        auto gate must route joint video int8 to the XLA path.  The
        divided path's spatial blocks (s≈196) stay fused-eligible."""
        assert not fused_q_fits_vmem(785, 768)
        assert fused_q_fits_vmem(196, 768)

    def test_transformer_q_fused_kwarg_interpret(self, stacked_q, x):
        """fused=True forces the kernel path (interpret impossible to pass
        through transformer_q — exercise the dispatch shim on CPU via
        fused_transformer_q directly; here just check fused=False works)."""
        out = transformer_q(stacked_q, x, H, fused=False)
        assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.slow  # >20s combos on the 1-core gate host; full suite: -m ''
class TestShapeSweep:
    """Kernel correctness across arch-like shapes (interpret mode)."""

    @pytest.mark.parametrize("d,heads,s", [
        (32, 2, 13),    # tiny / odd S
        (64, 4, 8),     # larger head count
        (48, 3, 16),    # non-pow2 width, odd heads
    ])
    def test_block_vs_xla_int8(self, d, heads, s):
        stacked = init_resblocks(jax.random.key(d), 1, d)
        sq = quantize_resblocks(stacked)
        layer0 = jax.tree.map(lambda a: a[0], sq)
        rng = np.random.default_rng(d)
        x = jnp.asarray(rng.normal(size=(2, s, d)).astype(np.float32))
        ref = np.asarray(resblock_q(layer0, x, heads), np.float32)
        got = np.asarray(fused_resblock_q(layer0, x, heads, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got, ref, atol=5e-3)


class TestHybridLongSeq:
    """The hybrid long-sequence path (round 4): when attention cannot fit
    s in VMEM (video joint tower, s=785) but the F-split MLP can, the auto
    policy runs XLA int8 attention + fused F-split MLP — measured 1.28×
    over the all-XLA MLP tower (benchmarks/video_joint_mlp.py)."""

    def test_fblock_pick_joint_video(self):
        from debias_vision_lang_tpu.ops.fused_block_q import mlp_fblock_for_seq

        # the measured winner at the joint-video shape (fb=1536 trips the
        # 16 MB scoped-vmem limit in situ — actual 16.61 MB per the Mosaic
        # diagnostic — and fb=1024 is also the faster hybrid)
        assert mlp_fblock_for_seq(785, 768, 3072) == 1024
        # image shapes fit unsplit (the hybrid path never fires there —
        # the fully-fused gate admits them first)
        assert mlp_fblock_for_seq(197, 768, 3072) == 3072
        # pathological length: no tile fits → None → all-XLA fallback
        assert mlp_fblock_for_seq(200_000, 768, 3072) is None

    def test_hybrid_dispatch_and_parity(self, stacked_q, x, monkeypatch):
        """On a (simulated) TPU backend at a long sequence, transformer_q
        must take the hybrid branch — fused F-split MLP with the picked
        tile — and its math must equal the XLA int8 path.  The real kernel
        is replaced by its reference math (CPU can't run Mosaic); the
        kernel itself is interpret-tested in TestEquivalence."""
        import functools

        import debias_vision_lang_tpu.ops.quant as quant
        from debias_vision_lang_tpu.models.layers import layer_norm

        calls = {}

        def fake_mlp_block_q(xx, lns, lnb, w1q, s1, b1, w2q, s2, b2, *,
                             act_kind, bb, fb):
            calls["fb"], calls["bb"], calls["act"] = fb, bb, act_kind
            # mirror resblock_q's MLP math exactly (same dtype order) so
            # the dispatch equality below is tight
            h = layer_norm({"scale": lns, "bias": lnb}, xx)
            h = jax.nn.gelu(quant.int8_matmul(h, {"q": w1q, "scale": s1}, b1),
                            approximate=False)
            return xx + quant.int8_matmul(h, {"q": w2q, "scale": s2}, b2)

        import debias_vision_lang_tpu.ops.fused_block_q as fbq

        monkeypatch.setattr(fbq, "mlp_block_q", fake_mlp_block_q)
        monkeypatch.setattr(quant.jax, "default_backend", lambda: "tpu")

        gelu = functools.partial(jax.nn.gelu, approximate=False)
        # s=1200: the transient f32 score set (4s²·4 ≈ 23 MB) excludes the
        # attention kernel even at D=32, while the MLP tile fits — the
        # exact regime the hybrid exists for (at s=785 scores still fit
        # at this toy width, so the fully-fused gate would admit it)
        assert not fused_q_fits_vmem(1200, D)
        xl = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 1200, D)).astype(np.float32)).astype(jnp.bfloat16)
        got = np.asarray(transformer_q(stacked_q, xl, H, act=gelu),
                         np.float32)
        # D=32 → F=128: every tile fits, pick stays unsplit at this size
        assert calls["fb"] == 128 and calls["bb"] == 1
        assert calls["act"] == "gelu"
        ref = np.asarray(transformer_q(stacked_q, xl, H, act=gelu,
                                       fused=False), np.float32)
        np.testing.assert_allclose(got, ref, atol=5e-3)


class TestRound4Calibration:
    """Round-4 measured recalibration of the chain auto-pick (PERF.md
    'Round-4 ViT-L treatment'): the fit models must reproduce the on-TPU
    measured outcomes — admit every width that ran and won, exclude the
    width that crashed the Mosaic compile subprocess."""

    def test_mlp_auto_picks(self):
        from debias_vision_lang_tpu.ops.fused_block_q import \
            _mlp_pipe_fits_vmem

        def pick(s, d, f, itemsize=2):
            return ([bb for bb in (4, 2)
                     if _mlp_pipe_fits_vmem(s, d, f, bb, itemsize)] or [1])[0]

        assert pick(197, 768, 3072) == 4   # ViT-B/16: unchanged vs round 3
        assert pick(50, 768, 3072) == 4    # ViT-B/32
        assert pick(257, 1024, 4096) == 2  # ViT-L/14: measured 117.6→111.3 ms
        assert pick(197, 1024, 4096) == 2  # SLIP-L/16: measured 87.4→81.6 ms
        # f32 callers keep the round-3 calibration (no datapoint above 15 MB)
        assert pick(257, 1024, 4096, itemsize=4) == 1

    def test_attn_auto_excludes_compiler_crasher(self):
        from debias_vision_lang_tpu.ops.fused_block_q import \
            _attn_chains_fit_vmem

        def pick(s, d, itemsize=2):
            return ([bb for bb in (4, 2)
                     if _attn_chains_fit_vmem(s, d, bb, itemsize)] or [1])[0]

        # SLIP-L/16 bb=4 (est 16.11 MB) crashed the TPU compile helper on
        # jax 0.9.0; auto must stop at bb=2 (measured-working)
        assert pick(197, 1024) == 2
        assert pick(197, 768) == 4   # ViT-B/16: unchanged
        assert pick(257, 1024) == 2  # ViT-L/14: unchanged


class TestErfGelu:
    """The kernels' polynomial exact-gelu (jax 0.9 lowers
    jax.nn.gelu(approximate=False) via erfc, which Mosaic cannot lower —
    every act_kind='gelu' fused tower failed on TPU until round 4)."""

    def test_matches_exact_gelu(self):
        from debias_vision_lang_tpu.ops.fused_block import _erf_gelu

        h = jnp.asarray(np.linspace(-12.0, 12.0, 20001), jnp.float32)
        got = np.asarray(_erf_gelu(h))
        ref = np.asarray(jax.nn.gelu(h, approximate=False))
        # A&S 7.1.26: |erf err| <= 1.5e-7 → |gelu err| <= |h|·7.5e-8
        np.testing.assert_allclose(got, ref, atol=2e-6)
        # and it must NOT be the loose tanh approximation
        tanh = np.asarray(jax.nn.gelu(h, approximate=True))
        assert np.abs(got - tanh).max() > 1e-4

    def test_odd_symmetry_and_zero(self):
        from debias_vision_lang_tpu.ops.fused_block import _erf_gelu

        assert float(_erf_gelu(jnp.float32(0.0))) == 0.0
        h = jnp.asarray([1.5, -1.5], jnp.float32)
        g = np.asarray(_erf_gelu(h))
        # gelu(x) + gelu(-x) == x·erf(x/√2) for the erf form
        import math

        np.testing.assert_allclose(g[0] + g[1],
                                   1.5 * math.erf(1.5 / math.sqrt(2)),
                                   atol=1e-6)
