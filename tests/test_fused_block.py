"""Fused transformer-block Pallas kernels (ops/fused_block.py): interpret-mode
equivalence vs the XLA resblock path, gradients, and the auto policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debias_vision_lang_tpu.models.layers import (
    init_resblocks, quick_gelu, resblock, transformer)
from debias_vision_lang_tpu.ops.fused_block import (
    fused_blocks_fit_vmem, fused_resblock, fused_transformer,
    fused_transformer_diff)

B, S, D, H, L = 4, 13, 32, 2, 3


@pytest.fixture(scope="module")
def stacked():
    return init_resblocks(jax.random.key(0), L, D)


@pytest.fixture(scope="module")
def x(stacked):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))


class TestForwardEquivalence:
    def test_single_block_matches_xla(self, stacked, x):
        layer0 = jax.tree.map(lambda a: a[0], stacked)
        ref = resblock(layer0, x, H, use_pallas=False)
        got = fused_resblock(layer0, x, H, bb_attn=2, bb_mlp=2,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_tower_matches_xla(self, stacked, x):
        ref = transformer(stacked, x, H, use_pallas=False)
        got = fused_transformer(stacked, x, H, bb_attn=1, bb_mlp=1,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5)

    def test_gelu_variant(self, stacked, x):
        import functools

        layer0 = jax.tree.map(lambda a: a[0], stacked)
        ref = resblock(layer0, x, H, use_pallas=False,
                       act=functools.partial(jax.nn.gelu, approximate=False))
        got = fused_resblock(layer0, x, H, act_kind="gelu", bb_attn=2,
                             bb_mlp=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_bf16_close_to_xla_bf16(self, stacked, x):
        xb = x.astype(jnp.bfloat16)
        ref = np.asarray(transformer(stacked, xb, H, use_pallas=False),
                         np.float32)
        got = np.asarray(fused_transformer(stacked, xb, H, bb_attn=1,
                                           bb_mlp=1, interpret=True),
                         np.float32)
        cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
        assert cos > 0.9999


class TestBatchChains:
    """Head-major chain variant of the bf16 attention kernel (round 3):
    per-item math identical to the single-chain kernel → bit-identical
    outputs, plain and causal."""

    def test_chains_bit_identical(self, stacked, x):
        from debias_vision_lang_tpu.ops.fused_block import attention_block

        layer0 = jax.tree.map(lambda a: a[0], stacked)
        args = (x, layer0["ln_1"]["scale"], layer0["ln_1"]["bias"],
                layer0["attn"]["wqkv"], layer0["attn"]["bqkv"],
                layer0["attn"]["wo"], layer0["attn"]["bo"])
        base = attention_block(*args, heads=H, bb=1, chains=1, interpret=True)
        for causal in (False, True):
            b = attention_block(*args, heads=H, bb=1, chains=1,
                                causal=causal, interpret=True)
            g = attention_block(*args, heads=H, chains=2, causal=causal,
                                interpret=True)
            np.testing.assert_array_equal(np.asarray(g), np.asarray(b))
        del base

    def test_chains_divisibility(self, stacked):
        from debias_vision_lang_tpu.ops.fused_block import attention_block

        layer0 = jax.tree.map(lambda a: a[0], stacked)
        rng = np.random.default_rng(1)
        x3 = jnp.asarray(rng.normal(size=(3, S, D)).astype(np.float32))
        with pytest.raises(ValueError, match="chains"):
            attention_block(
                x3, layer0["ln_1"]["scale"], layer0["ln_1"]["bias"],
                layer0["attn"]["wqkv"], layer0["attn"]["bqkv"],
                layer0["attn"]["wo"], layer0["attn"]["bo"],
                heads=H, bb=1, chains=2, interpret=True)


class TestCausal:
    """Text-tower variant: in-kernel causal mask must equal the XLA path
    with models.layers.causal_mask."""

    def test_causal_block_matches_xla(self, stacked, x):
        from debias_vision_lang_tpu.models.layers import causal_mask

        layer0 = jax.tree.map(lambda a: a[0], stacked)
        ref = resblock(layer0, x, H, mask=causal_mask(S), use_pallas=False)
        got = fused_resblock(layer0, x, H, bb_attn=2, bb_mlp=2, causal=True,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_causal_actually_masks(self, stacked, x):
        """Perturbing a future position must not change earlier outputs."""
        layer0 = jax.tree.map(lambda a: a[0], stacked)
        base = fused_resblock(layer0, x, H, bb_attn=2, bb_mlp=2, causal=True,
                              interpret=True)
        x2 = x.at[:, -1, :].add(3.0)
        pert = fused_resblock(layer0, x2, H, bb_attn=2, bb_mlp=2, causal=True,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(pert[:, :-1]),
                                   np.asarray(base[:, :-1]), atol=1e-6)

    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_causal_tower_gradients_match_xla(self, stacked, x):
        from debias_vision_lang_tpu.models.layers import causal_mask

        def loss_fused(p, y):
            return jnp.sum(fused_transformer_diff(p, y, H, causal=True,
                                                  interpret=True) ** 2)

        def loss_xla(p, y):
            return jnp.sum(transformer(p, y, H, mask=causal_mask(S),
                                       use_pallas=False) ** 2)

        gf = jax.grad(loss_fused)(stacked, x)
        gx = jax.grad(loss_xla)(stacked, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3),
            gf, gx)


class TestGradients:
    def test_vjp_matches_xla(self, stacked, x):
        """The custom backward is an XLA recompute — gradients must equal the
        plain path exactly (same math, same dtype)."""
        def loss_fused(p, y):
            return jnp.sum(fused_transformer_diff(p, y, H, interpret=True) ** 2)

        def loss_xla(p, y):
            return jnp.sum(transformer(p, y, H, use_pallas=False) ** 2)

        gf = jax.grad(loss_fused)(stacked, x)
        gx = jax.grad(loss_xla)(stacked, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3),
            gf, gx)

    def test_recompute_math_matches_kernel_forward(self, stacked, x):
        """The backward's recompute function must compute the SAME function
        as the forward kernel (round-3 review fix: the old resblock-based
        recompute ran a bf16 softmax for bf16 inputs — math the kernel
        never computed).  Checked in both dtypes, incl. causal."""
        from debias_vision_lang_tpu.ops.fused_block import (
            _kernel_math_resblock, fused_resblock)

        layer0 = jax.tree.map(lambda a: a[0], stacked)
        for dtype, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
            xx = x.astype(dtype)
            for causal in (False, True):
                kern = fused_resblock(layer0, xx, H, act_kind="quick_gelu",
                                      causal=causal, interpret=True)
                math_fn = _kernel_math_resblock(layer0, xx, H, "quick_gelu",
                                                causal=causal)
                np.testing.assert_allclose(
                    np.asarray(kern, np.float32),
                    np.asarray(math_fn, np.float32), atol=atol, rtol=1e-2)

    def test_bf16_gradients_differentiate_kernel_math(self, stacked, x):
        """bf16 path: the fused VJP equals jax.grad of the kernel-math
        function (by construction after the fix) and is finite."""
        from debias_vision_lang_tpu.ops.fused_block import (
            _fused_resblock_diff, _kernel_math_resblock)

        layer0 = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), stacked)
        xb = x.astype(jnp.bfloat16)

        def loss_fused(p, y):
            return jnp.sum(_fused_resblock_diff(
                p, y, H, "quick_gelu", False, True).astype(jnp.float32) ** 2)

        def loss_math(p, y):
            return jnp.sum(_kernel_math_resblock(
                p, y, H, "quick_gelu").astype(jnp.float32) ** 2)

        gf = jax.grad(loss_fused)(layer0, xb)
        gm = jax.grad(loss_math)(layer0, xb)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=5e-2, rtol=5e-2),
            gf, gm)
        assert all(np.isfinite(np.asarray(l, np.float32)).all()
                   for l in jax.tree.leaves(gf))


class TestPolicy:
    def test_vmem_fit(self):
        assert fused_blocks_fit_vmem(768)    # ViT-B
        assert fused_blocks_fit_vmem(1024)   # ViT-L (MLP F-splits)
        assert not fused_blocks_fit_vmem(2048)  # attention weights too big

    def test_fblock_split_equivalence(self, stacked, x):
        """Forcing an F-split (fb < F) must not change the MLP result."""
        from debias_vision_lang_tpu.ops.fused_block import mlp_block

        layer0 = jax.tree.map(lambda a: a[0], stacked)
        full = mlp_block(x, layer0["ln_2"]["scale"], layer0["ln_2"]["bias"],
                         layer0["mlp"]["w1"], layer0["mlp"]["b1"],
                         layer0["mlp"]["w2"], layer0["mlp"]["b2"],
                         bb=2, fb=4 * D, interpret=True)
        split = mlp_block(x, layer0["ln_2"]["scale"], layer0["ln_2"]["bias"],
                          layer0["mlp"]["w1"], layer0["mlp"]["b1"],
                          layer0["mlp"]["w2"], layer0["mlp"]["b2"],
                          bb=2, fb=D, interpret=True)  # 4 accumulation steps
        np.testing.assert_allclose(np.asarray(split), np.asarray(full),
                                   atol=2e-5)

    def test_cpu_backend_never_fused(self):
        from debias_vision_lang_tpu.core.config import VisionConfig
        from debias_vision_lang_tpu.models.clip import _use_fused_blocks

        cfg = VisionConfig(kind="vit", image_size=32, patch_size=8, width=64,
                           layers=2, heads=2, embed_dim=32)
        assert not _use_fused_blocks(cfg, jnp.bfloat16, None, None)  # cpu backend
        assert _use_fused_blocks(cfg, jnp.bfloat16, None, True)      # forced
