"""Int8 fused transformer-block Pallas kernels.

Combines the two round-2 findings:

* the fused-block kernels (ops/fused_block.py) remove the HBM traffic that
  bounds the bf16 tower (every per-layer intermediate stays in VMEM);
* **inside a Pallas kernel** the v5e MXU really does run int8×int8→int32
  faster than bf16 — measured at the MLP shape [50432,768]@[768,3072]:
  3.43 ms int8 vs 10.48 ms bf16 standalone, and 1.31×/1.12× on the full
  fused MLP/attention blocks (B=256, ViT-B/16).  The earlier "dtype-flat
  MXU" result (PERF.md round-2 roofline) was an XLA-path artifact.

Quantization scheme is EXACTLY ops/quant.py's: symmetric per-output-channel
int8 weights (``quantize_weight``/``quantize_resblocks`` layout rides in
unchanged), dynamic symmetric per-row int8 activations computed in-kernel.
LayerNorms, softmax, per-head attention, residuals and all dequantized
arithmetic stay fp32 — only the four big matmuls per layer (QKV, out-proj,
MLP up, MLP down) run on the int8 MXU path.

Accuracy at ViT-B/16 shapes (random init): cosine vs the bf16 fused kernels
0.99989 (MLP) / 0.99993 (attention) per block.  This is an opt-in speed
mode (the fp32/bf16 paths stay the defaults), same contract as ops/quant.

Reference hot loop being accelerated: debias_clip/measuring_bias.py:85-99.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import _ln_f32, _pick_fblock, _row

Params = Dict[str, Any]


def _quant_rows(x_f32):
    """Dynamic symmetric per-row int8: [..., d] → (int8, f32 scale [..., 1]).

    Matches ops/quant.int8_matmul's activation quantization bit-for-bit:
    scale = max(amax/127, 1e-8) — the clamp applies to the SCALE (as in
    int8_matmul), not to amax, so near-zero rows quantize identically."""
    amax = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x_f32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dot_q(xq, xs, wq_ref, ws_ref):
    """int8 [b, s, d] @ int8 [d, n] → f32, dequantized row×channel."""
    acc = jax.lax.dot_general(xq, wq_ref[:], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws_ref[:][0].astype(jnp.float32)


def _attn_q_kernel(x_ref, lns_ref, lnb_ref, wqkvq_ref, sqkv_ref, bqkv_ref,
                   woq_ref, so_ref, bo_ref, o_ref, *, heads: int,
                   scale: float, causal: bool = False):
    x = x_ref[:]                      # [bb, S, D] bf16
    bb, s, d = x.shape
    hd = d // heads
    xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
    xq, xs = _quant_rows(xn)
    qkv = _dot_q(xq, xs, wqkvq_ref, sqkv_ref)
    qkv = (qkv + bqkv_ref[:][0].astype(jnp.float32)).astype(x.dtype)

    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        neg = jnp.where(col <= row, 0.0, -jnp.inf).astype(jnp.float32)[None]

    # per-head attention identical to the bf16 kernel (fp compute — the
    # [S, 64] dots are ~11% of layer FLOPs and int8 would cost accuracy)
    outs = []
    for h in range(heads):
        q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
        k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd, 2 * d + (h + 1) * hd,
                                 axis=2)
        sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        if causal:
            sc = sc + neg
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1).astype(jnp.float32)

    aq, ascale = _quant_rows(attn)
    proj = _dot_q(aq, ascale, woq_ref, so_ref)
    proj = proj + bo_ref[:][0].astype(jnp.float32)
    o_ref[:] = (x.astype(jnp.float32) + proj).astype(o_ref.dtype)


def _mlp_q_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                  w2q_ref, s2_ref, b2_ref, o_ref, acc_ref, *, act_kind: str,
                  n_fblocks: int):
    j = pl.program_id(1)
    x = x_ref[:]
    xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
    xq, xs = _quant_rows(xn)
    h = _dot_q(xq, xs, w1q_ref, s1_ref) + b1_ref[:][0].astype(jnp.float32)
    if act_kind == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    hq, hs = _quant_rows(h)
    part = _dot_q(hq, hs, w2q_ref, s2_ref)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = (x.astype(jnp.float32)
                      + b2_ref[:][0].astype(jnp.float32) + part)

    @pl.when(j > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_fblocks - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _wrow(scale):
    """quantize_weight scale [1, out] (or [out]) → [1, out] f32 operand."""
    return jnp.asarray(scale, jnp.float32).reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("heads", "bb", "causal",
                                             "interpret"))
def attention_block_q(x, ln_scale, ln_bias, wqkv_q, wqkv_scale, bqkv,
                      wo_q, wo_scale, bo, *, heads: int, bb: int = 1,
                      causal: bool = False, interpret: bool = False):
    """x + attn(LN(x)) with int8 QKV and out-proj matmuls.

    ``wqkv_q``/``wo_q`` int8 [D, 3D]/[D, D] with per-output-channel scales
    (ops/quant.quantize_weight layout)."""
    b, s, d = x.shape
    dt = x.dtype
    kern = functools.partial(_attn_q_kernel, heads=heads,
                             scale=1.0 / (d // heads) ** 0.5, causal=causal)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, _row(ln_scale), _row(ln_bias), wqkv_q, _wrow(wqkv_scale),
      _row(bqkv), wo_q, _wrow(wo_scale), _row(bo))


@functools.partial(jax.jit, static_argnames=("act_kind", "bb", "fb",
                                             "interpret"))
def mlp_block_q(x, ln_scale, ln_bias, w1_q, w1_scale, b1, w2_q, w2_scale,
                b2, *, act_kind: str = "quick_gelu", bb: int = 1,
                fb: int = None, interpret: bool = False):
    """x + mlp(LN(x)) with int8 up/down matmuls (F-split accumulation as in
    the bf16 kernel; int8 weights halve the F-tile footprint).

    NB: with ``fb < F`` the hidden activation quantizes per F-tile — each
    tile gets its own per-row scale, a (slightly finer-grained) relaxation
    of the unsplit kernel's full-row quantization, so split and unsplit
    outputs differ within quantization error.  Irrelevant in practice: at
    int8 weight sizes every registered arch (incl. ViT-L, F=4096) fits
    VMEM unsplit."""
    b, s, d = x.shape
    f = w1_q.shape[-1]
    dt = x.dtype
    if fb is None:
        fb = _pick_fblock(d, f, itemsize=1)
    n_fb = f // fb
    kern = functools.partial(_mlp_q_kernel, act_kind=act_kind, n_fblocks=n_fb)
    w1s = _wrow(w1_scale)
    w2s = _wrow(w2_scale)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
        grid=(b // bb, n_fb),
        in_specs=[
            pl.BlockSpec((bb, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, fb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bb, s, d), jnp.float32)],
        interpret=interpret,
    )(x, _row(ln_scale), _row(ln_bias), w1_q, w1s, _row(b1),
      w2_q, w2s, _row(b2))


def fused_resblock_q(layer_q: Params, x: jax.Array, heads: int, *,
                     act_kind: str = "quick_gelu", causal: bool = False,
                     interpret: bool = False) -> jax.Array:
    """One residual block from a quantize_resblocks layer slice."""
    a = layer_q["attn"]
    x = attention_block_q(
        x, layer_q["ln_1"]["scale"], layer_q["ln_1"]["bias"],
        a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
        a["wo"]["q"], a["wo"]["scale"], a["bo"],
        heads=heads, causal=causal, interpret=interpret)
    m = layer_q["mlp"]
    return mlp_block_q(
        x, layer_q["ln_2"]["scale"], layer_q["ln_2"]["bias"],
        m["w1"]["q"], m["w1"]["scale"], m["b1"],
        m["w2"]["q"], m["w2"]["scale"], m["b2"],
        act_kind=act_kind, interpret=interpret)


def fused_transformer_q(stacked_q: Params, x: jax.Array, heads: int, *,
                        act_kind: str = "quick_gelu", causal: bool = False,
                        interpret: bool = False) -> jax.Array:
    """Int8 fused tower: lax.scan over quantize_resblocks stacked params."""
    def body(carry, layer_q):
        return fused_resblock_q(layer_q, carry, heads, act_kind=act_kind,
                                causal=causal, interpret=interpret), None

    out, _ = jax.lax.scan(body, x, stacked_q)
    return out


def fused_q_fits_vmem(width: int) -> bool:
    """Int8 attention weights (Wqkv+Wo, 1 byte/elem) vs the VMEM budget —
    2× laxer than the bf16 gate (1 vs 2 bytes/elem); every registered arch
    passes."""
    return (3 * width + width) * width <= 12 * 1024 * 1024
