"""Fused transformer-block Pallas kernels for HBM-bandwidth-bound TPUs.

Profiling on v5e (through the axon relay, batch 256, ViT-B/16) shows the
tower is BANDWIDTH-bound, not FLOP-bound: effective HBM bandwidth measured
at ~134-225 GB/s (add_add residual fusions alone cost 32 ms/step; the
[B,H,S,S] probability tensor adds ~476 MB of traffic per layer).  The fix
is structural: keep every per-layer intermediate — LN output, QKV, scores,
probabilities, attention output, MLP hidden — in VMEM and only touch HBM
for the block input, output, and weights.

Two kernels per layer (the full block's weights + activations exceed the
16 MB VMEM budget as one kernel):

  attention_block:  out = x + (LN1(x) @ Wqkv → per-head attention) @ Wo
  mlp_block:        out = x + gelu(LN2(x) @ W1) @ W2

HBM traffic per layer drops from ~1.5-2 GB to ~4 × 77 MB (x in/out twice)
+ 14 MB of weights.

Weights ride as pallas operands with constant index maps (fetched once,
revolving-buffer-cached across grid steps).  The head loop is unrolled in
the kernel (12 small dots); scores stay f32 in registers/VMEM.

Reference hot loop being accelerated: debias_clip/measuring_bias.py:85-99.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def _ln_f32(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _erf_gelu(h):
    """Exact (erf) gelu for Pallas kernels, via the Abramowitz & Stegun
    7.1.26 rational polynomial (|erf err| <= 1.5e-7) — uses only exp.

    jax 0.9 lowers ``jax.nn.gelu(approximate=False)`` through
    ``lax.erfc``, and Mosaic implements neither erf nor erfc inside TPU
    kernels (measured round 4: every act_kind="gelu" fused tower — SLIP
    bf16 and int8 — failed to lower on jax/jaxlib 0.9.0).  Resulting
    gelu abs error <= |h| * 7.5e-8, far below the kernels' bf16/int8
    activation noise and the 2e-5 fused-vs-XLA parity tolerance.
    ``h`` is expected f32 (all call sites compute the MLP hidden in f32).
    """
    x = h * 0.7071067811865476  # h / sqrt(2)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))
    return h * 0.5 * (1.0 + erf)


def _attn_block_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wo_ref, bo_ref, o_ref, *, heads: int, scale: float,
                       causal: bool = False):
    x = x_ref[:]                       # [Bb, S, D] bf16
    bb, s, d = x.shape
    hd = d // heads
    xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0])
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:][0].astype(jnp.float32)).astype(x.dtype)

    if causal:
        # additive causal mask, computed in-kernel (iota is free; shipping a
        # [S, S] operand would cost HBM traffic per grid step)
        neg = _causal_neg(s)

    outs = []
    for h in range(heads):
        # static lane slices (Mosaic can't reshape-split the lane dim)
        q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
        k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd, 2 * d + (h + 1) * hd,
                                 axis=2)
        sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        sc = sc * scale
        if causal:
            sc = sc + neg
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1)  # [Bb, S, D]
    proj = jax.lax.dot_general(attn, wo_ref[:], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    proj = proj + bo_ref[:][0].astype(jnp.float32)
    o_ref[:] = (x.astype(jnp.float32) + proj).astype(o_ref.dtype)


def _causal_neg(s: int):
    """[1, S, S] additive causal mask (0 below/on diagonal, -inf above)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return jnp.where(col <= row, 0.0, -jnp.inf).astype(jnp.float32)[None]


def _chain_head_loop(qkvs, heads: int, d: int, scale: float, neg, dtype):
    """The shared head-major chain interleave: for each head, walk every
    chain's [1, S, 3D] qkv — one chain's softmax (VPU) sits adjacent to
    another chain's QK/PV dots (MXU) in issue order, which is the whole
    point of the chain kernels (measured in both the int8 and bf16
    variants; see the batch-chain sections of PERF.md).  Returns one
    [1, S, D] concatenated attention output per chain."""
    hd = d // heads
    outs = [[] for _ in qkvs]
    for h in range(heads):
        for c, qkv in enumerate(qkvs):
            q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
            k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd,
                                     axis=2)
            v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd,
                                     2 * d + (h + 1) * hd, axis=2)
            sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            sc = sc * scale
            if neg is not None:
                sc = sc + neg
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            outs[c].append(o.astype(dtype))
    return [jnp.concatenate(chain_outs, axis=-1) for chain_outs in outs]


def _attn_chains_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                        wo_ref, bo_ref, o_ref, *, heads: int, scale: float,
                        causal: bool, chains: int):
    """Head-major batch-chain variant (round 3): ``chains`` batch items as
    explicit independent dataflow chains, head loops interleaved, so one
    chain's softmax VPU work overlaps another's dots.  Bit-identical to
    the single-chain kernel; measured 62.6 → 57.2 ms on the bf16 ViT-B/16
    B=512 12-layer attention tower (same structure as the int8 kernels'
    measured win, ops/fused_block_q.py)."""
    s = x_ref.shape[1]
    d = x_ref.shape[2]
    lns = lns_ref[:][0]
    lnb = lnb_ref[:][0]
    neg = _causal_neg(s) if causal else None
    qkvs = []
    for c in range(chains):
        xn = _ln_f32(x_ref[c:c + 1], lns, lnb)
        qkv = jax.lax.dot_general(xn, wqkv_ref[:], (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        qkvs.append((qkv + bqkv_ref[:][0].astype(jnp.float32))
                    .astype(x_ref.dtype))
    attns = _chain_head_loop(qkvs, heads, d, scale, neg, x_ref.dtype)
    for c, attn in enumerate(attns):
        proj = jax.lax.dot_general(attn, wo_ref[:], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        proj = proj + bo_ref[:][0].astype(jnp.float32)
        o_ref[c:c + 1] = (x_ref[c:c + 1].astype(jnp.float32)
                          + proj).astype(o_ref.dtype)


def _attn_bf16_chains_fit_vmem(s: int, d: int, chains: int,
                               itemsize: int = 2,
                               budget: int = 16 * 1024 * 1024) -> bool:
    """Live set: weights + all chains' qkv + transient scores +
    double-buffered io blocks, at the activation ``itemsize`` (ViT-B bf16
    chains=2 ≈ 11.3 MB; ViT-L ≈ 17 MB → falls back to single-chain; f32
    inputs double everything — the auto-pick must account for it)."""
    weights = 4 * d * d * itemsize
    qkv = chains * s * 3 * d * itemsize
    scores = 4 * s * s * 4
    blocks = 2 * 2 * chains * s * d * itemsize
    return weights + qkv + scores + blocks <= budget


def _mlp_block_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, acc_ref, *, act_kind: str,
                      n_fblocks: int):
    """MLP with the hidden dim F split over grid dim 1: each step computes a
    gelu(xn @ W1[:, f]) @ W2[f, :] partial and accumulates in f32 scratch —
    lets arbitrarily wide MLPs (ViT-L: F=4096) stay VMEM-resident."""
    j = pl.program_id(1)
    x = x_ref[:]
    xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0])
    h = jax.lax.dot_general(xn, w1_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[:][0].astype(jnp.float32)
    if act_kind == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:  # exact erf gelu (timm towers); poly erf — see _erf_gelu
        h = _erf_gelu(h)
    h = h.astype(x.dtype)
    part = jax.lax.dot_general(h, w2_ref[:], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

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


def _row(v):
    return v.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("heads", "bb", "causal",
                                             "interpret", "chains"))
def attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, *,
                    heads: int, bb: int = None, causal: bool = False,
                    interpret: bool = False, chains: int = None):
    """x: [B, S, D] → x + attn(LN(x)).  B must be divisible by bb.
    ``causal=True`` applies CLIP's text-tower causal mask in-kernel.

    With both ``bb`` and ``chains`` at their None defaults, auto-picks the
    head-major batch-chain width (chains=2 when B is even, the activation
    dtype's chain live set fits VMEM — bit-identical, measured -8.6% on
    the bf16 ViT-B/16 tower), falling back to the batched single-chain
    kernel.  An EXPLICIT ``bb`` selects the batched kernel with
    that grid tile (no chain auto-pick — benchmark baselines depend on
    this); chains>1 runs ``chains`` interleaved single-item dataflow
    chains per grid step, ignoring bb.  The no-chain fallback is bb=1
    (the measured-fastest single-chain config on v5e)."""
    b, s, d = x.shape
    if chains is None:
        chains = 1
        if (bb is None and not interpret and b % 2 == 0
                and _attn_bf16_chains_fit_vmem(s, d, 2, x.dtype.itemsize)):
            chains = 2
    if bb is None:
        bb = 1
    if chains > 1:
        if b % chains:
            raise ValueError(f"batch {b} not divisible by chains={chains}")
        dt = x.dtype
        kern = functools.partial(_attn_chains_kernel, heads=heads,
                                 scale=1.0 / (d // heads) ** 0.5,
                                 causal=causal, chains=chains)
        cb = chains
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
            grid=(b // cb,),
            in_specs=[
                pl.BlockSpec((cb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cb, s, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, _row(ln_scale), _row(ln_bias), wqkv.astype(dt), _row(bqkv),
          wo.astype(dt), _row(bo))
    if b % bb:
        raise ValueError(f"batch {b} not divisible by bb={bb} — the grid "
                         "would silently drop the remainder rows")
    dt = x.dtype
    kern = functools.partial(_attn_block_kernel, heads=heads,
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
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, _row(ln_scale), _row(ln_bias), wqkv.astype(dt), _row(bqkv),
      wo.astype(dt), _row(bo))


def _pick_fblock(d: int, f: int, itemsize: int = 2,
                 budget: int = 10 * 1024 * 1024) -> int:
    # budget tuned so ViT-B (W1+W2 = 9.4 MB) stays single-block — the
    # accumulation path costs ~8% and is only worth it when weights
    # genuinely exceed VMEM (ViT-L: 16.8 MB → fb=2048)
    """Largest divisor of f whose W1+W2 blocks fit the weight budget."""
    fb = f
    while 2 * d * fb * itemsize > budget or f % fb != 0:
        fb //= 2
        if fb < 128:
            raise ValueError(
                f"no F-tile >= 128 divides mlp dim {f} within the VMEM "
                f"budget (d={d}); pass fb explicitly or use the XLA path")
    return fb


@functools.partial(jax.jit, static_argnames=("act_kind", "bb", "fb",
                                             "interpret"))
def mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, *,
              act_kind: str = "quick_gelu", bb: int = 2, fb: int = None,
              interpret: bool = False):
    """x: [B, S, D] → x + mlp(LN(x)).

    The hidden dim F is tiled over grid dim 1 with f32 scratch accumulation
    (``fb`` = F-tile, auto-picked to fit VMEM) so ViT-L-sized MLPs run
    fused too."""
    b, s, d = x.shape
    f = w1.shape[-1]
    if b % bb:
        raise ValueError(f"batch {b} not divisible by bb={bb}")
    dt = x.dtype
    if fb is None:
        fb = _pick_fblock(d, f)
    if f % fb:
        raise ValueError(f"mlp dim {f} not divisible by fb={fb} — the "
                         "F-tile loop would truncate the hidden sum")
    n_fb = f // fb
    kern = functools.partial(_mlp_block_kernel, act_kind=act_kind,
                             n_fblocks=n_fb)
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
            pl.BlockSpec((fb, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bb, s, d), jnp.float32)],
        interpret=interpret,
    )(x, _row(ln_scale), _row(ln_bias), w1.astype(dt), _row(b1),
      w2.astype(dt), _row(b2))


def fused_resblock(layer_p: Params, x: jax.Array, heads: int, *,
                   act_kind: str = "quick_gelu", bb_attn: int = None,
                   bb_mlp: int = 2, causal: bool = False,
                   interpret: bool = False) -> jax.Array:
    """One pre-LN residual block via the two fused kernels (layer_p is an
    UNstacked slice of models.layers.init_resblocks params)."""
    x = attention_block(
        x, layer_p["ln_1"]["scale"], layer_p["ln_1"]["bias"],
        layer_p["attn"]["wqkv"], layer_p["attn"]["bqkv"],
        layer_p["attn"]["wo"], layer_p["attn"]["bo"],
        heads=heads, bb=bb_attn, causal=causal, interpret=interpret)
    return mlp_block(
        x, layer_p["ln_2"]["scale"], layer_p["ln_2"]["bias"],
        layer_p["mlp"]["w1"], layer_p["mlp"]["b1"],
        layer_p["mlp"]["w2"], layer_p["mlp"]["b2"],
        act_kind=act_kind, bb=bb_mlp, interpret=interpret)


def fused_transformer(stacked: Params, x: jax.Array, heads: int, *,
                      act_kind: str = "quick_gelu", bb_attn: int = None,
                      bb_mlp: int = 2, interpret: bool = False) -> jax.Array:
    """Stacked-resblock tower via lax.scan over the fused kernels."""
    def body(carry, layer_p):
        y = fused_resblock(layer_p, carry, heads, act_kind=act_kind,
                           bb_attn=bb_attn, bb_mlp=bb_mlp,
                           interpret=interpret)
        return y, None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


# ---------------------------------------------------------------------------
# Differentiable wrapper + auto policy
# ---------------------------------------------------------------------------


def _xla_resblock(layer_p, x, heads, act_kind, causal=False):
    from ..models.layers import causal_mask, quick_gelu, resblock

    act = quick_gelu if act_kind == "quick_gelu" else functools.partial(
        jax.nn.gelu, approximate=False)
    mask = causal_mask(x.shape[1]) if causal else None
    return resblock(layer_p, x, heads, mask=mask, use_pallas=False, act=act)


def _kernel_math_resblock(layer_p, x, heads, act_kind, causal=False):
    """The fused kernels' math as differentiable XLA — mirrors
    _attn_block_kernel + _mlp_block_kernel exactly: f32 LayerNorm,
    f32-accumulated dots with input-dtype rounding of qkv/probs/attn,
    f32 softmax, f32 residual adds.  The custom VJP differentiates THIS,
    not ``resblock`` — resblock's bf16 attention branch runs a bf16
    softmax (and bf16 residual adds) the forward kernel never computes,
    so its gradients would belong to a different function (same
    consistency rule as ops/attention.py::_attention_kernel_math)."""
    import math as _math

    b, s, d = x.shape
    hd = d // heads
    scale = 1.0 / _math.sqrt(hd)
    ap, mp = layer_p["attn"], layer_p["mlp"]

    xn = _ln_f32(x, layer_p["ln_1"]["scale"], layer_p["ln_1"]["bias"])
    qkv = jax.lax.dot_general(xn, ap["wqkv"].astype(x.dtype),
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + ap["bqkv"].astype(jnp.float32)).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b, s, heads, hd)
    kh = k.reshape(b, s, heads, hd)
    vh = v.reshape(b, s, heads, hd)
    sc = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                    preferred_element_type=jnp.float32) * scale
    if causal:
        sc = sc + _causal_neg(s)[:, None]
    m = jax.lax.stop_gradient(jnp.max(sc, axis=-1, keepdims=True))
    e = jnp.exp(sc - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(b, s, d)
    proj = jax.lax.dot_general(o, ap["wo"].astype(x.dtype),
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    proj = proj + ap["bo"].astype(jnp.float32)
    x = (x.astype(jnp.float32) + proj).astype(x.dtype)

    xn2 = _ln_f32(x, layer_p["ln_2"]["scale"], layer_p["ln_2"]["bias"])
    h = jax.lax.dot_general(xn2, mp["w1"].astype(x.dtype),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + mp["b1"].astype(jnp.float32)
    if act_kind == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = _erf_gelu(h)
    h = h.astype(x.dtype)
    part = jax.lax.dot_general(h, mp["w2"].astype(x.dtype),
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    out = x.astype(jnp.float32) + mp["b2"].astype(jnp.float32) + part
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_resblock_diff(layer_p, x, heads, act_kind, causal=False,
                         interpret=False):
    # bb_attn=None → chain auto-pick (chains=2 when the live set fits,
    # else the measured-fastest bb=1); MLP stays the bb=1 single-chain
    return fused_resblock(layer_p, x, heads, act_kind=act_kind,
                          bb_attn=None, bb_mlp=1, causal=causal,
                          interpret=interpret)


def _fused_fwd(layer_p, x, heads, act_kind, causal=False, interpret=False):
    return (_fused_resblock_diff(layer_p, x, heads, act_kind, causal,
                                 interpret),
            (layer_p, x))


def _fused_bwd(heads, act_kind, causal, interpret, res, g):
    # backward via XLA recompute of the KERNEL'S math (f32 softmax, f32
    # residual adds) — NOT resblock, whose bf16 attention branch computes
    # a bf16 softmax the forward kernel never ran; gradients must belong
    # to the function the forward evaluated (round-3 review fix)
    layer_p, x = res
    _, vjp = jax.vjp(
        lambda p, y: _kernel_math_resblock(p, y, heads, act_kind, causal),
        layer_p, x)
    return vjp(g)


_fused_resblock_diff.defvjp(_fused_fwd, _fused_bwd)


def fused_blocks_fit_vmem(width: int, dtype=jnp.bfloat16) -> bool:
    """Conservative VMEM check.  The MLP kernel F-splits itself, so only the
    attention kernel's resident weights (Wqkv + Wo) gate the policy (16
    MB/core budget, ~12 MB usable after activations and double buffering) —
    the MLP dim plays no part.  ViT-B (768) and ViT-L (1024) both pass."""
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    attn_weights = (3 * width + width) * width * itemsize
    return attn_weights <= 12 * 1024 * 1024


def fused_transformer_diff(stacked: Params, x: jax.Array, heads: int, *,
                           act_kind: str = "quick_gelu", causal: bool = False,
                           interpret: bool = False) -> jax.Array:
    """Differentiable fused tower: fused Pallas forward (bb=1 — the
    measured-fastest config: 94.6 → 62.3 ms on the ViT-B/16 batch-256 tower,
    v5e), XLA-recompute backward.  lax.scan over stacked layer params.
    ``causal=True`` = CLIP text tower (in-kernel causal mask)."""
    def body(carry, layer_p):
        return (_fused_resblock_diff(layer_p, carry, heads, act_kind,
                                     causal, interpret), None)

    out, _ = jax.lax.scan(body, x, stacked)
    return out
