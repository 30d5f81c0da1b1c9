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

from .fused_block import (_causal_neg, _chain_head_loop, _erf_gelu, _ln_f32,
                          _pick_fblock, _row)

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
        neg = _causal_neg(s)

    # per-head attention identical to the bf16 kernel (fp compute — the
    # [S, 64] dots are ~11% of layer FLOPs and int8 would cost accuracy).
    # KEEP IN SYNC with fused_block._chain_head_loop (the chain kernels'
    # shared loop): deliberately not delegated — the measured-optimal
    # kernels are frozen (PERF.md), and a call indirection here could not
    # be re-benchmarked during the device outage.
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
        h = _erf_gelu(h)
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


# ---------------------------------------------------------------------------
# Batch-chain interleaved kernels (round 3)
#
# Kernel decomposition (benchmarks/q_attribution.py) showed the int8 blocks
# are NOT MXU-bound: the MLP matmuls already run at ~92% of the int8 peak,
# and per grid step the VPU glue (LN/quant/gelu/softmax) that Mosaic cannot
# hide under the SAME batch item's matmuls is exposed (~12 ms MLP / ~10 ms
# attention per 12-layer tower at B=512).  Writing bb batch items as
# EXPLICIT independent dataflow chains inside one grid step lets the
# scheduler overlap chain i's VPU work with chain j's MXU dots.  Measured
# (benchmarks/q_ilp*.py, B=512, 12L): MLP 59.0 → 53.3 ms (bb=4, modulo-2
# software pipeline), attention 50.5 → 45.3 ms (bb=4, head-major
# interleave).  Per-item math is unchanged (per-row quantization
# included): attention outputs are bit-identical to bb=1; the MLP pipe
# differs by <=1 ulp of compiler-level FMA/reassociation (pinned in
# tests/test_fused_block_q.py).
# ---------------------------------------------------------------------------


def _mlp_q_up(x1, lns, lnb, w1q_ref, s1_ref, b1):
    xn = _ln_f32(x1, lns, lnb).astype(jnp.float32)
    xq, xs = _quant_rows(xn)
    return _dot_q(xq, xs, w1q_ref, s1_ref) + b1


def _mlp_q_down(h, w2q_ref, s2_ref, act_kind):
    if act_kind == "quick_gelu":
        g = h * jax.nn.sigmoid(1.702 * h)
    else:
        g = _erf_gelu(h)
    gq, gs = _quant_rows(g)
    return _dot_q(gq, gs, w2q_ref, s2_ref)


def _mlp_q_pipe_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                       w2q_ref, s2_ref, b2_ref, o_ref, *, act_kind: str,
                       bb: int):
    """bb independent chains, modulo-2 software pipeline: at most two
    hidden activations live at once (VMEM bound), while every down-proj
    dot has another chain's up/VPU work adjacent in issue order."""
    lns = lns_ref[:][0]
    lnb = lnb_ref[:][0]
    b1 = b1_ref[:][0].astype(jnp.float32)
    b2 = b2_ref[:][0].astype(jnp.float32)

    parts = [None] * bb
    h_prev = _mlp_q_up(x_ref[0:1], lns, lnb, w1q_ref, s1_ref, b1)
    for c in range(1, bb):
        h_next = _mlp_q_up(x_ref[c:c + 1], lns, lnb, w1q_ref, s1_ref, b1)
        parts[c - 1] = _mlp_q_down(h_prev, w2q_ref, s2_ref, act_kind)
        h_prev = h_next
    parts[bb - 1] = _mlp_q_down(h_prev, w2q_ref, s2_ref, act_kind)
    for c in range(bb):
        o_ref[c:c + 1] = (x_ref[c:c + 1].astype(jnp.float32) + b2
                          + parts[c]).astype(o_ref.dtype)


def _attn_q_chains_kernel(x_ref, lns_ref, lnb_ref, wqkvq_ref, sqkv_ref,
                          bqkv_ref, woq_ref, so_ref, bo_ref, o_ref, *,
                          heads: int, scale: float, causal: bool, bb: int):
    """bb chains interleaved at HEAD granularity (head-major, chains
    inner): each head's softmax (VPU) sits adjacent to another chain's
    QK/PV dots (MXU) in issue order — measured better than whole-block
    chain interleaving (50.5 → 45.3 ms bb=4 vs 48.8 bb=2-chain-major)."""
    s = x_ref.shape[1]
    d = x_ref.shape[2]
    lns = lns_ref[:][0]
    lnb = lnb_ref[:][0]
    bqkv = bqkv_ref[:][0].astype(jnp.float32)
    bo = bo_ref[:][0].astype(jnp.float32)
    neg = _causal_neg(s) if causal else None
    qkvs = []
    for c in range(bb):
        xn = _ln_f32(x_ref[c:c + 1], lns, lnb).astype(jnp.float32)
        xq, xs = _quant_rows(xn)
        qkv = _dot_q(xq, xs, wqkvq_ref, sqkv_ref)
        qkvs.append((qkv + bqkv).astype(x_ref.dtype))
    attns = _chain_head_loop(qkvs, heads, d, scale, neg, x_ref.dtype)
    for c, attn in enumerate(attns):
        aq, ascale = _quant_rows(attn.astype(jnp.float32))
        proj = _dot_q(aq, ascale, woq_ref, so_ref) + bo
        o_ref[c:c + 1] = (x_ref[c:c + 1].astype(jnp.float32)
                          + proj).astype(o_ref.dtype)


def _mlp_pipe_fits_vmem(s: int, d: int, f: int, bb: int,
                        itemsize: int = 2,
                        budget: int = None) -> bool:
    """Live set of the modulo-2 pipeline: int8 weights + 2 f32 hidden
    activations + double-buffered in/out blocks at the activation
    ``itemsize``.  Measured calibration (round-4
    `benchmarks/q_wide_chains.py`): ViT-B bb=4 bf16 (est 14.3 MB) runs;
    ViT-L/14 bb=2 bf16 (est 21.02 MB) compiles and wins at the default
    Mosaic budget (117.6 → 111.3 ms, 24-layer B=256 tower) and SLIP-L/16
    bb=2 likewise (87.4 → 81.6 ms) — while SLIP-L/16 bb=4 (est 21.3 MB)
    OOMs.  The model therefore over-counts differently per chain width,
    so bb=2 bf16 gets its own measured bound; everything else keeps the
    round-3 15 MB calibration (no measured datapoint above it)."""
    if budget is None:
        if itemsize <= 2 and bb == 2:
            budget = 21_100_000  # just above ViT-L/14 bb=2's 21,020,672
        else:
            budget = 15 * 1024 * 1024
    weights = 2 * d * f                    # int8 W1 + W2
    hidden = 2 * s * f * 4                 # two live f32 activations
    blocks = 2 * 2 * bb * s * d * itemsize  # in+out, double-buffered
    return weights + hidden + blocks <= budget


def _attn_chains_fit_vmem(s: int, d: int, bb: int, itemsize: int = 2,
                          budget: int = 15 * 1024 * 1024) -> bool:
    """Live set of the head-major chain kernel: all bb qkv tensors live the
    whole kernel; scores/probs are transient per (head, chain) step.
    ``itemsize`` = activation dtype size (the auto-pick must not assume
    bf16 — fused=True callers can feed f32, doubling qkv and io blocks).

    Round 4: budget cut 16 → 15 MiB.  SLIP-L/16 (s=197, d=1024) bb=4
    estimates 16.11 MB — inside the old budget — and CRASHES the Mosaic
    compile subprocess on jax 0.9.0 (remote_compile HTTP 500, exit 1, no
    clean OOM error), so auto-pick silently broke that tower.  Every
    measured-working attention config estimates <= 13.2 MB (ViT-B/16
    bb=4 11.45 MB, ViT-L/14 bb=2 12.62 MB, SLIP-L/16 bb=2 10.46 MB); the
    15 MiB cut keeps all of them and excludes the crasher."""
    weights = 4 * d * d                    # int8 Wqkv + Wo
    qkv = bb * s * 3 * d * itemsize        # qkv per chain, all live
    scores = 4 * s * s * 4                 # transient f32 score/prob set
    blocks = 2 * 2 * bb * s * d * itemsize  # in+out, double-buffered
    return weights + qkv + scores + blocks <= budget


def mlp_fblock_for_seq(s: int, d: int, f: int, itemsize: int = 2,
                       budget: int = 13 * 1024 * 1024):
    """Largest F-tile (divisor of ``f``, ≥128) whose bb=1 F-split MLP grid
    fits VMEM at sequence length ``s``, or None if none does.  The live-set
    model counts the double-buffered in/out blocks, the f32 accumulator
    scratch, one int8 W1+W2 tile pair and the f32 hidden tile.

    Measured calibration at the joint-video shape (s=785, d=768, f=3072,
    round 4): the model undercounts the real stack by ~2.2 MB — fb=1536
    (est 14.41 MB) compiles at an ACTUAL 16.61 MB and trips the 16 MB
    scoped-vmem limit inside the production tower (Mosaic diagnostic),
    while fb=1024 (est 12.01 MB) compiles and is also the measured-fastest
    hybrid anyway (36.2 ms vs fb=1536's 39.6 standalone; XLA tower 41.1 —
    benchmarks/video_joint_mlp.py).  The 13 MiB budget excludes the
    crasher and keeps the winner with margin.  Used by the HYBRID
    long-sequence path (ops/quant.py::transformer_q): when the attention
    kernel cannot fit ``s`` at any chain width, the MLP can still run
    fused with this tile."""
    # all divisors, not just halvings: f=3072 has the measured-best tile
    # 1024 (= f/3), which a halving walk from f would skip
    for fb in sorted((v for v in range(128, f + 1) if f % v == 0),
                     reverse=True):
        io = 2 * 2 * s * d * itemsize      # in+out blocks, double-buffered
        scratch = s * d * 4                # f32 accumulator
        weights = 2 * d * fb               # int8 W1 + W2 tiles
        hidden = s * fb * 4                # f32 hidden tile
        if io + scratch + weights + hidden <= budget:
            return fb
    return None


@functools.partial(jax.jit, static_argnames=("heads", "bb", "causal",
                                             "interpret"))
def attention_block_q(x, ln_scale, ln_bias, wqkv_q, wqkv_scale, bqkv,
                      wo_q, wo_scale, bo, *, heads: int, bb: int = None,
                      causal: bool = False, interpret: bool = False):
    """x + attn(LN(x)) with int8 QKV and out-proj matmuls.

    ``wqkv_q``/``wo_q`` int8 [D, 3D]/[D, D] with per-output-channel scales
    (ops/quant.quantize_weight layout).

    ``bb=None`` (default) auto-picks the head-major chain width (4/2/1 by
    divisibility + VMEM fit) — bb>1 interleaves bb batch items' head loops
    so softmax VPU work overlaps other chains' dots (bit-identical,
    measured 50.5 → 45.3 ms on the ViT-B/16 B=512 12-layer tower)."""
    b, s, d = x.shape
    if bb is None:
        bb = 1
        if not interpret:
            for cand in (4, 2):
                if b % cand == 0 and _attn_chains_fit_vmem(
                        s, d, cand, x.dtype.itemsize):
                    bb = cand
                    break
    if b % bb:
        raise ValueError(f"batch {b} not divisible by bb={bb} — the grid "
                         "would silently drop the remainder rows")
    dt = x.dtype
    if bb > 1:
        kern = functools.partial(_attn_q_chains_kernel, heads=heads,
                                 scale=1.0 / (d // heads) ** 0.5,
                                 causal=causal, bb=bb)
    else:
        kern = functools.partial(_attn_q_kernel, heads=heads,
                                 scale=1.0 / (d // heads) ** 0.5,
                                 causal=causal)
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
                b2, *, act_kind: str = "quick_gelu", bb: int = None,
                fb: int = None, interpret: bool = False):
    """x + mlp(LN(x)) with int8 up/down matmuls (F-split accumulation as in
    the bf16 kernel; int8 weights halve the F-tile footprint).

    ``bb=None`` (default) auto-picks the batch-chain pipeline width: the
    largest of 4/2/1 that divides B and fits VMEM — bb>1 runs bb items as
    independent interleaved chains per grid step (within 1 ulp of bb=1 —
    the modulo-2 pipeline reorders one accumulation; the ATTENTION chain
    kernel is the bit-identical one — measured 59.0 → 53.3 ms on the
    ViT-B/16 B=512 12-layer tower; see the batch-chain section above).
    Pass bb=1 to force the single-chain kernel.

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
    if f % fb:
        raise ValueError(f"mlp dim {f} not divisible by fb={fb} — the "
                         "F-tile loop would truncate the hidden sum")
    if bb is None:
        bb = 1
        if fb == f and not interpret:
            for cand in (4, 2):
                if b % cand == 0 and _mlp_pipe_fits_vmem(
                        s, d, f, cand, x.dtype.itemsize):
                    bb = cand
                    break
    if b % bb:
        raise ValueError(f"batch {b} not divisible by bb={bb}")
    # chains (the modulo-2 pipeline) need the whole hidden row resident, so
    # they only apply unsplit; an explicit bb>1 WITH an F-split runs the
    # batched F-split grid below (bb = plain batch tile there)
    if bb > 1 and fb == f:
        kern = functools.partial(_mlp_q_pipe_kernel, act_kind=act_kind, bb=bb)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, _row(ln_scale), _row(ln_bias), w1_q, _wrow(w1_scale), _row(b1),
          w2_q, _wrow(w2_scale), _row(b2))
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


def fused_q_fits_vmem(seq_len: int, width: int) -> bool:
    """Whether the int8 fused-block kernels fit VMEM at this (s, d):
    attention weights (Wqkv+Wo, 1 byte/elem — 2× laxer than the bf16 gate)
    PLUS the bb=1 attention live-set floor, which is s-dependent (qkv
    s·3d, transient f32 scores ~s²).  Every registered IMAGE arch passes
    (s ≤ 257); the video JOINT tower at s = 1+4·196 = 785 does not — its
    bb=1 attention live set estimates ~20.6 MB and the Mosaic compile
    subprocess crashes outright (HTTP 500, measured round 4 on jax 0.9.0)
    rather than raising a clean OOM, so it must be excluded here and run
    the XLA int8 path.  (The divided video path stays fused: its spatial
    blocks run at s = n ≈ 196.)"""
    if (3 * width + width) * width > 12 * 1024 * 1024:
        return False
    return _attn_chains_fit_vmem(seq_len, width, 1, 2)
