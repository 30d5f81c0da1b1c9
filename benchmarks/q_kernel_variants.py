"""Int8 fused-kernel variant shootout (round 3).

Stage profiling (benchmarks/stage_profile.py, B=512) shows the int8 tower
is NOT MXU-bound: the MLP tower runs at ~197 TOPS achieved — 50% of the
394 TOPS int8 peak, i.e. the int8 MXU gain is being eaten by the fp32 VPU
glue (dequant → bias+gelu → requant on the [S, 3072] hidden), and the
attention block's softmax chain (exp + per-element divide on [S,S]x12)
is its single largest component.  These variants attack the VPU chain:

  MLP:
    A  production mlp_block_q (baseline)
    B  reciprocal-quant: q = round(x * (127/amax)) — kills the per-element
       divide in _quant_rows (mul instead), dequant scale unchanged
    C  B + bf16 gelu (half the VPU bytes on the [S,3072] hidden)
  Attention:
    A  production attention_block_q (baseline)
    B  reciprocal-quant + unnormalized softmax (divide moved after PV:
       [S,64] instead of [S,S] per head) + exp2 with log2e folded into the
       scale constant
    C  B + head-PAIR packing: two d=64 heads per 128-lane dot via
       block-diagonal Q and V operands — halves the number of MXU dots
       (12 -> 6 per matmul type) at identical MAC-slot count
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("VAR_BATCH", 512))
STEPS = int(os.environ.get("VAR_STEPS", 10))
LAYERS = 12


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.ops.fused_block import _ln_f32, _row
    from debias_vision_lang_tpu.ops.fused_block_q import (
        _wrow, attention_block_q, mlp_block_q)
    from debias_vision_lang_tpu.ops.quant import quantize_vit_visual

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    vc = cfg.vision
    d, s, heads = vc.width, vc.seq_len, vc.heads
    hd = d // heads
    f = 4 * d

    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))
    rq = pq["resblocks"]

    rng = np.random.default_rng(0)
    xs = [jax.device_put((rng.normal(size=(B, s, d)) * 0.5)
                         .astype(np.float32).astype(jnp.bfloat16))
          for _ in range(2)]

    # ---------------- variant kernel bodies ---------------------------------

    def _quant_rows_recip(x_f32):
        """round(x * (127/amax)) — mul, not divide, per element."""
        amax = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        inv = 1.0 / scale  # one VPU divide per ROW, not per element
        q = jnp.clip(jnp.round(x_f32 * inv), -127, 127).astype(jnp.int8)
        return q, scale

    def _dot_q(xq, xs_, wq_ref, ws_ref):
        acc = jax.lax.dot_general(xq, wq_ref[:], (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * xs_ * ws_ref[:][0].astype(jnp.float32)

    LOG2E = 1.4426950408889634

    def mlp_q_kernel_var(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                         w2q_ref, s2_ref, b2_ref, o_ref, *, bf16_gelu):
        x = x_ref[:]
        xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
        xq, xsc = _quant_rows_recip(xn)
        h = _dot_q(xq, xsc, w1q_ref, s1_ref) + b1_ref[:][0].astype(jnp.float32)
        if bf16_gelu:
            hb = h.astype(jnp.bfloat16)
            c = jnp.asarray(-1.702, jnp.bfloat16)
            one = jnp.asarray(1.0, jnp.bfloat16)
            hb = hb / (one + jnp.exp(c * hb))
            h = hb.astype(jnp.float32)
        else:
            h = h * jax.nn.sigmoid(1.702 * h)
        hq, hs = _quant_rows_recip(h)
        part = _dot_q(hq, hs, w2q_ref, s2_ref)
        o_ref[:] = (x.astype(jnp.float32) + b2_ref[:][0].astype(jnp.float32)
                    + part).astype(o_ref.dtype)

    def make_mlp_var(bf16_gelu):
        kern = functools.partial(mlp_q_kernel_var, bf16_gelu=bf16_gelu)

        @jax.jit
        def call(x, rq):
            def body(c, lp):
                m = lp["mlp"]
                out = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((B, s, d), c.dtype),
                    grid=(B,),
                    in_specs=[
                        pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(c, _row(lp["ln_2"]["scale"]), _row(lp["ln_2"]["bias"]),
                  m["w1"]["q"], _wrow(m["w1"]["scale"]), _row(m["b1"]),
                  m["w2"]["q"], _wrow(m["w2"]["scale"]), _row(m["b2"]))
                return out, None
            out, _ = jax.lax.scan(body, x, rq)
            return out
        return call

    def attn_q_kernel_var(x_ref, lns_ref, lnb_ref, wqkvq_ref, sqkv_ref,
                          bqkv_ref, woq_ref, so_ref, bo_ref, o_ref, *,
                          packed):
        x = x_ref[:]
        xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
        xq, xsc = _quant_rows_recip(xn)
        qkv = _dot_q(xq, xsc, wqkvq_ref, sqkv_ref)
        qkv = (qkv + bqkv_ref[:][0].astype(jnp.float32)).astype(x.dtype)
        scale2 = (1.0 / hd ** 0.5) * LOG2E  # exp2 softmax, scale folded

        outs = []
        if not packed:
            for h in range(heads):
                q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
                k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
                v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd,
                                         2 * d + (h + 1) * hd, axis=2)
                sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
                sc = sc * scale2
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp2(sc - m)                      # UNnormalized
                l = jnp.sum(e, axis=-1, keepdims=True)    # [1, S, 1]
                o = jax.lax.dot_general(e.astype(x.dtype), v,
                                        (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                o = o / l                                 # divide on [S, 64]
                outs.append(o.astype(x.dtype))
        else:
            # pack two d=64 heads per 128-lane QK^T dot: block-diagonal Q
            # [1, 2*SP, 128] against K-pair [1, S, 128].  SP = S rounded up
            # to the f32 sublane tile (8) so the e-halves slice out at
            # ALIGNED sublane offsets (Mosaic cannot concat/realign
            # offset-197 slices).  PV stays per-head ([S,S]@[S,64] — its
            # contraction dim is S, already deep).
            sp = (s + 7) // 8 * 8
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, s, 2 * hd), 2)
            lo = (lane < hd).astype(jnp.float32)
            hi = 1.0 - lo
            pad = [(0, 0), (0, sp - s), (0, 0)]
            for hp in range(heads // 2):
                a0 = 2 * hp * hd
                q2w = jax.lax.slice_in_dim(qkv, a0, a0 + 2 * hd, axis=2)
                k2 = jax.lax.slice_in_dim(qkv, d + a0, d + a0 + 2 * hd, axis=2)
                q2f = q2w.astype(jnp.float32)
                qbd = jnp.concatenate(
                    [jnp.pad(q2f * lo, pad), jnp.pad(q2f * hi, pad)],
                    axis=1).astype(x.dtype)               # [1, 2*SP, 128]
                sc = jax.lax.dot_general(qbd, k2, (((2,), (2,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
                sc = sc * scale2                           # [1, 2*SP, S]
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp2(sc - m)
                l = jnp.sum(e, axis=-1, keepdims=True)
                for half in range(2):
                    eh = jax.lax.slice_in_dim(e, half * sp, half * sp + s,
                                              axis=1)     # aligned offset
                    lh = jax.lax.slice_in_dim(l, half * sp, half * sp + s,
                                              axis=1)
                    v1 = jax.lax.slice_in_dim(
                        qkv, 2 * d + a0 + half * hd,
                        2 * d + a0 + (half + 1) * hd, axis=2)
                    o = jax.lax.dot_general(eh.astype(x.dtype), v1,
                                            (((2,), (1,)), ((0,), (0,))),
                                            preferred_element_type=jnp.float32)
                    outs.append((o / lh).astype(x.dtype))
        attn = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
        aq, ascale = _quant_rows_recip(attn)
        proj = _dot_q(aq, ascale, woq_ref, so_ref)
        proj = proj + bo_ref[:][0].astype(jnp.float32)
        o_ref[:] = (x.astype(jnp.float32) + proj).astype(o_ref.dtype)

    def make_attn_var(packed):
        kern = functools.partial(attn_q_kernel_var, packed=packed)

        @jax.jit
        def call(x, rq):
            def body(c, lp):
                a = lp["attn"]
                out = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((B, s, d), c.dtype),
                    grid=(B,),
                    in_specs=[
                        pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(c, _row(lp["ln_1"]["scale"]), _row(lp["ln_1"]["bias"]),
                  a["wqkv"]["q"], _wrow(a["wqkv"]["scale"]), _row(a["bqkv"]),
                  a["wo"]["q"], _wrow(a["wo"]["scale"]), _row(a["bo"]))
                return out, None
            out, _ = jax.lax.scan(body, x, rq)
            return out
        return call

    # ---------------- baselines (production kernels) -------------------------

    @jax.jit
    def attn_base(x, rq):
        def body(c, lp):
            a = lp["attn"]
            return attention_block_q(
                c, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
                a["wo"]["q"], a["wo"]["scale"], a["bo"], heads=heads), None
        out, _ = jax.lax.scan(body, x, rq)
        return out

    @jax.jit
    def mlp_base(x, rq):
        def body(c, lp):
            m = lp["mlp"]
            return mlp_block_q(
                c, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                m["w1"]["q"], m["w1"]["scale"], m["b1"],
                m["w2"]["q"], m["w2"]["scale"], m["b2"]), None
        out, _ = jax.lax.scan(body, x, rq)
        return out

    def timeit(fn, bufs, *rest, steps=STEPS):
        np.asarray(fn(bufs[0], *rest)[:1, :1])
        np.asarray(fn(bufs[1], *rest)[:1, :1])
        t0 = time.perf_counter()
        out = None
        for i in range(steps):
            out = fn(bufs[i % 2], *rest)
        np.asarray(out[:1, :1])
        return (time.perf_counter() - t0) / steps

    def cosine(a, b):
        a = np.asarray(a, np.float32).reshape(-1)
        b = np.asarray(b, np.float32).reshape(-1)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    def emit(k, v):
        print(json.dumps({k: v}), flush=True)

    ref_mlp = mlp_base(xs[0], rq)
    ref_attn = attn_base(xs[0], rq)
    emit("mlp_A_baseline_ms", round(timeit(mlp_base, xs, rq) * 1e3, 2))
    for name, bf16_gelu in (("B_recip", False), ("C_recip_bf16gelu", True)):
        fn = make_mlp_var(bf16_gelu)
        emit(f"mlp_{name}_ms", round(timeit(fn, xs, rq) * 1e3, 2))
        emit(f"mlp_{name}_cos", round(cosine(fn(xs[0], rq), ref_mlp), 7))
    emit("attn_A_baseline_ms", round(timeit(attn_base, xs, rq) * 1e3, 2))
    for name, packed in (("B_recip_exp2_postdiv", False), ("C_headpair", True)):
        fn = make_attn_var(packed)
        emit(f"attn_{name}_ms", round(timeit(fn, xs, rq) * 1e3, 2))
        emit(f"attn_{name}_cos", round(cosine(fn(xs[0], rq), ref_attn), 7))


if __name__ == "__main__":
    main()
