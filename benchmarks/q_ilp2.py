"""Round 2 of the ILP experiments: batch-chain interleaving.

q_ilp.py found: F-split chains are flat, but bb=2 with the two batch items
written as EXPLICIT independent chains is -8.1% on the MLP kernel (59.0 ->
54.2 ms/12L, bit-identical) — Mosaic overlaps one chain's VPU glue with
the other's matmuls when the dataflow makes them independent.  This round:

  attn_bb2   : same two-chain structure for the attention kernel
               (chain = LN+quant+QKV dot+heads+softmax+PV+quant+out-proj)
  mlp_bb4    : four chains, modulo-2 software pipeline (live hidden
               activations bounded at ~2 chains to stay inside VMEM)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("ILP_BATCH", 512))
STEPS = int(os.environ.get("ILP_STEPS", 10))


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
        _dot_q, _quant_rows, _wrow, attention_block_q)
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

    # ---- attention bb2 ------------------------------------------------------

    def attn_chain(xi, lns, lnb, wqkvq_ref, sqkv_ref, bqkv, woq_ref, so_ref,
                   bo):
        xn = _ln_f32(xi, lns, lnb).astype(jnp.float32)
        xq, xsc = _quant_rows(xn)
        qkv = _dot_q(xq, xsc, wqkvq_ref, sqkv_ref)
        qkv = (qkv + bqkv).astype(xi.dtype)
        scale = 1.0 / hd ** 0.5
        outs = []
        for h in range(heads):
            q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
            k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
            v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd,
                                     2 * d + (h + 1) * hd, axis=2)
            sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32) * scale
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(xi.dtype)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            outs.append(o.astype(xi.dtype))
        attn = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
        aq, ascale = _quant_rows(attn)
        proj = _dot_q(aq, ascale, woq_ref, so_ref) + bo
        return (xi.astype(jnp.float32) + proj)

    def attn_bb2_kernel(x_ref, lns_ref, lnb_ref, wqkvq_ref, sqkv_ref,
                        bqkv_ref, woq_ref, so_ref, bo_ref, o_ref):
        lns = lns_ref[:][0]
        lnb = lnb_ref[:][0]
        bqkv = bqkv_ref[:][0].astype(jnp.float32)
        bo = bo_ref[:][0].astype(jnp.float32)
        r0 = attn_chain(x_ref[0:1], lns, lnb, wqkvq_ref, sqkv_ref, bqkv,
                        woq_ref, so_ref, bo)
        r1 = attn_chain(x_ref[1:2], lns, lnb, wqkvq_ref, sqkv_ref, bqkv,
                        woq_ref, so_ref, bo)
        o_ref[0:1] = r0.astype(o_ref.dtype)
        o_ref[1:2] = r1.astype(o_ref.dtype)

    @jax.jit
    def attn_bb2_call(x, rq):
        def body(c, lp):
            a = lp["attn"]
            out = pl.pallas_call(
                attn_bb2_kernel,
                out_shape=jax.ShapeDtypeStruct((B, s, d), c.dtype),
                grid=(B // 2,),
                in_specs=[
                    pl.BlockSpec((2, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((2, s, d), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(c, _row(lp["ln_1"]["scale"]), _row(lp["ln_1"]["bias"]),
              a["wqkv"]["q"], _wrow(a["wqkv"]["scale"]), _row(a["bqkv"]),
              a["wo"]["q"], _wrow(a["wo"]["scale"]), _row(a["bo"]))
            return out, None
        out, _ = jax.lax.scan(body, x, rq)
        return out

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

    # ---- mlp bb4 modulo-2 pipeline -----------------------------------------

    def mlp_up(xi, lns, lnb, w1q_ref, s1_ref, b1):
        xn = _ln_f32(xi, lns, lnb).astype(jnp.float32)
        xq, xsc = _quant_rows(xn)
        return _dot_q(xq, xsc, w1q_ref, s1_ref) + b1

    def mlp_down(h, w2q_ref, s2_ref):
        g = h * jax.nn.sigmoid(1.702 * h)
        gq, gs = _quant_rows(g)
        return _dot_q(gq, gs, w2q_ref, s2_ref)

    def mlp_bb4_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                       w2q_ref, s2_ref, b2_ref, o_ref):
        lns = lns_ref[:][0]
        lnb = lnb_ref[:][0]
        b1 = b1_ref[:][0].astype(jnp.float32)
        b2 = b2_ref[:][0].astype(jnp.float32)
        h0 = mlp_up(x_ref[0:1], lns, lnb, w1q_ref, s1_ref, b1)
        h1 = mlp_up(x_ref[1:2], lns, lnb, w1q_ref, s1_ref, b1)
        p0 = mlp_down(h0, w2q_ref, s2_ref)
        h2 = mlp_up(x_ref[2:3], lns, lnb, w1q_ref, s1_ref, b1)
        p1 = mlp_down(h1, w2q_ref, s2_ref)
        h3 = mlp_up(x_ref[3:4], lns, lnb, w1q_ref, s1_ref, b1)
        p2 = mlp_down(h2, w2q_ref, s2_ref)
        p3 = mlp_down(h3, w2q_ref, s2_ref)
        for i, p_ in enumerate((p0, p1, p2, p3)):
            o_ref[i:i + 1] = (x_ref[i:i + 1].astype(jnp.float32) + b2
                              + p_).astype(o_ref.dtype)

    @jax.jit
    def mlp_bb4_call(x, rq):
        def body(c, lp):
            m = lp["mlp"]
            out = pl.pallas_call(
                mlp_bb4_kernel,
                out_shape=jax.ShapeDtypeStruct((B, s, d), c.dtype),
                grid=(B // 4,),
                in_specs=[
                    pl.BlockSpec((4, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((4, s, d), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(c, _row(lp["ln_2"]["scale"]), _row(lp["ln_2"]["bias"]),
              m["w1"]["q"], _wrow(m["w1"]["scale"]), _row(m["b1"]),
              m["w2"]["q"], _wrow(m["w2"]["scale"]), _row(m["b2"]))
            return out, None
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
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ref = attn_base(xs[0], rq)
    print(json.dumps({"attn_base_ms": round(timeit(attn_base, xs, rq) * 1e3, 2)}),
          flush=True)
    print(json.dumps({
        "attn_bb2_ms": round(timeit(attn_bb2_call, xs, rq) * 1e3, 2),
        "attn_bb2_cos": round(cosine(attn_bb2_call(xs[0], rq), ref), 7),
    }), flush=True)
    from debias_vision_lang_tpu.ops.fused_block_q import mlp_block_q

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

    mref = mlp_base(xs[0], rq)
    print(json.dumps({
        "mlp_bb4_ms": round(timeit(mlp_bb4_call, xs, rq) * 1e3, 2),
        "mlp_bb4_cos": round(cosine(mlp_bb4_call(xs[0], rq), mref), 7),
    }), flush=True)


if __name__ == "__main__":
    main()
