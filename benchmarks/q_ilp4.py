"""ILP round 4: head-pair-packed QK^T on top of the chain-interleaved
attention kernel.

Pre-chains, packed QK measured flat: its masking/pad VPU overhead was
exposed on the serial critical path.  With head-major chains the VPU is
largely hidden and the kernel is MXU-bound (attn MXU-only floor 40.5 ms vs
25.4 ideal — the d=64 dots), so halving the QK dot count (12 -> 6 per
item via a block-diagonal [2*SP, 128] Q against the contiguous 128-lane
K-pair) may now pay.  SP = S rounded to the f32 sublane tile so the two
softmax halves slice out at aligned offsets.
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

    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))
    rq = pq["resblocks"]
    rng = np.random.default_rng(0)
    xs = [jax.device_put((rng.normal(size=(B, s, d)) * 0.5)
                         .astype(np.float32).astype(jnp.bfloat16))
          for _ in range(2)]

    def make_kernel(bb):
        sp = (s + 7) // 8 * 8

        def kern(x_ref, lns_ref, lnb_ref, wqkvq_ref, sqkv_ref, bqkv_ref,
                 woq_ref, so_ref, bo_ref, o_ref):
            lns = lns_ref[:][0]
            lnb = lnb_ref[:][0]
            bqkv = bqkv_ref[:][0].astype(jnp.float32)
            bo = bo_ref[:][0].astype(jnp.float32)
            scale = 1.0 / hd ** 0.5
            qkvs = []
            for c in range(bb):
                xn = _ln_f32(x_ref[c:c + 1], lns, lnb).astype(jnp.float32)
                xq, xsc = _quant_rows(xn)
                qkv = _dot_q(xq, xsc, wqkvq_ref, sqkv_ref)
                qkvs.append((qkv + bqkv).astype(x_ref.dtype))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, s, 2 * hd), 2)
            lo = (lane < hd).astype(jnp.float32)
            hi = 1.0 - lo
            pad = [(0, 0), (0, sp - s), (0, 0)]
            outs = [[] for _ in range(bb)]
            for hp in range(heads // 2):
                a0 = 2 * hp * hd
                for c in range(bb):
                    qkv = qkvs[c]
                    q2 = jax.lax.slice_in_dim(qkv, a0, a0 + 2 * hd,
                                              axis=2).astype(jnp.float32)
                    k2 = jax.lax.slice_in_dim(qkv, d + a0, d + a0 + 2 * hd,
                                              axis=2)
                    qbd = jnp.concatenate(
                        [jnp.pad(q2 * lo, pad), jnp.pad(q2 * hi, pad)],
                        axis=1).astype(x_ref.dtype)   # [1, 2*SP, 128]
                    sc = jax.lax.dot_general(
                        qbd, k2, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32) * scale
                    m = jnp.max(sc, axis=-1, keepdims=True)
                    e = jnp.exp(sc - m)
                    l = jnp.sum(e, axis=-1, keepdims=True)
                    for half in range(2):
                        eh = jax.lax.slice_in_dim(e, half * sp,
                                                  half * sp + s, axis=1)
                        lh = jax.lax.slice_in_dim(l, half * sp,
                                                  half * sp + s, axis=1)
                        v1 = jax.lax.slice_in_dim(
                            qkv, 2 * d + a0 + half * hd,
                            2 * d + a0 + (half + 1) * hd, axis=2)
                        o = jax.lax.dot_general(
                            eh.astype(x_ref.dtype), v1,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                        outs[c].append((o / lh).astype(x_ref.dtype))
            for c in range(bb):
                attn = jnp.concatenate(outs[c], axis=-1).astype(jnp.float32)
                aq, ascale = _quant_rows(attn)
                proj = _dot_q(aq, ascale, woq_ref, so_ref) + bo
                o_ref[c:c + 1] = (x_ref[c:c + 1].astype(jnp.float32)
                                  + proj).astype(o_ref.dtype)
        return kern

    def make_call(bb):
        kern = make_kernel(bb)

        @jax.jit
        def call(x, rq):
            def body(c, lp):
                a = lp["attn"]
                out = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((B, s, d), c.dtype),
                    grid=(B // bb,),
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
                )(c, _row(lp["ln_1"]["scale"]), _row(lp["ln_1"]["bias"]),
                  a["wqkv"]["q"], _wrow(a["wqkv"]["scale"]), _row(a["bqkv"]),
                  a["wo"]["q"], _wrow(a["wo"]["scale"]), _row(a["bo"]))
                return out, None
            out, _ = jax.lax.scan(body, x, rq)
            return out
        return call

    @jax.jit
    def attn_chain_base(x, rq):
        def body(c, lp):
            a = lp["attn"]
            return attention_block_q(
                c, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
                a["wo"]["q"], a["wo"]["scale"], a["bo"], heads=heads), None
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

    ref = attn_chain_base(xs[0], rq)
    print(json.dumps({"attn_chain_bb4_base_ms":
                      round(timeit(attn_chain_base, xs, rq) * 1e3, 2)}),
          flush=True)
    for bb in (2, 4):
        fn = make_call(bb)
        print(json.dumps({
            f"attn_packed_bb{bb}_ms": round(timeit(fn, xs, rq) * 1e3, 2),
            f"attn_packed_bb{bb}_cos": round(cosine(fn(xs[0], rq), ref), 7),
        }), flush=True)


if __name__ == "__main__":
    main()
