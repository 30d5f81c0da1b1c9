"""MXU/VPU overlap (ILP) experiments for the int8 fused kernels.

If q_attribution.py shows full ~= mxu + vpu (serial phases), the win is to
give Mosaic INDEPENDENT dataflow chains so matmuls of one chain can overlap
the VPU glue (quant/gelu/softmax) of another:

  mlp_fsplit2 / fsplit4 : split the hidden dim F into k independent
      up->gelu->quant->down chains inside one grid step; their partials sum
      at the end.  Chain i's down-matmul is independent of chain j's gelu.
  mlp_bb2_interleave    : bb=2 with the two batch items written as two
      explicit chains (same dataflow idea along the batch axis).

All variants are numerically equivalent to the production kernel up to
f32 summation order + per-chain activation quantization granularity
(fsplit quantizes each F-chunk's rows separately — same relaxation the
production F-split accumulation path documents).
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
        _dot_q, _quant_rows, _wrow, mlp_block_q)
    from debias_vision_lang_tpu.ops.quant import quantize_vit_visual

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    vc = cfg.vision
    d, s = vc.width, vc.seq_len
    f = 4 * d

    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))
    rq = pq["resblocks"]
    rng = np.random.default_rng(0)
    xs = [jax.device_put((rng.normal(size=(B, s, d)) * 0.5)
                         .astype(np.float32).astype(jnp.bfloat16))
          for _ in range(2)]

    def gelu(h):
        return h * jax.nn.sigmoid(1.702 * h)

    # ---- F-split chains -----------------------------------------------------

    def mlp_fsplit_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                          w2q_ref, s2_ref, b2_ref, o_ref, *, k):
        x = x_ref[:]
        xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
        xq, xsc = _quant_rows(xn)
        fc = f // k
        s1_2d = s1_ref[:].astype(jnp.float32)   # [1, F]
        b1_2d = b1_ref[:].astype(jnp.float32)
        s2row = s2_ref[:].astype(jnp.float32)[:, None, :]  # [1, 1, D]
        # stage 1: all up-proj dots (independent of each other)
        hs = []
        for i in range(k):
            w1i = w1q_ref[:, i * fc:(i + 1) * fc]
            acc = jax.lax.dot_general(xq, w1i, (((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            si = jax.lax.slice_in_dim(s1_2d, i * fc, (i + 1) * fc, axis=1)
            bi = jax.lax.slice_in_dim(b1_2d, i * fc, (i + 1) * fc, axis=1)
            h = acc.astype(jnp.float32) * xsc * si[:, None, :]
            hs.append(h + bi[:, None, :])
        # stage 2: per-chain gelu+quant+down-proj — chain i's down dot is
        # independent of chain j's VPU work, giving the scheduler overlap
        parts = []
        for i in range(k):
            g = gelu(hs[i])
            gq, gs = _quant_rows(g)
            w2i = w2q_ref[i * fc:(i + 1) * fc, :]
            acc = jax.lax.dot_general(gq, w2i, (((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            parts.append(acc.astype(jnp.float32) * gs * s2row)
        tot = parts[0]
        for p_ in parts[1:]:
            tot = tot + p_
        o_ref[:] = (x.astype(jnp.float32) + b2_ref[:][0].astype(jnp.float32)
                    + tot).astype(o_ref.dtype)

    def make_fsplit(k):
        kern = functools.partial(mlp_fsplit_kernel, k=k)

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

    # ---- bb=2 interleaved chains -------------------------------------------

    def mlp_bb2_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                       w2q_ref, s2_ref, b2_ref, o_ref):
        lns = lns_ref[:][0]
        lnb = lnb_ref[:][0]
        b1 = b1_ref[:][0].astype(jnp.float32)
        b2 = b2_ref[:][0].astype(jnp.float32)

        def chain_up(xi):
            xn = _ln_f32(xi, lns, lnb).astype(jnp.float32)
            xq, xsc = _quant_rows(xn)
            return _dot_q(xq, xsc, w1q_ref, s1_ref) + b1

        def chain_down(h):
            g = gelu(h)
            gq, gs = _quant_rows(g)
            return _dot_q(gq, gs, w2q_ref, s2_ref)

        x0 = x_ref[0:1]
        x1 = x_ref[1:2]
        h0 = chain_up(x0)
        h1 = chain_up(x1)          # independent of chain_down(h0)
        p0 = chain_down(h0)
        p1 = chain_down(h1)
        o_ref[0:1] = (x0.astype(jnp.float32) + b2 + p0).astype(o_ref.dtype)
        o_ref[1:2] = (x1.astype(jnp.float32) + b2 + p1).astype(o_ref.dtype)

    @jax.jit
    def bb2_call(x, rq):
        def body(c, lp):
            m = lp["mlp"]
            out = pl.pallas_call(
                mlp_bb2_kernel,
                out_shape=jax.ShapeDtypeStruct((B, s, d), c.dtype),
                grid=(B // 2,),
                in_specs=[
                    pl.BlockSpec((2, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((2, s, d), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(c, _row(lp["ln_2"]["scale"]), _row(lp["ln_2"]["bias"]),
              m["w1"]["q"], _wrow(m["w1"]["scale"]), _row(m["b1"]),
              m["w2"]["q"], _wrow(m["w2"]["scale"]), _row(m["b2"]))
            return out, None
        out, _ = jax.lax.scan(body, x, rq)
        return out

    @jax.jit
    def base_call(x, rq):
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
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ref = base_call(xs[0], rq)
    print(json.dumps({"mlp_base_ms": round(timeit(base_call, xs, rq) * 1e3, 2)}),
          flush=True)
    for k in (2, 4):
        fn = make_fsplit(k)
        print(json.dumps({
            f"mlp_fsplit{k}_ms": round(timeit(fn, xs, rq) * 1e3, 2),
            f"mlp_fsplit{k}_cos": round(cosine(fn(xs[0], rq), ref), 7),
        }), flush=True)
    print(json.dumps({
        "mlp_bb2_interleave_ms": round(timeit(bb2_call, xs, rq) * 1e3, 2),
        "mlp_bb2_cos": round(cosine(bb2_call(xs[0], rq), ref), 7),
    }), flush=True)


if __name__ == "__main__":
    main()
