"""Decompose the int8 fused kernels into MXU-only and VPU-only variants.

The round-3 variant shootout (q_kernel_variants.py) found every VPU-glue
micro-optimization flat (<=2%), which falsifies the naive "per-step time =
VPU + MXU" serial model or the cost attribution itself.  This benchmark
measures, for each block kernel at ViT-B/16 shapes (B=512, 12-layer scan):

  mlp_full      production int8 MLP kernel
  mlp_mxu       matmuls only: pre-quantized static input, dequant-mul kept,
                NO LayerNorm / gelu / requant (the VPU chain)
  mlp_vpu       VPU chain only: LN + quant + gelu + requant, matmuls
                replaced by a cheap slice-broadcast of matching shape
  attn_full     production int8 attention kernel
  attn_mxu      QKV/out matmuls + per-head dots, NO LN/quant/softmax
  attn_vpu      LN + quant + softmax chain, dots replaced by shape stubs

If full ~= mxu + vpu the phases serialize (no ILP across the dependency
chain); if full ~= max(mxu, vpu) Mosaic already overlaps them.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("ATTR_BATCH", 512))
STEPS = int(os.environ.get("ATTR_STEPS", 10))


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
        _dot_q, _quant_rows, _wrow)
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

    # ---- MLP kernel bodies --------------------------------------------------

    def mlp_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                   w2q_ref, s2_ref, b2_ref, o_ref, *, mode):
        x = x_ref[:]
        if mode in ("full", "vpu"):
            xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
            xq, xsc = _quant_rows(xn)
        else:  # mxu: skip LN+quant — reinterpret the bf16 input as int8 rows
            xq = jnp.clip(x.astype(jnp.float32) * 16.0, -127, 127).astype(jnp.int8)
            xsc = jnp.full((1, s, 1), 1.0 / 16.0, jnp.float32)
        if mode in ("full", "mxu"):
            h = _dot_q(xq, xsc, w1q_ref, s1_ref)
        else:  # vpu: fake the matmul with a cheap broadcast to [1, s, f]
            h = jnp.broadcast_to(
                xq.astype(jnp.float32)[:, :, :1], (1, s, f)) * xsc
        h = h + b1_ref[:][0].astype(jnp.float32)
        if mode in ("full", "vpu"):
            h = h * jax.nn.sigmoid(1.702 * h)
            hq, hs = _quant_rows(h)
        else:
            hq = h.astype(jnp.int8)
            hs = jnp.full((1, s, 1), 1.0, jnp.float32)
        if mode in ("full", "mxu"):
            part = _dot_q(hq, hs, w2q_ref, s2_ref)
        else:
            part = jnp.broadcast_to(
                hq.astype(jnp.float32)[:, :, :1], (1, s, d)) * hs
        o_ref[:] = (x.astype(jnp.float32) + b2_ref[:][0].astype(jnp.float32)
                    + part).astype(o_ref.dtype)

    def make_mlp(mode):
        kern = functools.partial(mlp_kernel, mode=mode)

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

    # ---- attention kernel bodies -------------------------------------------

    def attn_kernel(x_ref, lns_ref, lnb_ref, wqkvq_ref, sqkv_ref, bqkv_ref,
                    woq_ref, so_ref, bo_ref, o_ref, *, mode):
        x = x_ref[:]
        scale = 1.0 / hd ** 0.5
        if mode in ("full", "vpu"):
            xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
            xq, xsc = _quant_rows(xn)
        else:
            xq = jnp.clip(x.astype(jnp.float32) * 16.0, -127, 127).astype(jnp.int8)
            xsc = jnp.full((1, s, 1), 1.0 / 16.0, jnp.float32)
        if mode in ("full", "mxu"):
            qkv = _dot_q(xq, xsc, wqkvq_ref, sqkv_ref)
        else:
            qkv = jnp.broadcast_to(
                xq.astype(jnp.float32)[:, :, :1], (1, s, 3 * d)) * xsc
        qkv = (qkv + bqkv_ref[:][0].astype(jnp.float32)).astype(x.dtype)
        outs = []
        for h in range(heads):
            q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
            k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
            v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd,
                                     2 * d + (h + 1) * hd, axis=2)
            if mode in ("full", "mxu"):
                sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
            else:
                sc = jnp.broadcast_to(
                    q.astype(jnp.float32)[:, :, :1], (1, s, s))
            sc = sc * scale
            if mode in ("full", "vpu"):
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            else:
                p = sc.astype(x.dtype)
            if mode in ("full", "mxu"):
                o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
            else:
                o = jnp.broadcast_to(
                    p.astype(jnp.float32)[:, :, :1], (1, s, hd))
            outs.append(o.astype(x.dtype))
        attn = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
        if mode in ("full", "vpu"):
            aq, ascale = _quant_rows(attn)
        else:
            aq = attn.astype(jnp.int8)
            ascale = jnp.full((1, s, 1), 1.0, jnp.float32)
        if mode in ("full", "mxu"):
            proj = _dot_q(aq, ascale, woq_ref, so_ref)
        else:
            proj = jnp.broadcast_to(
                aq.astype(jnp.float32)[:, :, :1], (1, s, d)) * ascale
        proj = proj + bo_ref[:][0].astype(jnp.float32)
        o_ref[:] = (x.astype(jnp.float32) + proj).astype(o_ref.dtype)

    def make_attn(mode):
        kern = functools.partial(attn_kernel, mode=mode)

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

    def timeit(fn, bufs, *rest, steps=STEPS):
        np.asarray(fn(bufs[0], *rest)[:1, :1])
        np.asarray(fn(bufs[1], *rest)[:1, :1])
        t0 = time.perf_counter()
        out = None
        for i in range(steps):
            out = fn(bufs[i % 2], *rest)
        np.asarray(out[:1, :1])
        return (time.perf_counter() - t0) / steps

    for name, maker in (("mlp", make_mlp), ("attn", make_attn)):
        for mode in ("full", "mxu", "vpu"):
            fn = maker(mode)
            ms = round(timeit(fn, xs, rq) * 1e3, 2)
            print(json.dumps({f"{name}_{mode}_ms": ms}), flush=True)


if __name__ == "__main__":
    main()
