"""Do the batch-chain ILP wins transfer to the bf16 fused kernels?

The bf16 blocks have the same serial LN→dots→softmax/gelu chain per batch
item, but their matmuls run at half the int8 rate, so the VPU share is
smaller.  Measures the bf16 attention kernel with head-major bb=2 chains
(bb=4 qkv exceeds VMEM at 2 bytes/elem) and the bf16 MLP with bb=2
pipeline vs the production bb=1 kernels (12-layer scans, B=512).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("CH_BATCH", 512))
STEPS = int(os.environ.get("CH_STEPS", 10))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.models.layers import init_resblocks
    from debias_vision_lang_tpu.ops.fused_block import (
        _ln_f32, _row, attention_block, mlp_block)

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    vc = cfg.vision
    d, s, heads = vc.width, vc.seq_len, vc.heads
    hd = d // heads
    f = 4 * d

    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    stacked = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32),
                     params["visual"]["resblocks"]))
    rng = np.random.default_rng(0)
    xs = [jax.device_put((rng.normal(size=(B, s, d)) * 0.5)
                         .astype(np.float32).astype(jnp.bfloat16))
          for _ in range(2)]

    def attn_chains_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                           wo_ref, bo_ref, o_ref, *, bb):
        lns = lns_ref[:][0]
        lnb = lnb_ref[:][0]
        scale = 1.0 / hd ** 0.5
        qkvs = []
        for c in range(bb):
            xn = _ln_f32(x_ref[c:c + 1], lns, lnb)
            qkv = jax.lax.dot_general(xn, wqkv_ref[:], (((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            qkvs.append((qkv + bqkv_ref[:][0].astype(jnp.float32))
                        .astype(x_ref.dtype))
        outs = [[] for _ in range(bb)]
        for h in range(heads):
            for c in range(bb):
                qkv = qkvs[c]
                q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
                k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd,
                                         axis=2)
                v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd,
                                         2 * d + (h + 1) * hd, axis=2)
                sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
                sc = sc * scale
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x_ref.dtype)
                o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                outs[c].append(o.astype(x_ref.dtype))
        for c in range(bb):
            attn = jnp.concatenate(outs[c], axis=-1)
            proj = jax.lax.dot_general(attn, wo_ref[:], (((2,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            proj = proj + bo_ref[:][0].astype(jnp.float32)
            o_ref[c:c + 1] = (x_ref[c:c + 1].astype(jnp.float32)
                              + proj).astype(o_ref.dtype)

    def make_attn_chains(bb):
        kern = functools.partial(attn_chains_kernel, bb=bb)

        @jax.jit
        def call(x, stacked):
            def body(c, lp):
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
                        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(c, _row(lp["ln_1"]["scale"]), _row(lp["ln_1"]["bias"]),
                  lp["attn"]["wqkv"].astype(c.dtype), _row(lp["attn"]["bqkv"]),
                  lp["attn"]["wo"].astype(c.dtype), _row(lp["attn"]["bo"]))
                return out, None
            out, _ = jax.lax.scan(body, x, stacked)
            return out
        return call

    @jax.jit
    def attn_base(x, stacked):
        def body(c, lp):
            return attention_block(
                c, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"],
                lp["attn"]["wo"], lp["attn"]["bo"], heads=heads, bb=1), None
        out, _ = jax.lax.scan(body, x, stacked)
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

    ref = attn_base(xs[0], stacked)
    print(json.dumps({"bf16_attn_base_ms":
                      round(timeit(attn_base, xs, stacked) * 1e3, 2)}),
          flush=True)
    fn = make_attn_chains(2)
    print(json.dumps({
        "bf16_attn_bb2_ms": round(timeit(fn, xs, stacked) * 1e3, 2),
        "bf16_attn_bb2_cos": round(cosine(fn(xs[0], stacked), ref), 7),
    }), flush=True)


if __name__ == "__main__":
    main()
