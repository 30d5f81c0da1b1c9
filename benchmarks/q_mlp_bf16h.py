"""MLP pipeline experiment: bf16 hidden storage to legalize wider/deeper
chain configs.

The production modulo-2 pipeline (mlp_block_q, bb=4) keeps two f32 hidden
activations live ([197,3072]·4 B = 4.8 MB each) — that, not the VPU work,
is what caps the chain width.  Storing the hidden in bf16 between the
up-projection and the gelu/quant (cast costs 2 VPU passes; the value is
quantized to int8 right after anyway, so the rounding sits inside the
quantization error) halves the live set and legalizes:

  bb4_d2_bf16h : control — same structure as production, bf16 hidden
  bb6_d2_bf16h : 6 chains, modulo-2 (live ≈ 16.8 MB — may OOM scoped vmem)
  bb4_d3_bf16h : 4 chains, modulo-3 (three up-dots in flight)

vs the production f32-hidden bb=4 baseline at B=512, 12 layers.
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

    def pipe_kernel(x_ref, lns_ref, lnb_ref, w1q_ref, s1_ref, b1_ref,
                    w2q_ref, s2_ref, b2_ref, o_ref, *, bb, depth, bf16h):
        lns = lns_ref[:][0]
        lnb = lnb_ref[:][0]
        b1 = b1_ref[:][0].astype(jnp.float32)
        b2 = b2_ref[:][0].astype(jnp.float32)

        def up(c):
            xn = _ln_f32(x_ref[c:c + 1], lns, lnb).astype(jnp.float32)
            xq, xsc = _quant_rows(xn)
            h = _dot_q(xq, xsc, w1q_ref, s1_ref) + b1
            return h.astype(jnp.bfloat16) if bf16h else h

        def down(h):
            g = h.astype(jnp.float32)
            g = g * jax.nn.sigmoid(1.702 * g)
            gq, gs = _quant_rows(g)
            return _dot_q(gq, gs, w2q_ref, s2_ref)

        parts = [None] * bb
        live = [up(c) for c in range(min(depth - 1, bb))]
        for c in range(bb):
            nxt = c + depth - 1
            if nxt < bb:
                live.append(up(nxt))
            parts[c] = down(live.pop(0))
        for c in range(bb):
            o_ref[c:c + 1] = (x_ref[c:c + 1].astype(jnp.float32) + b2
                              + parts[c]).astype(o_ref.dtype)

    def tower(bb, depth, bf16h):
        kern = functools.partial(pipe_kernel, bb=bb, depth=depth, bf16h=bf16h)

        @jax.jit
        def call(x, rq):
            def body(c, lp):
                m = lp["mlp"]
                out = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((B, s, d), c.dtype),
                    grid=(B // bb,),
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
                )(c, _row(lp["ln_2"]["scale"]), _row(lp["ln_2"]["bias"]),
                  m["w1"]["q"], _wrow(m["w1"]["scale"]), _row(m["b1"]),
                  m["w2"]["q"], _wrow(m["w2"]["scale"]), _row(m["b2"]))
                return out, None
            out, _ = jax.lax.scan(body, x, rq)
            return out
        return call

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
    for name, bb, depth, bf16h in (("bb4_d2_bf16h", 4, 2, True),
                                   ("bb6_d2_bf16h", 6, 2, True),
                                   ("bb4_d3_bf16h", 4, 3, True)):
        if B % bb:
            continue
        fn = tower(bb, depth, bf16h)
        try:
            ms = round(timeit(fn, xs, rq) * 1e3, 2)
            cos = round(cosine(fn(xs[0], rq), ref), 7)
            print(json.dumps({f"mlp_{name}_ms": ms, f"mlp_{name}_cos": cos}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — vmem OOM is a datapoint
            msg = str(e)
            tag = "vmem OOM" if "vmem" in msg else msg[:80]
            print(json.dumps({f"mlp_{name}": tag}), flush=True)


if __name__ == "__main__":
    main()
