"""Layer-fused chain experiment: attention+MLP of one transformer layer in
a SINGLE pallas_call, with batch chains pipelined ACROSS the
attention/MLP boundary.

Round-2 whole-layer fusion (pre-chains) measured slower and was closed;
the round-3 chain kernels changed the calculus: the exposed-VPU pools of
the two blocks (~10 ms attention + ~12 ms MLP per 12-layer B=512 tower)
are hidden per-block at bb=4, but the block boundary is still a barrier —
chain c+1's attention VPU cannot overlap chain c's MLP dots when the
blocks are separate pallas_calls.  A layer-fused kernel removes that
barrier.  The cost: the combined live set forces bb=2 (int8 weights
7.1 MB + qkv + one f32 hidden + io blocks ≈ 14-15 MB at bb=2; bb=4
cannot fit), weakening the within-block interleave that won the +10%.

Variants (vs the production per-block bb=4 tower):
  seq_bb2   : head-major attention chains, then modulo-2 MLP pipe,
              concatenated in one kernel (scheduler finds the seam)
  xpipe_bb2 : explicit cross-boundary issue order — chain 1's head loop
              emitted between chain 0's MLP up- and down-dots
  seq_bb4   : the bb=4 layer fusion, expected to exceed scoped VMEM
              (recorded as a datapoint either way)
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
SCOPED_KIB = int(os.environ.get("ILP_SCOPED_KIB", "0"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.ops.fused_block import (_chain_head_loop,
                                                        _ln_f32, _row)
    from debias_vision_lang_tpu.ops.fused_block_q import (
        _dot_q, _mlp_q_down, _mlp_q_up, _quant_rows, _wrow,
        fused_resblock_q)
    from debias_vision_lang_tpu.ops.quant import quantize_vit_visual

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    vc = cfg.vision
    d, s, heads = vc.width, vc.seq_len, vc.heads
    f = 4 * d
    scale = 1.0 / (d // heads) ** 0.5

    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))
    rq = pq["resblocks"]
    rng = np.random.default_rng(0)
    xs = [jax.device_put((rng.normal(size=(B, s, d)) * 0.5)
                         .astype(np.float32).astype(jnp.bfloat16))
          for _ in range(2)]

    def attn_chain(x_ref, c, lns1, lnb1, wqkvq_ref, sqkv_ref, bqkv,
                   woq_ref, so_ref, bo):
        xn = _ln_f32(x_ref[c:c + 1], lns1, lnb1).astype(jnp.float32)
        xq, xsc = _quant_rows(xn)
        qkv = _dot_q(xq, xsc, wqkvq_ref, sqkv_ref) + bqkv
        qkv = qkv.astype(x_ref.dtype)
        attn = _chain_head_loop([qkv], heads, d, scale, None,
                                x_ref.dtype)[0]
        aq, ascale = _quant_rows(attn.astype(jnp.float32))
        proj = _dot_q(aq, ascale, woq_ref, so_ref) + bo
        return (x_ref[c:c + 1].astype(jnp.float32) + proj)

    def layer_kernel(x_ref, lns1_ref, lnb1_ref, wqkvq_ref, sqkv_ref,
                     bqkv_ref, woq_ref, so_ref, bo_ref, lns2_ref, lnb2_ref,
                     w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2_ref,
                     o_ref, *, bb, mode):
        lns1 = lns1_ref[:][0]
        lnb1 = lnb1_ref[:][0]
        bqkv = bqkv_ref[:][0].astype(jnp.float32)
        bo = bo_ref[:][0].astype(jnp.float32)
        lns2 = lns2_ref[:][0]
        lnb2 = lnb2_ref[:][0]
        b1 = b1_ref[:][0].astype(jnp.float32)
        b2 = b2_ref[:][0].astype(jnp.float32)

        def mlp_up(y):
            return _mlp_q_up(y.astype(x_ref.dtype), lns2, lnb2,
                             w1q_ref, s1_ref, b1)

        def mlp_down(h):
            return _mlp_q_down(h, w2q_ref, s2_ref, "quick_gelu")

        def attn(c):
            return attn_chain(x_ref, c, lns1, lnb1, wqkvq_ref, sqkv_ref,
                              bqkv, woq_ref, so_ref, bo)

        if mode == "seq":
            # per-chain attention, then ALL-UP MLP (every chain's hidden
            # live at once — heavier than the production modulo-2 pipe, so
            # the bb=4 OOM datapoint for THIS mode is about the all-up
            # structure; the "prod" mode below is the faithful one)
            ys = [attn(c) for c in range(bb)]
            hs = [mlp_up(y) for y in ys]
            for c in range(bb):
                o_ref[c:c + 1] = (ys[c] + b2
                                  + mlp_down(hs[c])).astype(o_ref.dtype)
        elif mode == "prod":
            # PRODUCTION structure fused: head-major attention interleave
            # across all chains (the bb=4 within-block winner), then the
            # modulo-2 MLP pipe — only the pallas_call boundary removed.
            qkvs = []
            for c in range(bb):
                xn = _ln_f32(x_ref[c:c + 1], lns1, lnb1).astype(jnp.float32)
                xq, xsc = _quant_rows(xn)
                qkv = _dot_q(xq, xsc, wqkvq_ref, sqkv_ref) + bqkv
                qkvs.append(qkv.astype(x_ref.dtype))
            attns = _chain_head_loop(qkvs, heads, d, scale, None,
                                     x_ref.dtype)
            ys = []
            for c, a_out in enumerate(attns):
                aq, ascale = _quant_rows(a_out.astype(jnp.float32))
                proj = _dot_q(aq, ascale, woq_ref, so_ref) + bo
                ys.append(x_ref[c:c + 1].astype(jnp.float32) + proj)
            parts = [None] * bb
            h_prev = mlp_up(ys[0])
            for c in range(1, bb):
                h_next = mlp_up(ys[c])
                parts[c - 1] = mlp_down(h_prev)
                h_prev = h_next
            parts[bb - 1] = mlp_down(h_prev)
            for c in range(bb):
                o_ref[c:c + 1] = (ys[c] + b2
                                  + parts[c]).astype(o_ref.dtype)
        else:  # xpipe: chain 1's attention between chain 0's MLP dots
            y0 = attn(0)
            h0 = mlp_up(y0)
            y1 = attn(1)
            p0 = mlp_down(h0)
            h1 = mlp_up(y1)
            o_ref[0:1] = (y0 + b2 + p0).astype(o_ref.dtype)
            o_ref[1:2] = (y1 + b2 + mlp_down(h1)).astype(o_ref.dtype)

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_KIB)}
            if SCOPED_KIB else None)
    jit = functools.partial(jax.jit, compiler_options=opts)

    def tower(bb, mode):
        kern = functools.partial(layer_kernel, bb=bb, mode=mode)

        @jit
        def call(x, rq):
            def body(c, lp):
                a = lp["attn"]
                m = lp["mlp"]
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
                )(c, _row(lp["ln_1"]["scale"]), _row(lp["ln_1"]["bias"]),
                  a["wqkv"]["q"], _wrow(a["wqkv"]["scale"]), _row(a["bqkv"]),
                  a["wo"]["q"], _wrow(a["wo"]["scale"]), _row(a["bo"]),
                  _row(lp["ln_2"]["scale"]), _row(lp["ln_2"]["bias"]),
                  m["w1"]["q"], _wrow(m["w1"]["scale"]), _row(m["b1"]),
                  m["w2"]["q"], _wrow(m["w2"]["scale"]), _row(m["b2"]))
                return out, None
            out, _ = jax.lax.scan(body, x, rq)
            return out
        return call

    @jax.jit
    def base_call(x, rq):
        def body(c, lp):
            return fused_resblock_q(lp, c, heads), None
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
    print(json.dumps({"scoped_vmem_kib": SCOPED_KIB or "default",
                      "layer_base_ms": round(timeit(base_call, xs, rq) * 1e3,
                                             2)}), flush=True)
    variants = (("prod_bb4", 4, "prod"),) if SCOPED_KIB else (
        ("seq_bb2", 2, "seq"), ("xpipe_bb2", 2, "xpipe"),
        ("seq_bb4", 4, "seq"))
    for name, bb, mode in variants:
        fn = tower(bb, mode)
        try:
            ms = round(timeit(fn, xs, rq) * 1e3, 2)
            cos = round(cosine(fn(xs[0], rq), ref), 7)
            print(json.dumps({f"layer_{name}_ms": ms,
                              f"layer_{name}_cos": cos}), flush=True)
        except Exception as e:  # noqa: BLE001 — vmem OOM is a datapoint
            msg = str(e)
            tag = "vmem OOM" if "vmem" in msg.lower() else msg[:100]
            print(json.dumps({f"layer_{name}": tag}), flush=True)


if __name__ == "__main__":
    main()
