"""Wider batch chains under a raised scoped-VMEM limit.

Every wider-chain experiment so far (MLP bb=6, layer-fused bb=4, attention
bb=8) died on the DEFAULT Mosaic scoped-VMEM budget (~16 MB) — but v5e has
128 MB of VMEM and the budget is a flag, not silicon:
``--xla_tpu_scoped_vmem_limit_kib``.  A larger budget legalizes wider
chains, which is the one remaining way to hide more of the exposed VPU
glue (~22 ms per 12-layer B=512 tower) under other chains' dots.

This benchmark times 12-layer attention-only and MLP-only towers built
from the PRODUCTION kernels (ops/fused_block_q) at explicit chain widths.
The raised budget rides per-executable via ``jax.jit(compiler_options=
{"xla_tpu_scoped_vmem_limit_kib": ...})`` (the host-side XLA_FLAGS parser
rejects TPU-compiler flags, and env vars don't cross the axon tunnel —
compiler_options travel with the compile request):

  ILP_SCOPED_KIB=32768 ILP_BB_ATTN=4,8 ILP_BB_MLP=4,8 \
      python benchmarks/q_wide_chains.py

Round 4: ILP_ARCH selects any registered ViT (e.g.
ILP_ARCH=openai/CLIP/ViT-L/14 ILP_BATCH=256 for the ViT-L tuning pass)
and ILP_FB_MLP forces the MLP F-tile (0 = auto; chains require fb == F,
so the ViT-L chain experiments pass ILP_FB_MLP=4096 + a raised budget).

vs the default-budget bb=4 production numbers.  OOMs are recorded as
datapoints.  ILP_BATCH must be divisible by every requested bb.
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
BB_ATTN = [int(v) for v in os.environ.get("ILP_BB_ATTN", "4,8").split(",") if v]
BB_MLP = [int(v) for v in os.environ.get("ILP_BB_MLP", "4,8").split(",") if v]
SCOPED_KIB = int(os.environ.get("ILP_SCOPED_KIB", "0"))
ARCH = os.environ.get("ILP_ARCH", "openai/CLIP/ViT-B/16")  # any registered ViT
FB_MLP = int(os.environ.get("ILP_FB_MLP", "0")) or None  # explicit F-tile


def main():
    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.ops.fused_block_q import (attention_block_q,
                                                          mlp_block_q)
    from debias_vision_lang_tpu.ops.quant import quantize_vit_visual

    cfg = resolve_arch(ARCH)
    vc = cfg.vision
    d, s, heads = vc.width, vc.seq_len, vc.heads

    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))
    rq = pq["resblocks"]
    rng = np.random.default_rng(0)
    xs = [jax.device_put((rng.normal(size=(B, s, d)) * 0.5)
                         .astype(np.float32).astype(jnp.bfloat16))
          for _ in range(2)]

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_KIB)}
            if SCOPED_KIB else None)
    jit = functools.partial(jax.jit, compiler_options=opts)

    def attn_tower(bb):
        @jit
        def call(x, rq):
            def body(c, lp):
                a = lp["attn"]
                return attention_block_q(
                    c, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                    a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
                    a["wo"]["q"], a["wo"]["scale"], a["bo"],
                    heads=heads, bb=bb), None
            out, _ = jax.lax.scan(body, x, rq)
            return out
        return call

    def mlp_tower(bb):
        @jit
        def call(x, rq):
            def body(c, lp):
                m = lp["mlp"]
                return mlp_block_q(
                    c, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                    m["w1"]["q"], m["w1"]["scale"], m["b1"],
                    m["w2"]["q"], m["w2"]["scale"], m["b2"],
                    bb=bb, fb=FB_MLP), None
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

    def cosine(a, b):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    print(json.dumps({"scoped_vmem_kib": SCOPED_KIB or "default"}),
          flush=True)

    refs = {}
    for kind, towers, bbs in (("attn", attn_tower, BB_ATTN),
                              ("mlp", mlp_tower, BB_MLP)):
        for bb in bbs:
            if B % bb:
                continue
            fn = towers(bb)
            try:
                ms = round(timeit(fn, xs, rq) * 1e3, 2)
                out = fn(xs[0], rq)
                if kind in refs:
                    cos = round(cosine(out, refs[kind]), 7)
                else:
                    refs[kind] = out
                    cos = 1.0
                print(json.dumps({f"{kind}_bb{bb}_ms": ms,
                                  f"{kind}_bb{bb}_cos": cos}), flush=True)
            except Exception as e:  # noqa: BLE001 — vmem OOM is a datapoint
                msg = str(e)
                tag = ("vmem OOM" if "vmem" in msg.lower() else msg[:100])
                print(json.dumps({f"{kind}_bb{bb}": tag}), flush=True)


if __name__ == "__main__":
    main()
