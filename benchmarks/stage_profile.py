"""Per-stage attribution of the int8 fused path (default: the headline
ViT-B/16 at batch 512; PROF_ARCH selects any registered ViT — e.g.
PROF_ARCH=openai/CLIP/ViT-L/14 PROF_BATCH=256 for the round-4 ViT-L
attribution) — the measured basis for PERF.md's ceiling analyses.

Stages, each jitted separately and timed with the relay-safe recipe
(two alternating buffers, small-slice D2H fence, params as arguments):

  preprocess : uint8 [B,224,224,3] -> f32 normalized (vision/preprocess)
  stem       : patchify + int8 patch conv + cls/pos/ln_pre
  attn_tower : 12x attention_block_q scan (int8 QKV/out-proj, fp32 core)
  mlp_tower  : 12x mlp_block_q scan
  head       : ln_post + projection
  full       : the production encode_image_vit_q path (cross-check; the
               sum of stages overstates it by per-stage launch/fence costs)

Per-stage achieved-vs-peak uses v5e peaks: 197 TF/s bf16, 394 TOPS int8.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_BATCH", 512))
STEPS = int(os.environ.get("PROF_STEPS", 20))
ARCH = os.environ.get("PROF_ARCH", "openai/CLIP/ViT-B/16")  # any registered ViT


def timeit(fn, *args, steps=STEPS):
    """Relay-safe: alternate two leading inputs if provided as a list."""
    import jax

    bufs = args[0] if isinstance(args[0], list) else [args[0], args[0]]
    rest = args[1:]
    np.asarray(jax.tree.leaves(fn(bufs[0], *rest))[0][:1])  # compile+warm
    np.asarray(jax.tree.leaves(fn(bufs[1], *rest))[0][:1])
    t0 = time.perf_counter()
    out = None
    for i in range(steps):
        out = fn(bufs[i % 2], *rest)
    np.asarray(jax.tree.leaves(out)[0][:1])  # small D2H fence
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.models.layers import layer_norm
    from debias_vision_lang_tpu.ops.fused_block_q import (
        attention_block_q, mlp_block_q)
    from debias_vision_lang_tpu.ops.quant import (
        encode_image_vit_q, int8_matmul, quantize_vit_visual)
    from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

    cfg = resolve_arch(ARCH)
    vc = cfg.vision
    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(rng.integers(0, 256, (B, vc.image_size, vc.image_size, 3), dtype=np.uint8))
            for _ in range(2)]

    d = vc.width
    s = vc.seq_len  # 197 for ViT-B/16
    xs = [jax.device_put(rng.normal(size=(B, s, d)).astype(np.float32)
                         .astype(jnp.bfloat16)) for _ in range(2)]

    results = {}

    # -- preprocess ----------------------------------------------------------
    @jax.jit
    def f_pre(u8):
        return preprocess_batch(u8, vc.image_size)

    results["preprocess"] = timeit(f_pre, imgs)

    # -- stem (patchify + int8 conv + cls/pos/ln_pre) ------------------------
    @jax.jit
    def f_stem(u8, p):
        x = preprocess_batch(u8, vc.image_size)
        from debias_vision_lang_tpu.ops.quant import _patchify

        x = _patchify(x.astype(jnp.bfloat16), vc.patch_size)
        x = int8_matmul(x, p["conv1"]).astype(jnp.bfloat16)
        b = x.shape[0]
        cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype),
                               (b, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + p["positional_embedding"].astype(x.dtype)
        return layer_norm(p["ln_pre"], x)

    results["stem_incl_preprocess"] = timeit(f_stem, imgs, pq)
    results["stem"] = results["stem_incl_preprocess"] - results["preprocess"]

    # -- towers --------------------------------------------------------------
    rq = pq["resblocks"]

    @jax.jit
    def f_attn_tower(x, rq):
        def body(c, lp):
            a = lp["attn"]
            return attention_block_q(
                c, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
                a["wo"]["q"], a["wo"]["scale"], a["bo"], heads=vc.heads), None
        out, _ = jax.lax.scan(body, x, rq)
        return out

    @jax.jit
    def f_mlp_tower(x, rq):
        def body(c, lp):
            m = lp["mlp"]
            return mlp_block_q(
                c, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                m["w1"]["q"], m["w1"]["scale"], m["b1"],
                m["w2"]["q"], m["w2"]["scale"], m["b2"]), None
        out, _ = jax.lax.scan(body, x, rq)
        return out

    nl = vc.layers
    results[f"attn_tower_{nl}L"] = timeit(f_attn_tower, xs, rq)
    results[f"mlp_tower_{nl}L"] = timeit(f_mlp_tower, xs, rq)

    # -- head ----------------------------------------------------------------
    @jax.jit
    def f_head(x, p):
        y = layer_norm(p["ln_post"], x[:, 0:1, :])[:, 0, :]
        return jnp.dot(y, p["proj"].astype(y.dtype))

    results["head"] = timeit(f_head, xs, pq)

    # -- full production path (cross-check) ----------------------------------
    @jax.jit
    def f_full(u8, p):
        x = preprocess_batch(u8, vc.image_size)
        return encode_image_vit_q(p, x, vc, dtype=jnp.bfloat16)

    results["full"] = timeit(f_full, imgs, pq)

    # -- attribution ---------------------------------------------------------
    flops = {}
    # per-image useful MACs*2
    n_patch = (vc.image_size // vc.patch_size) ** 2
    pd = vc.patch_size ** 2 * 3
    flops["stem"] = 2 * n_patch * pd * d
    f = 4 * d
    flops[f"mlp_tower_{nl}L"] = nl * 2 * s * (d * f + f * d)
    hd = d // vc.heads
    flops[f"attn_tower_{nl}L"] = nl * (
        2 * s * d * 3 * d            # qkv proj (int8)
        + 2 * s * s * d * 2          # QK^T + PV (fp32 cores, all heads)
        + 2 * s * d * d)             # out proj (int8)
    flops["head"] = 2 * d * cfg.embed_dim

    report = {"arch": ARCH, "batch": B, "steps": STEPS, "stages_ms": {
        k: round(v * 1e3, 2) for k, v in results.items()}}
    sum_stages = (results["preprocess"] + results["stem"]
                  + results[f"attn_tower_{nl}L"] + results[f"mlp_tower_{nl}L"]
                  + results["head"])
    report["sum_stages_ms"] = round(sum_stages * 1e3, 2)
    report["img_s_full"] = round(B / results["full"], 1)
    report["tflops_achieved"] = {
        k: round(B * fl / results[k] / 1e12, 1)
        for k, fl in flops.items() if k in results}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
