"""Stem experiment: host-patchified uint8 staging (the last stem lever).

stem_variants.py closed the on-device angles: dot_general patchify (+5.5%,
integrated) and u8-direct-with-fold (neutral-to-+1%, fixed ·0.5 scale that
drops the u8 LSB).  Both still pay a strided fetch on the 5-D reshaped
image inside the patch dot.

This variant moves the patchify to the HOST STAGING LAYOUT: the ingest
stages [B, 196, 768] uint8 (same bytes as [B, 224, 224, 3] — the native
loader writes crops patch-row-contiguously at decode time for free), so the
device stem is

    xq = (u8 int32) - 128  -> int8   (LOSSLESS: u8 [0,255] -> [-128,127])
    acc = xq @ wq_folded             (ONE contiguous [B·196,768]@[768,W]
                                      int8 MXU matmul, zero relayout)
    out = (acc + 128·colsum(wq))·w_scale + b_fold

The +128·colsum term makes the shift exact in integer arithmetic, so P8
equals a u8 @ wq dot bit-for-bit; the only quantization error is the
weight rounding (the activation side is EXACT — strictly more accurate
than production's dynamic per-patch activation quant).  No normalize pass,
no f32 image tensor, no strided fetch.

Variants (e2e img/s, identical int8 tower):
  A  production: preprocess_batch -> patch_embed_q (dot_general, dynamic
     activation quant) — bench.py's headline path
  P8   patchified u8 staging -> exact int8 stem (above)
  P8F  same staging, bf16 fp stem: (u8 @ w_fold + b_fold) in bf16 — the
       candidate for the bf16 faithful mode (u8 values are exact in bf16)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("SV_BATCH", 512))
STEPS = int(os.environ.get("SV_STEPS", 20))


def main():
    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.models.clip import fold_preprocess_into_patch
    from debias_vision_lang_tpu.ops.quant import (
        _vit_q_trunk, encode_image_vit_q, quantize_vit_visual)
    from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    vc = cfg.vision
    patch = vc.patch_size
    gh = vc.image_size // patch  # 14
    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))
    w_fold, b_fold = fold_preprocess_into_patch(params["visual"]["conv1"])
    w_fold = jax.device_put(w_fold)
    b_fold = jax.device_put(b_fold)

    @jax.jit
    def embed_a(p, u8):
        x = preprocess_batch(u8, vc.image_size)
        return encode_image_vit_q(p, x, vc).astype(jnp.float32)

    @jax.jit
    def embed_p8(p, pu8):
        fw = p["conv1_folded"]
        xq = (pu8.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, fw["q"], (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        shift = 128 * jnp.sum(fw["q"].astype(jnp.int32), axis=0)
        out = ((acc + shift).astype(jnp.float32) * fw["scale"][0]
               + p["conv1_bias_folded"])
        return _vit_q_trunk(p, out.astype(jnp.bfloat16), vc, None).astype(
            jnp.float32)

    @jax.jit
    def embed_p8f(p, pu8, wf, bf):
        e = (jnp.dot(pu8.astype(jnp.bfloat16), wf.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + bf)
        return _vit_q_trunk(p, e.astype(jnp.bfloat16), vc, None).astype(
            jnp.float32)

    rng = np.random.default_rng(0)
    raw = [rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8)
           for _ in range(2)]
    # host patchify = the staging layout the native loader would emit
    patched = [
        r.reshape(B, gh, patch, gh, patch * 3)
        .transpose(0, 1, 3, 2, 4).reshape(B, gh * gh, patch * patch * 3)
        for r in raw
    ]
    imgs = [jax.device_put(r) for r in raw]
    pimgs = [jax.device_put(p) for p in patched]

    ref = None
    for name, fn, bufs in (
            ("A_production", lambda p, u: embed_a(p, u), imgs),
            ("P8_exact_int8", lambda p, u: embed_p8(p, u), pimgs),
            ("P8F_bf16_fold", lambda p, u: embed_p8f(p, u, w_fold, b_fold),
             pimgs)):
        out = np.asarray(fn(pq, bufs[0]))
        np.asarray(fn(pq, bufs[1]))
        if ref is None:
            ref = out
            cos = 1.0
        else:
            cos = float(np.mean(
                np.sum(ref * out, -1)
                / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
                   + 1e-9)))
        t0 = time.perf_counter()
        r = None
        for i in range(STEPS):
            r = fn(pq, bufs[i % 2])
        np.asarray(r)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name,
            "img_s": round(B * STEPS / dt, 1),
            "cos_vs_A": round(cos, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
