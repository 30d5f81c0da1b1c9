"""Stem experiment: can the patchify relayout + normalize pass be removed?

The headline path pays (stage_profile, B=512): preprocess (u8 -> f32
normalize) + patchify (reshape/transpose relayout of a 154 MB bf16 image
tensor) before the int8 patch matmul — together ~4-7 ms of the 85 ms step.

Variants (all end at the same int8 tower, e2e img/s measured identically):
  A  production: preprocess_batch -> _patchify (transpose) -> int8_matmul
  B  dot_general patchify: contract ((pr, pc*c)) dims of the 5-D reshaped
     image against W reshaped [16, 48, 768] — no explicit transpose; XLA
     folds the access pattern into the matmul fetch.  Bit-identical input
     values to A.
  C  u8-direct + fold: images stay uint8 end-to-end; Normalize folded into
     the (quantized) patch weights; dot_general patchify.  No float image
     tensor, no normalize pass.
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
    from debias_vision_lang_tpu.ops.quant import (
        _vit_q_trunk, encode_image_vit_q, int8_matmul, quantize_vit_visual,
        quantize_weight)
    from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    vc = cfg.vision
    patch = vc.patch_size
    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    pq = jax.device_put(quantize_vit_visual(params["visual"]))

    gh = vc.image_size // patch  # 14

    @jax.jit
    def embed_a(p, u8):
        x = preprocess_batch(u8, vc.image_size)
        return encode_image_vit_q(p, x, vc).astype(jnp.float32)

    def dg_patchify(x, w_q, w_scale, bias=None):
        # x: [B, H, W, C] float; contract (pr, pc*c) without a transpose
        b = x.shape[0]
        x5 = x.reshape(b, gh, patch, gh, patch * 3)
        # per-row dynamic int8 on the natural layout, matching int8_matmul's
        # scheme (row = one output patch -> amax over the (pr, pcc) dims)
        amax = jnp.max(jnp.abs(x5), axis=(2, 4), keepdims=True)
        scale = jnp.where(amax == 0, 1.0, amax / 127.0)
        xq = jnp.clip(jnp.round(x5 / scale), -127, 127).astype(jnp.int8)
        w3 = w_q.reshape(patch, patch * 3, w_q.shape[1])
        out = jax.lax.dot_general(
            xq, w3, (((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * scale[:, :, 0, :, 0][..., None]
        out = out * w_scale[0][None, None, None, :]
        if bias is not None:
            out = out + bias[None, None, None, :]
        return out.reshape(b, gh * gh, w_q.shape[1])

    @jax.jit
    def embed_b(p, u8):
        x = preprocess_batch(u8, vc.image_size)
        e = dg_patchify(x, p["conv1"]["q"], p["conv1"]["scale"])
        return _vit_q_trunk(p, e.astype(jnp.bfloat16), vc, None).astype(
            jnp.float32)

    @jax.jit
    def embed_c(p, u8):
        x5 = u8.reshape(B, gh, patch, gh, patch * 3).astype(jnp.bfloat16)
        # u8 values are exact in bf16; fixed scale 2.0 keeps [0,255] ->
        # [0,127.5] -> round -> <=1 ulp of the folded-normalize contract
        xq = jnp.clip(jnp.round(x5 * 0.5), -127, 127).astype(jnp.int8)
        fw = p["conv1_folded"]
        w3 = fw["q"].reshape(patch, patch * 3, fw["q"].shape[1])
        out = jax.lax.dot_general(
            xq, w3, (((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * 2.0 * fw["scale"][0][None, None, None, :]
        out = out + p["conv1_bias_folded"][None, None, None, :]
        e = out.reshape(B, gh * gh, fw["q"].shape[1])
        return _vit_q_trunk(p, e.astype(jnp.bfloat16), vc, None).astype(
            jnp.float32)

    rng = np.random.default_rng(0)
    imgs = [
        jax.device_put(rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8))
        for _ in range(2)
    ]

    ref = None
    for name, fn in (("A_production", embed_a), ("B_dg_patchify", embed_b),
                     ("C_u8_direct", embed_c)):
        out = np.asarray(fn(pq, imgs[0]))
        np.asarray(fn(pq, imgs[1]))
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
            r = fn(pq, imgs[i % 2])
        np.asarray(r)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name,
            "img_s": round(B * STEPS / dt, 1),
            "cos_vs_A": round(cos, 6),
        }))


if __name__ == "__main__":
    main()
