"""Ingest-to-embedding throughput across every registered CLIP architecture.

The headline bench (bench.py) tracks ViT-B/16 — the reference's default
model.  This sweep covers the rest of the family the reference registers
(debias_clip/model/model.py _MODELS): the three ModifiedResNets and the
three ViTs, plus the SLIP towers, at their native input resolutions.

Relay-safe methodology per PERF.md: params as jit arguments, two alternating
device-resident input buffers, scalar-slice fetch as the fence.

Usage: python benchmarks/arch_sweep.py [batch] [arch ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ARCHS = [
    "openai/CLIP/RN50",
    "openai/CLIP/RN101",
    "openai/CLIP/RN50x4",
    "openai/CLIP/ViT-B/32",
    "openai/CLIP/ViT-B/16",
    "openai/CLIP/ViT-L/14",
]


def bench_arch(arch: str, batch: int, iters: int = 10, quant: bool = False):
    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

    cfg = resolve_arch(arch)
    n_px = cfg.vision.image_size
    params = clip_model.init_clip_params(jax.random.key(0), cfg)

    if quant and cfg.vision.kind == "resnet":
        # int8 conv tower (ops/quant_resnet.py): BN-folded s8 convs,
        # device-side preprocess (no patch staging for conv stems).
        from debias_vision_lang_tpu.ops.quant_resnet import (
            encode_image_resnet_q, quantize_resnet_visual)

        params = quantize_resnet_visual(params["visual"])

        @jax.jit
        def embed(p, images_u8):
            x = preprocess_batch(images_u8, n_px)
            return encode_image_resnet_q(
                p, x, cfg.vision, dtype=jnp.bfloat16).astype(jnp.float32)
    elif quant:  # int8 fused path (ViT towers), production P8 stem
        from debias_vision_lang_tpu.ops.quant import (
            encode_image_vit_q_p8, quantize_vit_visual)

        if cfg.vision.kind not in ("vit", "slip_vit"):
            print(f"{arch:24s} int8: n/a ({cfg.vision.kind} tower)")
            return None
        params = quantize_vit_visual(params["visual"])

        @jax.jit
        def embed(p, patches_u8):
            return encode_image_vit_q_p8(
                p, patches_u8, cfg.vision).astype(jnp.float32)
    else:
        @jax.jit
        def embed(p, images_u8):
            x = preprocess_batch(images_u8, n_px)
            return clip_model.encode_image(p, x, cfg,
                                           dtype=jnp.bfloat16).astype(jnp.float32)

    rng = np.random.default_rng(0)
    if quant and cfg.vision.kind != "resnet":
        # patch-contiguous uint8 staging (same byte count)
        patch = cfg.vision.patch_size
        shape = (batch, (n_px // patch) ** 2, patch * patch * 3)
    else:
        shape = (batch, n_px, n_px, 3)
    bufs = [jax.device_put(jnp.asarray(
        rng.integers(0, 256, shape, dtype=np.uint8)))
        for _ in range(2)]

    out = embed(params, bufs[0])
    float(jnp.sum(out.ravel()[:1]))  # compile + warm fence
    t0 = time.perf_counter()
    for i in range(iters):
        out = embed(params, bufs[i % 2])
    float(jnp.sum(out.ravel()[:1]))
    dt = (time.perf_counter() - t0) / iters
    rate = batch / dt
    print(f"{arch:24s} n_px={n_px:3d}  {dt * 1e3:7.1f} ms/batch{batch}  "
          f"{rate:8.1f} img/s/chip ({'int8' if quant else 'bf16'})")
    return rate


def main():
    quant = bool(int(os.environ.get("ARCH_SWEEP_QUANT", "0")))
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    archs = sys.argv[2:] or DEFAULT_ARCHS
    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    for arch in archs:
        try:
            bench_arch(arch, batch, quant=quant)
        except Exception as e:  # OOM at big res/batch: report, keep sweeping
            print(f"{arch:24s} FAILED: {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
