"""Headline benchmark: CLIP ViT-B/16 image-embedding throughput per chip.

This is the reference's hot loop — the whole FairFace val set through
``encode_image`` (reference: debias_clip/measuring_bias.py:85-99, batch 256)
— measured as images/sec on one chip, with the fused device preprocess
(uint8 → resize/crop/normalize → ViT) included, i.e. the full ingest-to-
embedding path a ``measure_bias`` run pays.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: ratio against an A100 PyTorch fp16 estimate for the same loop
(~1000 img/s with DataLoader + encode_image at batch 256; the reference
itself upcasts to fp32 — model/model.py:136 — which is slower still).  The
north-star target is ≥10× (BASELINE.json).  NB: the 1000 img/s denominator
models ViT-B/16 ONLY — do not divide other archs' throughput by it and
call the result an A100 multiple (PERF.md "Baseline comparison").

Env knobs: BENCH_BATCH (default 512 — measured sweet spot on v5e: 256 →
4,060 img/s, 512 → 4,167, 1024 → 4,142; the reference convention is 256),
BENCH_STEPS (default 20), BENCH_DTYPE (bfloat16|float32, default bfloat16),
BENCH_PALLAS (1|0), BENCH_QUANT (1|0, default 1).

The headline config is the production eval path: int8 fused-block
kernels with batch-chain interleaving (ops/fused_block_q.py — bb=4
independent dataflow chains per grid step so one chain's quant/softmax VPU
work overlaps another's MXU dots) plus the EXACT int8 stem from
patch-contiguous uint8 staging (ops/quant.py::patch_embed_q_p8 — the
layout the native loader emits at decode time for measure_bias
dtype="int8"; same H2D bytes as the HWC canvas, zero device relayout,
integer-exact activations) — measured 6,179 img/s (round 3; 6,063 with
the dynamic-quant f32 stem, 5,380 single-chain, 4,163 bf16) — with
tower-level cosine vs fp32 = 0.99989 and rank-stable MaxSkew/NDKL
(tested, ops/quant contract).
BENCH_QUANT=0 measures the numeric-faithful bf16 fused path;
BENCH_DTYPE=float32 the reference-parity mode; BENCH_STEM=f32 forces the
pre-staging dynamic-quant stem (preprocess_batch + patch_embed_q).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_TORCH_BASELINE_IMG_S = 1000.0


def _watchdog(seconds: float):
    """Guarantee the ONE-JSON-line contract even if device init stalls (the
    axon TPU tunnel can hang indefinitely when the chip is unreachable —
    observed 25+ min with no progress): after ``seconds``, emit an error
    record and hard-exit.  BENCH_TIMEOUT_S overrides; a normal run finishes
    in ~2-3 min including compile."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "clip_vit_b16_embed_throughput",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"bench timed out after {seconds:.0f}s "
                     "(device tunnel hung?)",
        }), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "1800")))
    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

    batch = int(os.environ.get("BENCH_BATCH", 512))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    dtype = jnp.bfloat16 if os.environ.get(
        "BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    on_tpu = jax.default_backend() == "tpu"
    # Measured on v5e: XLA's fused attention currently beats the Pallas
    # kernel at S=197/D=64 (lane-padding waste) — default off until it wins.
    use_pallas = bool(int(os.environ.get("BENCH_PALLAS", "0"))) and on_tpu

    quant = bool(int(os.environ.get("BENCH_QUANT", "1")))
    if os.environ.get("BENCH_DTYPE") == "float32":
        quant = False  # explicit fp32 request = reference-parity numerics

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    params = clip_model.init_clip_params(jax.random.key(0), cfg)

    stem = os.environ.get("BENCH_STEM", "p8" if quant else "f32")
    use_p8 = stem == "p8" and (quant or dtype == jnp.bfloat16)

    if quant and use_p8:
        from debias_vision_lang_tpu.ops.quant import (encode_image_vit_q_p8,
                                                      quantize_vit_visual)

        params = quantize_vit_visual(params["visual"])

        @jax.jit
        def embed(p, patches_u8):
            return encode_image_vit_q_p8(
                p, patches_u8, cfg.vision, dtype=dtype).astype(jnp.float32)
    elif quant:
        from debias_vision_lang_tpu.ops.quant import quantize_vit_visual, encode_image_vit_q

        params = quantize_vit_visual(params["visual"])

        @jax.jit
        def embed(p, images_u8):
            x = preprocess_batch(images_u8, cfg.vision.image_size)
            return encode_image_vit_q(p, x, cfg.vision, dtype=dtype).astype(jnp.float32)
    elif use_p8:
        # bf16 faithful mode with the patch-contiguous staging: folded
        # normalize, one relayout-free stem dot (u8 exact in bf16)
        @jax.jit
        def embed(p, patches_u8):
            return clip_model.encode_image_vit_p8(
                p["visual"], patches_u8, cfg.vision, dtype=dtype,
                use_pallas=use_pallas).astype(jnp.float32)
    else:
        @jax.jit
        def embed(p, images_u8):
            x = preprocess_batch(images_u8, cfg.vision.image_size)
            return clip_model.encode_image(p, x, cfg, dtype=dtype,
                                           use_pallas=use_pallas).astype(jnp.float32)

    rng = np.random.default_rng(0)
    params = jax.device_put(params)
    # two alternating buffers: defeats any buffer-identity caching in the
    # remote-execution path.  The p8 stem consumes the patch-contiguous
    # staging the native loader writes at decode time — same byte count.
    if use_p8:
        patch = cfg.vision.patch_size
        g = cfg.vision.image_size // patch
        shape = (batch, g * g, patch * patch * 3)
    else:
        shape = (batch, 224, 224, 3)
    imgs = [
        jax.device_put(rng.integers(0, 256, shape, dtype=np.uint8))
        for _ in range(2)
    ]

    # warmup / compile; D2H fetch is the only reliable completion fence
    # through the axon relay (block_until_ready can return early there)
    np.asarray(embed(params, imgs[0]))
    np.asarray(embed(params, imgs[1]))

    t0 = time.perf_counter()
    out = None
    for i in range(steps):
        out = embed(params, imgs[i % 2])
    np.asarray(out)  # D2H fence
    dt = time.perf_counter() - t0

    ips = batch * steps / dt
    watchdog.cancel()
    print(json.dumps({
        "metric": "clip_vit_b16_embed_throughput",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_TORCH_BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
