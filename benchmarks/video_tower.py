"""Video (Frozen-in-Time) tower throughput: joint vs divided space-time
attention across the precision ladder (f32 / bf16 / int8).

The reference stubs this family (debias_clip/model/model.py:115-116); here
it is a production tower, so its ladder value gets measured like the image
towers' (arch_sweep.py).  Reports clips/s and frames/s at the ViT-B/16
geometry with T=4 frames.

Usage: python benchmarks/video_tower.py [batch] [frames] [seconds-budget]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, bufs, warm=2, iters=8):
    """Relay-safe timing: two alternating input buffers + a small-slice
    D2H fence (block_until_ready does NOT fence through the axon relay —
    measured 0.0-0.1 ms 'timings' before this recipe, same as the other
    harnesses; see stage_profile.timeit)."""
    for i in range(warm):
        np.asarray(fn(bufs[i % 2])[:1])
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(bufs[i % 2])
    np.asarray(out[:1])  # small D2H fence
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache
    from debias_vision_lang_tpu.core.config import (CLIPConfig, TextConfig,
                                                    VisionConfig)
    from debias_vision_lang_tpu.models.frozen_in_time import (
        encode_video, encode_video_divided, init_fit_params)
    from debias_vision_lang_tpu.ops.quant import (encode_video_divided_q,
                                                  encode_video_q,
                                                  quantize_video_visual)

    enable_compilation_cache()
    cfg = CLIPConfig(
        name="fit-b16",
        vision=VisionConfig(kind="video_vit", image_size=224, patch_size=16,
                            width=768, layers=12, heads=12, embed_dim=512),
        text=TextConfig(vocab_size=49408, context_length=77, width=512,
                        layers=12, heads=8, embed_dim=512),
    )
    params = init_fit_params(jax.random.key(0), cfg, num_frames=frames)
    visual = jax.device_put(params["visual"])
    vq = jax.device_put(quantize_video_visual(params["visual"]))
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(batch, frames, 224, 224, 3))
                      .astype(np.float32)) for _ in range(2)]
    print(f"backend={jax.default_backend()} batch={batch} T={frames} "
          f"(B/16 geometry, seq={1 + frames * 196} joint)")

    # params ride as jit ARGUMENTS (device buffers), never closures: a
    # closed-over tower becomes an HLO constant and the axon remote-compile
    # request ships it — measured HTTP 413 (f32/bf16, ~350 MB request) and
    # a 500 helper crash (int8) before this was fixed
    rows = []
    for name, fn, p in [
        ("joint f32", lambda w, v: encode_video(w, v, cfg.vision,
                                                dtype=jnp.float32), visual),
        ("joint bf16", lambda w, v: encode_video(w, v, cfg.vision,
                                                 dtype=jnp.bfloat16), visual),
        ("joint int8", lambda w, v: encode_video_q(w, v, cfg.vision), vq),
        ("divided f32", lambda w, v: encode_video_divided(
            w, v, cfg.vision, dtype=jnp.float32), visual),
        ("divided bf16", lambda w, v: encode_video_divided(
            w, v, cfg.vision, dtype=jnp.bfloat16), visual),
        ("divided int8", lambda w, v: encode_video_divided_q(
            w, v, cfg.vision), vq),
    ]:
        jf = jax.jit(fn)
        try:
            dt = bench(lambda v, _jf=jf, _p=p: _jf(_p, v), xs)
        except Exception as e:  # OOM at large batch etc. — report, continue
            print(f"{name:13s}: FAILED ({type(e).__name__}: {str(e)[:80]})")
            continue
        clips = batch / dt
        print(f"{name:13s}: {dt * 1e3:7.1f} ms  {clips:8.1f} clips/s  "
              f"{clips * frames:9.1f} frames/s")
        rows.append((name, clips))
    base = dict(rows).get("joint bf16")
    for name, clips in rows:
        if base:
            print(f"  {name:13s} vs joint bf16: {clips / base:.2f}x")


if __name__ == "__main__":
    main()
