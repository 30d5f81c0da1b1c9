"""Text-tower throughput: fp32 / bf16 / int8 encode_text on one chip.

The bias pipeline encodes 319 prompts once (text is cold there), but the
serving /v1/embed/text endpoint is text-hot — this measures what the
optional int8 text tower (ops/quant.py::encode_text_q, dtype="int8-text")
buys on CLIP ViT-B/16's text stack (12 layers, width 512, S=77).

Usage: python benchmarks/text_tower.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(os.environ.get("TEXT_BENCH_ITERS", "20"))

    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache
    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models import clip as clip_model
    from debias_vision_lang_tpu.ops.quant import encode_text_q, quantize_clip_text

    enable_compilation_cache()
    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    params = clip_model.init_clip_params(jax.random.key(0), cfg)
    text_q = quantize_clip_text(params["text"])

    rng = np.random.default_rng(0)
    v, s = cfg.text.vocab_size, cfg.text.context_length
    toks = np.zeros((batch, s), np.int32)
    toks[:, 0] = v - 2
    lens = rng.integers(3, s - 1, batch)
    for i, ln in enumerate(lens):
        toks[i, 1:ln] = rng.integers(1, 40000, ln - 1)
        toks[i, ln] = v - 1
    bufs = [jax.device_put(jnp.asarray(toks)) for _ in range(2)]

    def run(name, fn):
        np.asarray(fn(bufs[0]))  # compile + fence
        np.asarray(fn(bufs[1]))
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = fn(bufs[i % 2])
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:12s} {dt * 1e3:7.2f} ms/batch{batch}  "
              f"{batch / dt:9.1f} texts/s/chip")
        return batch / dt

    for name, dtype in (("float32", jnp.float32), ("bf16", jnp.bfloat16)):
        run(name, jax.jit(lambda t, d=dtype: clip_model.encode_text(
            params, t, cfg, dtype=d).astype(jnp.float32)))
    run("int8", jax.jit(lambda t: encode_text_q(
        text_q, t, cfg.text).astype(jnp.float32)))


if __name__ == "__main__":
    main()
