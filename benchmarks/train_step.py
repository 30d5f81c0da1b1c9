"""Adversarial-training outer-step throughput on the real TPU.

Measures the full AdversarialTrainer.step (frozen embed of both batches,
K adversary updates, one prompt update) for ViT-B/16 at the reference's
training batch size, comparing ``embed_dtype`` float32 (reference-parity)
vs bfloat16 (fused-kernel path for the no-gradient embed passes).

Relay-safe timing per PERF.md: device-to-host fetch of a scalar as the
fence, params passed as jit arguments (the steps already do this).

Usage:  python benchmarks/train_step.py [batch_size]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(embed_dtype: str, batch: int, iters: int = 8, train_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.config import (
        AdversaryConfig, DebiasConfig, TrainConfig)
    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.models.adversary import (
        Adversary, init_adversary_params)
    from debias_vision_lang_tpu.models.clip import init_clip_params
    from debias_vision_lang_tpu.models.debias import (
        DebiasCLIP, init_debias_tokens)
    from debias_vision_lang_tpu.train.adversarial import AdversarialTrainer

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    params = init_clip_params(jax.random.key(0), cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=cfg.text.width,
                        max_tokens=cfg.text.context_length)
    deb = init_debias_tokens(jax.random.key(1), params, dcfg, tokenizer=None)
    model = DebiasCLIP(clip_params=params, debias_tokens=deb,
                       clip_cfg=cfg, debias_cfg=dcfg)
    n_prompts = 319
    acfg = AdversaryConfig(n_input=n_prompts)
    adv = Adversary(params=init_adversary_params(jax.random.key(2), acfg),
                    cfg=acfg)
    rng = np.random.default_rng(0)
    ctx = cfg.text.context_length
    sens = np.zeros((n_prompts, ctx), np.int32)
    sens[:, 0] = cfg.text.vocab_size - 2
    sens[:, 1] = rng.integers(1, 1000, n_prompts)
    sens[:, 2] = cfg.text.vocab_size - 1

    trainer = AdversarialTrainer.create(
        model, adv, TrainConfig(embed_dtype=embed_dtype,
                                train_dtype=train_dtype), sens)

    n_px = cfg.vision.image_size
    images = rng.normal(size=(batch, n_px, n_px, 3)).astype(np.float32)
    labels = (rng.random(batch) < 0.5).astype(np.float32)
    cap_tokens = np.zeros((batch, ctx), np.int32)
    cap_tokens[:, 0] = cfg.text.vocab_size - 2
    cap_tokens[:, 1] = rng.integers(1, 1000, batch)
    cap_tokens[:, 2] = cfg.text.vocab_size - 1

    # stage inputs on device once — measuring step compute, not relay H2D
    images_d = jax.device_put(jnp.asarray(images))
    cap_images_d = images_d

    trainer.step(images_d, labels, cap_images_d, cap_tokens)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        m = trainer.step(images_d, labels, cap_images_d, cap_tokens)
    dt = (time.perf_counter() - t0) / iters  # step() fetches scalars → fenced
    print(f"embed={embed_dtype:9s} train={train_dtype:9s} batch={batch}: "
          f"{dt * 1e3:7.1f} ms/step  {batch / dt:8.1f} img/s  "
          f"(loss={m['loss']:.4f})")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    t32 = run("float32", batch)
    t16 = run("bfloat16", batch)
    tmx = run("bfloat16", batch, train_dtype="bfloat16")
    tq8 = run("int8", batch, train_dtype="bfloat16")
    print(f"bf16 frozen embed:              {t32 / t16:.2f}x")
    print(f"+ bf16 mixed-precision train:   {t32 / tmx:.2f}x")
    print(f"+ int8 frozen embed:            {t32 / tq8:.2f}x")


if __name__ == "__main__":
    main()
