"""Measured basis for TrainConfig.approx_frozen_scores (the opt-in
approximate adversarial split for image-path training configs).

Two measurements:

1. **Step time** (real TPU, ViT-B/16, n_train_vid_layers=2, batch 64):
   exact `prompt_step_with_layers` (both image batches embed inside the
   differentiable loss) vs approximate `prompt_step_approx_scores`
   (attribute batch stays frozen; only the caption batch re-embeds).

2. **Training dynamics** (tiny arch, 60 steps, identical data stream and
   init): loss trajectories and the cosine/max-delta between the trained
   vid-layer weights of the two runs — the evidence for "changes
   gradients, similar trajectory" that justifies (or damns) the
   approximation.  adversarial_weight=1, the default.

Usage:  python benchmarks/train_approx.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk(arch_cfg, n_vid, approx, adv_w=1.0, seed=0):
    import jax

    from debias_vision_lang_tpu.core.config import (
        AdversaryConfig, DebiasConfig, TrainConfig)
    from debias_vision_lang_tpu.models.adversary import (
        Adversary, init_adversary_params)
    from debias_vision_lang_tpu.models.clip import init_clip_params
    from debias_vision_lang_tpu.models.debias import (
        DebiasCLIP, init_debias_tokens)
    from debias_vision_lang_tpu.train.adversarial import AdversarialTrainer

    params = init_clip_params(jax.random.key(seed), arch_cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=arch_cfg.text.width,
                        max_tokens=arch_cfg.text.context_length,
                        n_train_vid_layers=n_vid)
    deb = init_debias_tokens(jax.random.key(seed + 1), params, dcfg)
    model = DebiasCLIP(clip_params=params, debias_tokens=deb,
                       clip_cfg=arch_cfg, debias_cfg=dcfg)
    n_prompts = 16
    acfg = AdversaryConfig(n_input=n_prompts, hidden_size=8)
    adv = Adversary(params=init_adversary_params(jax.random.key(seed + 2), acfg),
                    cfg=acfg)
    rng = np.random.default_rng(0)
    ctx = arch_cfg.text.context_length
    sens = np.zeros((n_prompts, ctx), np.int32)
    sens[:, 0] = arch_cfg.text.vocab_size - 2
    sens[:, 1] = rng.integers(1, min(1000, arch_cfg.text.vocab_size - 2),
                              n_prompts)
    sens[:, 2] = arch_cfg.text.vocab_size - 1
    tcfg = TrainConfig(adversarial_weight=adv_w, approx_frozen_scores=approx)
    return AdversarialTrainer.create(model, adv, tcfg, sens)


def step_time(batch: int):
    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.registry import resolve_arch

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    rng = np.random.default_rng(0)
    n_px = cfg.vision.image_size
    ctx = cfg.text.context_length
    images = jax.device_put(jnp.asarray(
        rng.normal(size=(batch, n_px, n_px, 3)).astype(np.float32)))
    labels = (rng.random(batch) < 0.5).astype(np.float32)
    cap_tokens = np.zeros((batch, ctx), np.int32)
    cap_tokens[:, 0] = cfg.text.vocab_size - 2
    cap_tokens[:, 1] = rng.integers(1, 1000, batch)
    cap_tokens[:, 2] = cfg.text.vocab_size - 1

    out = {"batch": batch}
    for name, approx in (("exact_with_layers", False),
                         ("approx_frozen_scores", True)):
        trainer = _mk(cfg, n_vid=2, approx=approx)
        try:
            trainer.step(images, labels, images, cap_tokens)  # compile+warm
        except Exception as e:  # noqa: BLE001 — HBM OOM is a datapoint here
            msg = str(e)
            out[name] = ("OOM: " + msg[msg.find("Used"):][:40]
                         if "memory space hbm" in msg else
                         "error: " + msg[:120])
            continue
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            m = trainer.step(images, labels, images, cap_tokens)
        dt = (time.perf_counter() - t0) / iters
        out[name + "_ms"] = round(dt * 1e3, 1)
        out[name + "_img_s"] = round(batch / dt, 1)
    if ("exact_with_layers_ms" in out
            and "approx_frozen_scores_ms" in out):
        out["speedup"] = round(out["exact_with_layers_ms"]
                               / out["approx_frozen_scores_ms"], 3)
    print(json.dumps(out), flush=True)


def dynamics(steps: int = 60):
    from debias_vision_lang_tpu.core.config import (
        CLIPConfig, TextConfig, VisionConfig)

    cfg = CLIPConfig(
        name="tiny",
        vision=VisionConfig(kind="vit", image_size=16, patch_size=8, width=32,
                            layers=2, heads=2, embed_dim=16),
        text=TextConfig(vocab_size=128, context_length=16, width=32,
                        layers=2, heads=2, embed_dim=16),
    )
    rng = np.random.default_rng(42)
    stream = [(rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
               (rng.random(8) < 0.5).astype(np.float32),
               rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
              for _ in range(steps)]
    ctx = 16
    cap = np.zeros((8, ctx), np.int32)
    cap[:, 0] = 126
    cap[:, 1] = rng.integers(1, 100, 8)
    cap[:, 2] = 127

    runs = {}
    for name, approx in (("exact", False), ("approx", True)):
        trainer = _mk(cfg, n_vid=1, approx=approx)
        losses, advs, cons = [], [], []
        for img, lab, cimg in stream:
            m = trainer.step(img, lab, cimg, cap)
            losses.append(m["loss"])
            advs.append(m["adv_loss"])
            cons.append(m["contrastive_loss"])
        runs[name] = {
            "trainer": trainer,
            "loss_first5": [round(v, 4) for v in losses[:5]],
            "loss_last5": [round(v, 4) for v in losses[-5:]],
            "adv_last5": [round(v, 4) for v in advs[-5:]],
            "con_last5": [round(v, 4) for v in cons[-5:]],
        }

    wa = np.asarray(runs["exact"]["trainer"].model
                    .clip_params["visual"]["resblocks"]["attn"]["wqkv"])[1]
    wb = np.asarray(runs["approx"]["trainer"].model
                    .clip_params["visual"]["resblocks"]["attn"]["wqkv"])[1]
    cos = float((wa.ravel() @ wb.ravel())
                / (np.linalg.norm(wa) * np.linalg.norm(wb)))
    da = np.asarray(runs["exact"]["trainer"].model.debias_tokens)
    db = np.asarray(runs["approx"]["trainer"].model.debias_tokens)
    dcos = float((da.ravel() @ db.ravel())
                 / (np.linalg.norm(da) * np.linalg.norm(db)))
    print(json.dumps({
        "steps": steps,
        "exact": {k: v for k, v in runs["exact"].items() if k != "trainer"},
        "approx": {k: v for k, v in runs["approx"].items() if k != "trainer"},
        "vid_layer_weight_cosine": round(cos, 6),
        "debias_tokens_cosine": round(dcos, 6),
    }), flush=True)


def main():
    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    step_time(batch)
    dynamics()


if __name__ == "__main__":
    main()
