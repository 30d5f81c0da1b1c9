"""Full `run_training` end-to-end ON THE DEVICE at ViT-B/16 scale.

Closes the seam the step-level harness (train_step.py) cannot: that
harness proves the *steps* are fast on the TPU; this one proves the
*loop* works there — synthetic 224px JPEG world on disk, host ingest,
preprocessing, alternating adversarial steps, periodic in-loop NDKL
evals over the val split, best-NDKL selection, checkpointing, and the
reference-format `.pt` export (reference: model/clip.py:16's shipped
checkpoint provenance), all executing on the real chip.

The model is a random-init ViT-B/16 (pretrained CLIP weights are
network-gated, NETWORK_PROBE.md) with a deterministic word-level
tokenizer at the REAL text-tower shape (context 77, vocab 49408,
SOT/EOT = 49406/49407 so the EOT-argmax pooling contract holds,
reference model/model.py:265).  Bias efficacy at this scale is NOT the
claim (that's train/efficacy.py); mechanics + finite metrics + device
throughput are.

Usage:  python benchmarks/train_e2e_device.py [--rungs fp32,bf16,int8]
Numbers: PERF.md "Device end-to-end training".
"""

import argparse
import json
import os
import shutil
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCH = "openai/CLIP/ViT-B/16"

RUNGS = {  # name -> (embed_dtype, train_dtype)
    "fp32": ("float32", "float32"),   # reference-parity
    "bf16": ("bfloat16", "bfloat16"),
    "int8": ("int8", "bfloat16"),
}


def make_word_tokenizer(context_length: int, vocab_size: int):
    """Word-level stand-in for the BPE tokenizer at the real tower shape.

    Deterministic (crc32 of the word into [1, vocab-3]); SOT/EOT are the
    top two ids so EOT stays the argmax of every row."""
    sot, eot = vocab_size - 2, vocab_size - 1

    def tokenize(texts):
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            words = t.lower().split()[: context_length - 2]
            ids = [1 + zlib.crc32(w.encode()) % (vocab_size - 3)
                   for w in words]
            out[i, 0] = sot
            out[i, 1 : 1 + len(ids)] = ids
            out[i, 1 + len(ids)] = eot
        return out

    return tokenize


def steady_state_ms(log_path: str) -> float:
    """Median inter-step wall time (ms) from metrics.jsonl, skipping the
    first (compile-bearing) step and any gap that spans an eval record —
    those gaps carry a full val-split eval + checkpoint save, not step
    cost, and at small --eval-every they would dominate the median."""
    gaps, prev_time, clean = [], None, False
    for line in open(log_path):
        rec = json.loads(line)
        if "loss" in rec:  # train-step record
            if prev_time is not None and clean:
                gaps.append(rec["time"] - prev_time)
            prev_time, clean = rec["time"], True
        else:  # eval/best-snapshot record poisons the following gap
            clean = False
    if len(gaps) < 3:
        return float("nan")
    return float(np.median(gaps[1:]) * 1e3)


def run_rung(name: str, world, root: str, epochs: int,
             batch: int, eval_every: int, embed_cache: bool = True,
             embed_cache_dir: str = None) -> dict:
    import torch

    from debias_vision_lang_tpu.core.config import TrainConfig
    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.train.loop import run_training

    embed_dtype, train_dtype = RUNGS[name]
    cfg = resolve_arch(ARCH)
    tokenize = make_word_tokenizer(cfg.text.context_length,
                                   cfg.text.vocab_size)
    ckpt = os.path.join(root, f"ckpt_{name}")
    shutil.rmtree(ckpt, ignore_errors=True)

    t0 = time.perf_counter()
    summary = run_training(
        arch=ARCH,
        attribute="gender",
        pretrained=False,  # offline: random init; mechanics are the claim
        tokenizer=tokenize,
        data_path=world["fairface"],
        pairs_path=world["pairs"],
        eval_n_samples=None,  # the full 512-image val split
        train_cfg=TrainConfig(
            batch_size=batch, num_epochs=epochs, eval_every_steps=eval_every,
            checkpoint_dir=ckpt, embed_dtype=embed_dtype,
            train_dtype=train_dtype,
            cache_frozen_embeddings=embed_cache,
            embedding_cache_dir=embed_cache_dir),
        checkpoint_dir=ckpt,
        progress=True,
        seed=0,
    )
    wall = time.perf_counter() - t0

    # the export IS the reference checkpoint format: a bare [P, width]
    # tensor (reference model/clip.py:75-81) — load it back as proof
    best = torch.load(summary["export"], map_location="cpu",
                      weights_only=True)
    assert best.shape[1] == cfg.text.width, best.shape
    assert np.all(np.isfinite(best.numpy()))
    assert np.isfinite(summary["best_ndkl"])
    assert np.isfinite(summary["final_ndkl"])

    steps = summary["steps"]
    step_ms = steady_state_ms(os.path.join(ckpt, "logs", "metrics.jsonl"))
    rec = {
        "rung": name, "embed_dtype": embed_dtype, "train_dtype": train_dtype,
        "embed_cache": bool(summary["embed_cache"]),
        "embed_cache_disk": summary.get("embed_cache_disk"),
        "steps": steps, "epochs": epochs, "batch": batch,
        "wall_s": round(wall, 1),
        "e2e_img_per_s": round(steps * batch / wall, 1),
        "steady_step_ms": round(step_ms, 1),
        "steady_img_per_s": round(batch / (step_ms / 1e3), 1),
        "best_ndkl": round(summary["best_ndkl"], 4),
        "final_ndkl": round(summary["final_ndkl"], 4),
        "export": os.path.basename(summary["export"]),
    }
    print(json.dumps(rec))
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--rungs", default="fp32,bf16,int8")
    ap.add_argument("--root", default="/tmp/train_e2e_device")
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-val", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--eval-every", type=int, default=4)
    ap.add_argument("--no-embed-cache", action="store_true",
                    help="disable the frozen-embedding cache "
                         "(TrainConfig.cache_frozen_embeddings) for A/B")
    ap.add_argument("--embed-cache-dir", default=None,
                    help="persist the once-embedded rows to disk "
                         "(TrainConfig.embedding_cache_dir) — a second "
                         "rung/run over the same tower + world skips the "
                         "decode+embed pass; NOTE: rungs differ in "
                         "embed_dtype, so each rung keeps its own keys")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    import jax

    from debias_vision_lang_tpu.train.efficacy import build_world

    print("devices:", jax.devices())
    world_dir = os.path.join(args.root, "world")
    marker = os.path.join(world_dir, f"done_{args.n_train}_{args.n_val}")
    t0 = time.perf_counter()
    if not os.path.exists(marker):
        shutil.rmtree(world_dir, ignore_errors=True)
        world = build_world(world_dir, n_train=args.n_train,
                            n_val=args.n_val, px=224, seed=0)
        open(marker, "w").close()
        print(f"world built in {time.perf_counter() - t0:.1f}s "
              f"({args.n_train}+{args.n_val} JPEGs at 224px)")
    else:
        world = {"fairface": os.path.join(world_dir, "fairface"),
                 "pairs": os.path.join(world_dir, "pairs")}
        print("world reused")

    out = [run_rung(name, world, args.root, args.epochs,
                    args.batch, args.eval_every,
                    embed_cache=not args.no_embed_cache,
                    embed_cache_dir=args.embed_cache_dir)
           for name in args.rungs.split(",")]
    print(json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
