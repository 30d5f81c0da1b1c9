"""Hyperparameter sweep over one frozen tower — the disk embedding cache.

The reference protocol tunes prompt count / lr / adversarial weight over
the SAME frozen CLIP and the SAME FairFace split (reference README.md:148-157
and the paper's grids).  With ``TrainConfig.embedding_cache_dir`` every
sweep point after the first skips the decode+embed pass entirely: the
once-embedded rows are keyed by content fingerprints (tower weights,
dataset rows, captions CSV, dtype — see train/embcache.py), so a changed
checkpoint or dataset misses instead of silently reusing wrong rows.

Run:  python examples/sweep.py --data-path /path/to/fairface
"""

import argparse
import json

from debias_vision_lang_tpu.core.config import TrainConfig
from debias_vision_lang_tpu.train.loop import run_training


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", required=True, help="FairFace root")
    ap.add_argument("--pairs-path", default=None)
    ap.add_argument("--arch", default="openai/CLIP/ViT-B/16")
    ap.add_argument("--cache-dir", default="sweep_embeddings")
    ap.add_argument("--epochs", type=int, default=5)
    args = ap.parse_args()

    results = []
    for lr in (2e-4, 1e-3, 2e-3):
        for adv_w in (0.5, 1.0, 2.0):
            tag = f"lr{lr:g}_w{adv_w:g}"
            summary = run_training(
                arch=args.arch,
                attribute="gender",
                data_path=args.data_path,
                pairs_path=args.pairs_path,
                checkpoint_dir=f"ckpt_{tag}",
                train_cfg=TrainConfig(
                    num_epochs=args.epochs,
                    prompt_lr=lr,
                    adversarial_weight=adv_w,
                    embed_dtype="bfloat16",
                    # first point embeds once; every later point loads the
                    # rows from disk (summary["embed_cache_disk"] says which)
                    embedding_cache_dir=args.cache_dir,
                    checkpoint_dir=f"ckpt_{tag}",
                ),
            )
            results.append({"tag": tag, "best_ndkl": summary["best_ndkl"],
                            "cache": summary["embed_cache_disk"]})
            print(json.dumps(results[-1]))

    best = min(results, key=lambda r: r["best_ndkl"])
    print("best:", json.dumps(best, indent=2))


if __name__ == "__main__":
    main()
