"""Bias measurement + adversarial debias training, end to end.

Mirrors the reference's two workflows (README.md:138-157) through this
framework's API.  Requires FairFace on disk (``cli download fairface``) and
the BPE vocab; every missing asset raises an error naming its fetch command.

    python examples/measure_and_train.py --attribute gender --epochs 5
"""

import argparse
import json
import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import debias_vision_lang_tpu as debias_clip
from debias_vision_lang_tpu.train.loop import run_training


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="openai/CLIP/ViT-B/16")
    ap.add_argument("--attribute", default="gender")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--topn", type=float, default=1000)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    # 1. measure the biased baseline
    model, preprocess, tokenizer, alias = debias_clip.model_loader(args.arch)
    before = debias_clip.measure_bias(
        model, preprocess, tokenizer, attribute=args.attribute,
        opts={"topn": int(args.topn), "progress": True})
    print("baseline bias:", json.dumps(before, indent=2))

    if args.skip_train:
        return

    # 2. train the prompt array adversarially (best-NDKL selection)
    summary = run_training(arch=args.arch, attribute=args.attribute,
                           epochs=args.epochs)
    print("training:", json.dumps(summary, indent=2))

    # 3. re-measure with the trained prompts (drop-in via the hub path)
    debiased, _ = debias_clip.load(summary["export"])
    after = debias_clip.measure_bias(
        debiased, preprocess, tokenizer, attribute=args.attribute,
        opts={"topn": int(args.topn), "progress": True})
    print("debiased bias:", json.dumps(after, indent=2))


if __name__ == "__main__":
    main()
