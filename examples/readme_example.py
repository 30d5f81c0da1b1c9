"""The reference README's inference example, on this framework.

Reference flow (README.md:44-75): load the debiased model, preprocess a face
photo, score it against ["a photo of a smart person", "a photo of a dumb
person"], softmax the logits.  With the real checkpoint + vocab present the
golden probabilities are reproduced; offline, pass --random-weights to see
the plumbing run.

    python examples/readme_example.py IMAGE.jpg [--random-weights]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

# allow running from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import debias_vision_lang_tpu as debias_clip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--model", default="ViT-B/16-gender")
    args = ap.parse_args()

    if args.random_weights:
        # offline smoke path: random base + fresh prompt array (no downloads)
        model, preprocess, _, _ = debias_clip.DebiasCLIP.from_cfg(
            {"CLIP_ARCH": "openai/CLIP/ViT-B/16", "NUM_DEBIAS_TOKENS": 2,
             "PRETRAINED": False})
    else:
        model, preprocess = debias_clip.load(args.model)
    try:
        tokenizer = debias_clip.load_tokenizer()
    except FileNotFoundError:
        if not args.random_weights:
            sys.exit("BPE vocab missing: python -m debias_vision_lang_tpu.cli download bpe")

        def tokenizer(texts):  # structural stand-in for offline smoke runs
            out = np.zeros((len(texts), 77), np.int32)
            out[:, 0] = 49406
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % 49000
                out[i, 2] = 49407
            return out

    image = preprocess(Image.open(args.image))[None]
    text = tokenizer(["a photo of a smart person", "a photo of a dumb person"])

    logits_per_image, _ = model(image, text)
    import jax

    probs = np.asarray(jax.nn.softmax(logits_per_image, axis=-1))[0]
    print(f"Label probs: {probs}")  # golden (real weights): see README.md:63-64


if __name__ == "__main__":
    main()
