"""Video-family bias measurement: Frozen-in-Time over a video corpus.

The reference advertises the m-bain/frozen-in-time family but stubs it
(reference: debias_clip/model/model.py:115-116); here it measures like any
other ClipLike.  The corpus layout is

    <root>/videos/<video_id>/frame_0001.jpg ...   (or <video_id>.gif)
    <root>/labels.csv                             (file,gender,race,age)

with the FairFace label vocabulary.  Offline, --synthetic builds a tiny
random corpus AND substitutes a toy tokenizer when the BPE vocab asset is
absent, so the whole flow (ingest → video tower → metrics) runs end to end
with no network.

    python examples/video_bias.py --data-path CORPUS [--synthetic]
"""

import argparse
import json
import os
import sys

import numpy as np

# allow running from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import debias_vision_lang_tpu as debias_clip


def make_synthetic_corpus(root: str, n_videos: int = 8, frames: int = 6):
    from PIL import Image

    rng = np.random.default_rng(0)
    rows = []
    for v in range(n_videos):
        vdir = os.path.join(root, "videos", f"vid{v:03d}")
        os.makedirs(vdir, exist_ok=True)
        for f in range(frames):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(vdir, f"frame_{f}.jpg"))
        rows.append({"file": f"videos/vid{v:03d}",
                     "gender": "Male" if v % 2 == 0 else "Female",
                     "race": "White", "age": "20-29"})
    import pandas as pd

    pd.DataFrame(rows).to_csv(os.path.join(root, "labels.csv"), index=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="video_corpus")
    ap.add_argument("--attribute", default="gender")
    ap.add_argument("--num-frames", default=4, type=int)
    # int literal = absolute top-k, float literal = dataset fraction —
    # a bare float() would silently turn "--topn 64" into fraction 64.0
    from debias_vision_lang_tpu.cli import _parse_topn

    ap.add_argument("--topn", default=1.0, type=_parse_topn)
    ap.add_argument("--synthetic", action="store_true",
                    help="build a tiny random corpus at --data-path first")
    args = ap.parse_args()

    if args.synthetic:
        make_synthetic_corpus(args.data_path)

    # random weights offline; with a converted upstream checkpoint the loader
    # automatically runs the divided space-time attention it was trained with
    model, preprocess, tokenizer, alias = debias_clip.model_loader(
        "m-bain/frozen-in-time/base", pretrained=not args.synthetic)
    if tokenizer is None:
        if not args.synthetic:
            sys.exit("No BPE vocab: run `python -m debias_vision_lang_tpu "
                     "download bpe` first")
        # offline smoke: a toy hash tokenizer keeps the flow end-to-end
        # (token ids are arbitrary — fine for random weights)
        ctx = model.cfg.text.context_length
        vocab = model.cfg.text.vocab_size

        def tokenizer(texts):
            out = np.zeros((len(texts), ctx), np.int32)
            out[:, 0] = vocab - 2
            for i, t in enumerate(texts):
                out[i, 1] = abs(hash(t)) % (vocab - 3) + 1
                out[i, 2] = vocab - 1
            return out

    results = debias_clip.measure_bias(
        model, preprocess, tokenizer, attribute=args.attribute,
        opts={"dataset": "video", "data_path": args.data_path,
              "num_frames": args.num_frames, "topn": args.topn,
              "batch_size": 8, "equal_split": False, "progress": True})
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
