"""End-to-end measure_bias benchmark: N synthetic JPEGs through the full
pipeline (host ingest → embed → 319 prompts → MaxSkew+NDKL).

This is the whole reference hot path (debias_clip/measuring_bias.py:139-156)
measured wall-to-wall, including compile.  PERF.md tracks its history.

Usage: python benchmarks/e2e_measure_bias.py [n_images] [img_size]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fake_fairface(root: str, n: int, size: int) -> None:
    from PIL import Image
    import pandas as pd

    img_dir = os.path.join(root, "imgs", "train_val", "val")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    races = ["East Asian", "Indian", "Black", "White", "Middle Eastern",
             "Latino_Hispanic", "Southeast Asian"]
    ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59",
            "60-69", "more than 70"]
    rows = []
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"),
                                  quality=90)
        rows.append({
            "file": f"val/{i}.jpg",
            "age": ages[i % len(ages)],
            "gender": "Male" if i % 2 == 0 else "Female",
            "race": races[i % len(races)],
            "service_test": True,
        })
    # both label splits must exist or FairFace's idempotent downloader probes
    # the network (data/download.py::ensure_fairface)
    for mode in ("train", "val"):
        label_dir = os.path.join(root, "labels", mode)
        os.makedirs(label_dir, exist_ok=True)
        pd.DataFrame(rows).to_csv(
            os.path.join(label_dir, f"{mode}_labels.csv"), index=False)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 224

    import jax

    from debias_vision_lang_tpu.core.config import EvalConfig
    from debias_vision_lang_tpu.core.registry import resolve_arch
    from debias_vision_lang_tpu.eval.measure import measure_bias
    from debias_vision_lang_tpu.models.debias import DebiasCLIP
    from debias_vision_lang_tpu.models.clip import init_clip_params
    from debias_vision_lang_tpu.models.debias import init_debias_tokens
    from debias_vision_lang_tpu.core.config import DebiasConfig
    from debias_vision_lang_tpu.text.tokenizer import ClipTokenizer
    from debias_vision_lang_tpu.vision.preprocess import Preprocess

    root = tempfile.mkdtemp(prefix="ff_bench_")
    t0 = time.perf_counter()
    build_fake_fairface(root, n, size)
    print(f"built {n} JPEGs ({size}px) in {time.perf_counter()-t0:.1f}s",
          flush=True)

    cfg = resolve_arch("openai/CLIP/ViT-B/16")
    params = init_clip_params(jax.random.key(0), cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=512)
    deb = init_debias_tokens(jax.random.key(1), params, dcfg)
    model = DebiasCLIP(clip_params=params, debias_tokens=deb, clip_cfg=cfg,
                       debias_cfg=dcfg)
    tok = ClipTokenizer([("t", "h"), ("th", "e</w>")], context_length=77)

    dtype = os.environ.get("E2E_DTYPE", "bfloat16")
    if dtype not in ("float32", "bfloat16", "int8", "int8-text"):
        sys.exit(f"E2E_DTYPE={dtype!r}: expected float32|bfloat16|int8|int8-text")
    t0 = time.perf_counter()
    out = measure_bias(model, Preprocess(), tok, "gender",
                       opts={"data_path": root, "dtype": dtype,
                             "batch_size": 256})
    dt = time.perf_counter() - t0
    print(json.dumps({
        "n_images": n, "img_size": size, "dtype": dtype,
        "wall_s_incl_compile": round(dt, 1),
        "img_per_s": round(n / dt, 1),
        "maxskew_eq_opp": out["maxskew"]["eq_opp"],
        "ndkl_eq_opp": out["ndkl"]["eq_opp"],
    }))


if __name__ == "__main__":
    main()
