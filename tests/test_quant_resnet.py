"""Int8 ModifiedResNet building blocks: BN folding exactness, int8 conv
dequantization, and the full pipeline at dtype="int8" on a resnet arch.
(Tower-level cosine/dispatch tests live in test_quant.py::TestQuantizedCLIP.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debias_vision_lang_tpu.models.resnet import (batch_norm, conv, init_bn,
                                                  init_conv)
from debias_vision_lang_tpu.ops.quant_resnet import (fold_bn, int8_conv,
                                                     quantize_conv_weight)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_fold_bn_is_exact(rng):
    """conv→BN == folded-conv + bias to f32 roundoff (folding is algebra,
    not approximation)."""
    cp = init_conv(jax.random.key(0), 3, 3, 4, 8)
    bp = init_bn(8)
    # non-trivial BN stats
    bp["mean"] = jnp.asarray(rng.normal(size=8), jnp.float32)
    bp["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32)
    bp["scale"] = jnp.asarray(rng.normal(size=8), jnp.float32)
    bp["bias"] = jnp.asarray(rng.normal(size=8), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 4)), jnp.float32)
    ref = batch_norm(bp, conv(cp, x, padding=1))
    w, b = fold_bn(cp, bp)
    out = conv({"kernel": w}, x, padding=1) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_conv_matches_quantized_oracle(rng):
    """int8_conv == explicit quantize→int conv→dequantize in numpy."""
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)
    wq = quantize_conv_weight(w)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    out = np.asarray(int8_conv(x, wq, stride=1, padding=1))

    s_x = np.maximum(np.abs(np.asarray(x)).max(axis=(1, 2, 3),
                                               keepdims=True) / 127.0, 1e-8)
    xq = np.clip(np.round(np.asarray(x) / s_x), -127, 127)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(wq["q"], jnp.float32),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref) * s_x * np.asarray(wq["scale"])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_int8_conv_accuracy(rng):
    """Dequantized int8 conv tracks the fp conv (per-channel weights +
    per-image activations)."""
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)), jnp.float32)
    ref = np.asarray(conv({"kernel": w}, x, padding=1))
    out = np.asarray(int8_conv(x, quantize_conv_weight(w), padding=1))
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.05


def test_measure_bias_resnet_int8(rng, tmp_path):
    """dtype='int8' through measure_bias on a resnet arch — the pipeline
    surface the ladder promises for every family."""
    import os

    import pandas as pd
    from PIL import Image

    from debias_vision_lang_tpu.core.config import (CLIPConfig, TextConfig,
                                                    VisionConfig)
    from debias_vision_lang_tpu.eval.measure import measure_bias
    from debias_vision_lang_tpu.models.clip import init_clip_params
    from debias_vision_lang_tpu.models.loader import CLIP
    from debias_vision_lang_tpu.vision.preprocess import Preprocess

    cfg = CLIPConfig(
        name="rn-tiny",
        vision=VisionConfig(kind="resnet", image_size=64, width=16,
                            layers=(1, 1, 1, 1), heads=8, embed_dim=32),
        text=TextConfig(vocab_size=128, context_length=16, width=32,
                        layers=1, heads=2, embed_dim=32))
    model = CLIP(params=init_clip_params(jax.random.key(0), cfg), cfg=cfg)

    root = tmp_path / "ff"
    os.makedirs(root / "imgs" / "train_val" / "v")
    races = ["White", "Black", "Indian", "East Asian", "Southeast Asian",
             "Middle Eastern", "Latino_Hispanic"]
    ages = ["0-2", "3-9", "10-19", "20-29", "30-39", "40-49", "50-59",
            "60-69", "more than 70"]
    rows = []
    for i in range(8):
        f = f"v/{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                        ).save(root / "imgs" / "train_val" / f)
        rows.append({"file": f, "gender": "Male" if i % 2 else "Female",
                     "race": races[i % 7], "age": ages[i % 9]})
    for m in ("train", "val"):
        os.makedirs(root / "labels" / m)
        pd.DataFrame(rows).to_csv(root / "labels" / m / f"{m}_labels.csv",
                                  index=False)

    def tok(texts):
        out = np.zeros((len(texts), 16), np.int32)
        out[:, 0] = 126
        for i, t in enumerate(texts):
            out[i, 1] = abs(hash(t)) % 100 + 1
            out[i, 2] = 127
        return out

    res = measure_bias(model, Preprocess(64), tok, "gender",
                       opts={"batch_size": 4, "num_workers": 2, "topn": 4,
                             "data_path": str(root), "dtype": "int8"})
    assert set(res) == {"maxskew", "ndkl"}
    assert np.isfinite(res["ndkl"]["eq_opp"])
