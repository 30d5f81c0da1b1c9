"""Image preprocess chain: bicubic resize → center crop → normalize, fused
into batched XLA (resize as two MXU matmuls), replacing the torchvision
Compose the reference gets from ``clip.load`` (consumed at
reference: debias_clip/datasets.py:58,122 and debias_clip/measuring_bias.py:142).

Reference chain semantics (torchvision + PIL):
  Resize(n_px, BICUBIC)  — short side → n_px, aspect preserved; *skipped*
                           when the short side already equals n_px and the
                           image is square-enough (torchvision short-circuit)
  CenterCrop(n_px)
  ToTensor()             — uint8 → [0, 1] float
  Normalize(mean=(0.48145466, 0.4578275, 0.40821073),
            std =(0.26862954, 0.26130258, 0.27577711))

PIL parity: resample weights are computed with PIL's exact sampling grid
(pixel centers at (i+0.5)·scale, bicubic a=-0.5, support 2·scale, per-output
normalization, window clipping at borders).

Two parity tiers:
  * ``Preprocess`` (host, default) — BIT-EXACT vs PIL/torchvision.  PIL's
    uint8 path quantizes normalized coefficients to INT32 fixed point
    (PRECISION_BITS = 32-8-2 = 22, Pillow Resample.c normalize_coeffs_8bpc),
    accumulates in int32 and emits ``clip8((sum + 2^21) >> 22)`` per pass;
    ``resize_bicubic_pil_exact`` replicates that arithmetic in integer numpy
    (0 LSB on the reference figures — tested).
  * ``preprocess_batch`` (device, fused into the eval jit) — float32 matmul
    resize on the MXU; ≤2 LSB vs PIL (float weights, no fixed-point).  The
    throughput path; use the host path when golden parity matters.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _bicubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic filter (Keys kernel, a = -0.5), support 2."""
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


@functools.lru_cache(maxsize=64)
def resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] resampling matrix with PIL's grid conventions."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    inv = 1.0 / filterscale
    w = np.zeros((out_size, in_size), np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax)
        k = _bicubic((xs - center + 0.5) * inv)
        w[xx, xmin:xmax] = k / k.sum()
    return w.astype(np.float32)


def resize_output_size(h: int, w: int, n_px: int) -> Tuple[int, int]:
    """torchvision Resize(int) semantics: short side → n_px, aspect kept.

    The long side TRUNCATES — ``int(size * long / short)`` — matching
    torchvision's ``_compute_resized_output_size`` (not round())."""
    if h <= w:
        if h == n_px:
            return h, w
        return n_px, max(int(n_px * w / h), 1)
    if w == n_px:
        return h, w
    return max(int(n_px * h / w), 1), n_px


# --- PIL bit-exact path (host) -------------------------------------------
#
# Pillow's uint8 resample (Resample.c): coefficients are computed in double,
# normalized, then quantized to INT32 fixed point with PRECISION_BITS =
# 32 - 8 - 2 = 22 (half-away-from-zero, C (int) truncation); each pass
# accumulates pixel*coeff in int32 and emits clip8((sum + 2^21) >> 22).
# Horizontal pass first, then vertical, each through uint8.

_PIL_PRECISION_BITS = 22


@functools.lru_cache(maxsize=64)
def resize_weights_pil_fixed(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] int32 matrix of PIL's quantized bicubic coeffs.

    Scalar Python loops on purpose: C accumulates the normalizer ``ww``
    sequentially in double; numpy's pairwise summation can differ in the
    last ulp, which moves the quantized coefficient."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    inv = 1.0 / filterscale
    one = 1 << _PIL_PRECISION_BITS
    m = np.zeros((out_size, in_size), np.int32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        ks = [float(_bicubic(np.float64((x + xmin - center + 0.5) * inv)))
              for x in range(xmax - xmin)]
        ww = 0.0
        for k in ks:
            ww += k
        for i, k in enumerate(ks):
            if ww != 0.0:
                k = k / ww
            m[xx, xmin + i] = int(k * one + 0.5) if k >= 0 else int(k * one - 0.5)
    return m


def _clip8(ss: np.ndarray) -> np.ndarray:
    """Pillow clip8: 0 if <=0, 255 if >= 2^30, else >> PRECISION_BITS."""
    ss = np.clip(ss, 0, (1 << 30) - 1)
    return (ss >> _PIL_PRECISION_BITS).astype(np.uint8)


def resize_bicubic_pil_exact(arr_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bit-exact PIL BICUBIC resize of a uint8 [H, W, C] array (host numpy)."""
    h, w, _ = arr_u8.shape
    half = 1 << (_PIL_PRECISION_BITS - 1)
    x = arr_u8.astype(np.int64)
    if w != out_w:
        m = resize_weights_pil_fixed(w, out_w).astype(np.int64)
        x = _clip8(np.einsum("ow,hwc->hoc", m, x) + half).astype(np.int64)
    if h != out_h:
        m = resize_weights_pil_fixed(h, out_h).astype(np.int64)
        x = _clip8(np.einsum("oh,hwc->owc", m, x) + half).astype(np.int64)
    return x.astype(np.uint8)


def _round_u8(x: jax.Array) -> jax.Array:
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "emulate_uint8_rounding")
)
def resize_bicubic(
    images: jax.Array,
    out_h: int,
    out_w: int,
    emulate_uint8_rounding: bool = False,
) -> jax.Array:
    """Batched bicubic resize. images: [B, H, W, C] float32 in [0, 255].

    PIL resamples horizontally first, then vertically, rounding to uint8
    after each pass; ``emulate_uint8_rounding`` reproduces that bit-for-bit
    behavior in float.
    """
    b, h, w, c = images.shape
    x = images
    if w != out_w:
        ww = jnp.asarray(resize_weights(w, out_w))  # [out_w, w]
        x = jnp.einsum("ow,bhwc->bhoc", ww, x)
        if emulate_uint8_rounding:
            x = _round_u8(x)
    if h != out_h:
        wh = jnp.asarray(resize_weights(h, out_h))  # [out_h, h]
        x = jnp.einsum("oh,bhwc->bowc", wh, x)
        if emulate_uint8_rounding:
            x = _round_u8(x)
    return x


def center_crop_slice(size: int, crop: int) -> slice:
    """torchvision CenterCrop offset: round((size - crop) / 2)."""
    top = int(round((size - crop) / 2.0))
    return slice(top, top + crop)


@functools.partial(
    jax.jit, static_argnames=("n_px", "emulate_uint8_rounding")
)
def preprocess_batch(
    images_u8: jax.Array,
    n_px: int = 224,
    emulate_uint8_rounding: bool = False,
    mean=CLIP_MEAN,
    std=CLIP_STD,
) -> jax.Array:
    """Fused device preprocess: uint8 [B, H, W, 3] → normalized float32
    [B, n_px, n_px, 3] (NHWC, the TPU-native layout).

    ``mean``/``std``: the tower's training stats (VisionConfig.image_mean/
    image_std — CLIP by default; SLIP/FiT use ImageNet stats)."""
    b, h, w, _ = images_u8.shape
    x = images_u8.astype(jnp.float32)
    rh, rw = resize_output_size(h, w, n_px)
    x = resize_bicubic(x, rh, rw, emulate_uint8_rounding)
    if rh < n_px or rw < n_px:  # CenterCrop pads when smaller
        # torchvision pads ltrb = (d//2, d//2, (d+1)//2, (d+1)//2): the
        # EXTRA pixel goes right/bottom.
        ph, pw = max(n_px - rh, 0), max(n_px - rw, 0)
        x = jnp.pad(x, ((0, 0), (ph // 2, (ph + 1) // 2),
                        (pw // 2, (pw + 1) // 2), (0, 0)))
        rh, rw = x.shape[1], x.shape[2]
    x = x[:, center_crop_slice(rh, n_px), center_crop_slice(rw, n_px), :]
    m = jnp.asarray(mean, jnp.float32) * 255.0
    sd = jnp.asarray(std, jnp.float32) * 255.0
    return (x - m) / sd


class Preprocess:
    """Per-image callable mirroring the reference's preprocess transform
    (PIL.Image or uint8 array → normalized float32 [n_px, n_px, 3] HWC).

    ``emulate_uint8_rounding=True`` (default) runs the BIT-EXACT host path:
    PIL fixed-point resize (``resize_bicubic_pil_exact``), torchvision crop
    offsets, and the float32 ``(u8/255 - mean)/std`` normalize in
    torchvision's operation order — output matches the reference transform
    bit-for-bit (0 LSB through resize, identical float32 normalize).
    ``False`` routes through the device fast path (``preprocess_batch``).

    Batched throughput use should go through ``preprocess_batch`` directly —
    this per-image wrapper exists for reference-API parity in datasets /
    examples (reference: debias_clip/datasets.py:58,122).
    """

    def __init__(self, n_px: int = 224, emulate_uint8_rounding: bool = True,
                 use_native: bool = True, mean=CLIP_MEAN, std=CLIP_STD):
        self.n_px = n_px
        self.emulate_uint8_rounding = emulate_uint8_rounding
        self.use_native = use_native
        self.mean = tuple(mean)
        self.std = tuple(std)

    def __call__(self, img) -> np.ndarray:
        arr = to_rgb_array(img)
        if not self.emulate_uint8_rounding:
            return np.asarray(
                preprocess_batch(jnp.asarray(arr[None]), self.n_px, False,
                                 mean=self.mean, std=self.std)[0])
        if self.use_native and (self.mean, self.std) == (CLIP_MEAN, CLIP_STD):
            # C++ replica of the same arithmetic (bit-equal, ~50× faster on
            # a 1-core host — tests/test_native_ingest.py); it bakes the
            # CLIP stats, so non-CLIP stats (SLIP/FiT = ImageNet) take the
            # numpy normalize below on the same bit-exact resize
            from .. import native

            if native.available():
                return native.preprocess_u8(arr, self.n_px)
        return preprocess_host_exact(arr, self.n_px, mean=self.mean,
                                     std=self.std)


def resize_crop_u8(arr_u8: np.ndarray, n_px: int = 224) -> np.ndarray:
    """The uint8 half of the reference chain — Resize(n_px, BICUBIC) →
    CenterCrop(n_px) — bit-exact vs PIL/torchvision.  uint8 [H, W, 3] →
    uint8 [n_px, n_px, 3].  The remaining normalize is dtype-exact wherever
    it runs (same float32 ops on the same uint8 values), so this staging
    keeps host→device traffic at uint8 width without breaking parity."""
    h, w, _ = arr_u8.shape
    rh, rw = resize_output_size(h, w, n_px)
    x = resize_bicubic_pil_exact(arr_u8, rh, rw)
    if rh < n_px or rw < n_px:
        ph, pw = max(n_px - rh, 0), max(n_px - rw, 0)
        x = np.pad(x, ((ph // 2, (ph + 1) // 2), (pw // 2, (pw + 1) // 2),
                       (0, 0)))
        rh, rw = x.shape[0], x.shape[1]
    return x[center_crop_slice(rh, n_px), center_crop_slice(rw, n_px), :]


def preprocess_host_exact(arr_u8: np.ndarray, n_px: int = 224,
                          mean=CLIP_MEAN, std=CLIP_STD) -> np.ndarray:
    """Bit-exact host replica of the reference transform chain:
    Resize(n_px, BICUBIC) → CenterCrop(n_px) → ToTensor → Normalize.

    uint8 [H, W, 3] → float32 [n_px, n_px, 3] (HWC)."""
    x = resize_crop_u8(arr_u8, n_px)
    # torchvision op order in float32: ToTensor divides by 255, Normalize
    # subtracts then divides.
    out = x.astype(np.float32) / np.float32(255.0)
    out = out - np.asarray(mean, np.float32)
    out = out / np.asarray(std, np.float32)
    return out


def patchify_u8(arr_u8: np.ndarray, patch: int) -> np.ndarray:
    """Rearrange uint8 images into the patch-contiguous staging layout.

    [B, H, W, 3] (or one [H, W, 3] image) → [B, gh·gw, patch²·3]: the same
    bytes the ViT patchify reads, written patch-row-contiguously — the
    layout the native ingest emits directly at decode time
    (native/ingest.cc::dvl_ingest_batch_files_u8p) and the exact int8 stem
    consumes (ops/quant.py::patch_embed_q_p8).  Host (numpy) fallback for
    when the native runtime is unavailable."""
    one = arr_u8.ndim == 3
    if one:
        arr_u8 = arr_u8[None]
    b, h, w, c = arr_u8.shape
    gh, gw = h // patch, w // patch
    out = (arr_u8.reshape(b, gh, patch, gw, patch * c)
           .transpose(0, 1, 3, 2, 4)
           .reshape(b, gh * gw, patch * patch * c))
    out = np.ascontiguousarray(out)
    return out[0] if one else out


def to_rgb_array(img) -> np.ndarray:
    """PIL image / array → uint8 [H, W, 3]."""
    if isinstance(img, np.ndarray):
        arr = img
    else:  # PIL image
        if img.mode != "RGB":
            img = img.convert("RGB")
        arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr.astype(np.uint8)


def build_preprocess(n_px: int = 224, mean=CLIP_MEAN,
                     std=CLIP_STD) -> Preprocess:
    return Preprocess(n_px=n_px, mean=mean, std=std)
