"""Batched inference engine behind the serving API.

TPU-first shape discipline: every device call runs at a power-of-two batch
bucket (pad with zeros, slice the results), so a server sees at most
log2(max_batch)+1 compiles per entry point ever — the same bucketing scheme
as the dynamic-N metric engine (metrics/ranking.py).  Host-side image decode
rides the native C++ ingest runtime when available (bit-exact PIL chain,
PERF.md) with a PIL fallback.

The engine wraps any ClipLike model bundle (CLIP or DebiasCLIP — both are
registered pytrees, so the whole model passes as a jit ARGUMENT: weights
ship as device buffers, never baked constants).
"""

from __future__ import annotations

import functools
import io
import threading
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..vision.preprocess import preprocess_batch, resize_crop_u8, to_rgb_array


def _pow2_ceil(n: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return b


def _logit_scale(model):
    ls = getattr(model, "logit_scale", None)
    if ls is not None:
        return ls
    params = getattr(model, "clip_params", None)
    if params is None:
        params = model.params
    return params["logit_scale"]


def _next_bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two bucket holding n (callers chunk to max_batch,
    which __init__ normalizes to a power of two, so this never exceeds it)."""
    return min(_pow2_ceil(n), max_batch)


def _model_stats(model):
    """The tower's normalization stats from the bundle's static config
    (CLIP default; SLIP/FiT = ImageNet — VisionConfig.image_mean/_std)."""
    cfg = getattr(model, "clip_cfg", None) or getattr(model, "cfg", None)
    if cfg is None:
        return {}
    return {"mean": cfg.vision.image_mean, "std": cfg.vision.image_std}


@partial(jax.jit, static_argnames=("compute_dtype",))
def _embed_images_u8(model, images_u8, compute_dtype):
    if images_u8.ndim == 3:
        # patch-contiguous uint8 staging [B, P, patch²·3]: the bundle's
        # encode_image dispatches to the folded relayout-free stem — no
        # device preprocess (models/clip.py::_is_patch_staging)
        return model.encode_image(images_u8,
                                  dtype=compute_dtype).astype(jnp.float32)
    x = preprocess_batch(images_u8, images_u8.shape[1], **_model_stats(model))
    return model.encode_image(x, dtype=compute_dtype).astype(jnp.float32)


@partial(jax.jit, static_argnames=("compute_dtype",))
def _embed_texts(model, tokens, compute_dtype):
    return model.encode_text(tokens, dtype=compute_dtype).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _sharded_embed(mesh, inner, compute_dtype):
    """DP wrapper over the data axis (parallel.mesh.dp_shard_map — keeps
    the fused pallas kernels per-chip)."""
    from ..parallel.mesh import dp_shard_map

    def local(model, batch):
        return inner(model, batch, compute_dtype)

    return dp_shard_map(mesh, local)


# per-image pixel ceiling (≈ 0.2 GB decoded RGB).  PIL's decompression-bomb
# guard does not cover the native libjpeg path, whose output buffer is sized
# from attacker-controlled header dimensions — a ~300 KB crafted 65500²
# JPEG would otherwise allocate ~12.8 GB from one record.
MAX_DECODE_PIXELS = 64 * 1024 * 1024


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Image bytes (JPEG/PNG/...) → uint8 [H, W, 3] RGB.

    Native libjpeg decode when built (bit-exact vs PIL, ~50× faster on small
    hosts) — that path never touches PIL, header to pixels; PIL handles
    everything else, parsed once.  Dimensions are checked against
    ``MAX_DECODE_PIXELS`` from the header BEFORE any pixel decode (both
    libjpeg's header reader and ``Image.open`` size images without
    decoding)."""
    from .. import native

    if data[:2] == b"\xff\xd8" and native.available():  # JPEG magic
        try:
            h, w = native.jpeg_dims(data)
        except ValueError:
            h = w = None  # exotic variant → PIL below
        if h is not None:
            if w * h > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"image {w}x{h} exceeds the {MAX_DECODE_PIXELS}-pixel "
                    "decode limit")
            try:
                return native.decode_jpeg(data, dims=(h, w))
            except ValueError:
                pass  # fall through to PIL for exotic variants

    from PIL import Image

    try:
        im = Image.open(io.BytesIO(data))
        w, h = im.size
    except Image.DecompressionBombError as e:
        # PIL's own guard (a plain Exception, not OSError) fires during the
        # header parse for extreme sizes — same client-error class as ours
        raise ValueError(str(e)) from e
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"image {w}x{h} exceeds the {MAX_DECODE_PIXELS}-pixel "
            "decode limit")
    return to_rgb_array(im)


class InferenceEngine:
    """Thread-safe batched embed/score front-end over a model bundle."""

    def __init__(
        self,
        model,
        tokenizer=None,
        max_batch: int = 64,
        compute_dtype: Optional[str] = None,
        mesh=None,
    ):
        """``mesh``: a ``(data, model)`` jax Mesh for multi-chip serving —
        params replicate once, every batch shards over the data axis via
        shard_map (the fused-block pallas calls stay per-chip, same pattern
        as eval/measure.py's DP embed).  Bucket sizes then start at the
        data-axis size, which must be a power of two."""
        self.precision = str(compute_dtype) if compute_dtype else "auto"
        if compute_dtype is None:
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        # shared precision-ladder policy (ops/quant): "int8" wraps the
        # vision tower in the quantized bundle, bf16/f32 pass through, and
        # an unknown dtype string is rejected with the same error every
        # surface gives
        from ..ops.quant import resolve_compute

        model, compute_dtype = resolve_compute(model, str(compute_dtype))
        self.model = model
        self.tokenizer = tokenizer
        # bundle flavors: DebiasCLIP (.clip_cfg), CLIP/QuantizedCLIP (.cfg)
        cfg = getattr(model, "clip_cfg", None) or model.cfg
        self.cfg = cfg
        self.n_px = cfg.vision.image_size
        self.embed_dim = cfg.embed_dim
        self.context_length = cfg.text.context_length
        # normalize to a power of two so the warmup bucket set and the
        # runtime bucket cap are the same closed set
        self.max_batch = _pow2_ceil(int(max_batch))
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.mesh = mesh
        self.min_bucket = 1
        # patch-contiguous uint8 staging (same policy as eval/measure.py):
        # plain ViT at its native resolution on the bf16/int8 ladder rungs
        # stages batches host-side so the stem runs as ONE relayout-free
        # matmul with the normalize folded into the weights (exact int8 on
        # the quantized path, folded bf16 otherwise — measured +2.5% e2e);
        # float32 keeps the preprocess+conv stem (reference-parity mode)
        self._patch = None
        if (cfg.vision.kind in ("vit", "slip_vit")
                and self.compute_dtype == jnp.bfloat16
                and self.n_px % cfg.vision.patch_size == 0):
            self._patch = cfg.vision.patch_size
        dt = self.compute_dtype
        if mesh is None:
            # one device_put of the params up front; subsequent jit calls
            # reuse the committed buffers
            self.model = jax.device_put(model)
            self._embed_images = partial(_embed_images_u8, compute_dtype=dt)
            self._embed_tokens = partial(_embed_texts, compute_dtype=dt)
        else:
            from ..parallel.mesh import replicate_params

            data_size = int(mesh.shape["data"])
            if data_size & (data_size - 1):
                raise ValueError("mesh data-axis size must be a power of two "
                                 f"for bucketed serving, got {data_size}")
            self.min_bucket = data_size
            if self.max_batch < data_size:
                self.max_batch = data_size
            self.model = replicate_params(model, mesh)
            self._embed_images = _sharded_embed(mesh, _embed_images_u8, dt)
            self._embed_tokens = _sharded_embed(mesh, _embed_texts, dt)
        self._lock = threading.Lock()
        # params are frozen for the engine's lifetime: read logit_scale once
        # instead of a blocking device→host fetch on every score() call
        self._score_scale = float(np.exp(np.asarray(_logit_scale(self.model))))

    # -- batch entry points (called by the micro-batcher) --------------------

    def dispatch_image_arrays(self, images_u8: Sequence[np.ndarray]):
        """Stage + launch (async): uint8 arrays → device array handle.

        jax dispatch returns before the device finishes; pair with
        ``fetch`` on another thread so consecutive batches pipeline
        (host staging / H2D of batch k+1 overlap batch k's compute)."""
        n = len(images_u8)
        if n > self.max_batch:
            raise ValueError(f"dispatch of {n} items exceeds max_batch="
                             f"{self.max_batch}; chunk first "
                             "(embed_image_arrays does)")
        bucket = max(_next_bucket(n, self.max_batch), self.min_bucket)
        if self._patch is not None:
            # staged bucket [bucket, P, patch²·3]: items may arrive
            # pre-patchified (the native raw-JPEG ingest emits the staging
            # layout directly at decode time — prepare_images_batch) or as
            # HWC frames, which get one vectorized reorder per bucket
            g = self.n_px // self._patch
            pp, dd = g * g, self._patch * self._patch * 3
            batch = np.zeros((bucket, pp, dd), np.uint8)
            hwc = []
            for i, img in enumerate(images_u8):
                if img.shape == (pp, dd):
                    batch[i] = img
                elif img.shape == (self.n_px, self.n_px, 3):
                    hwc.append(i)
                else:
                    raise ValueError(
                        f"image {i}: expected ({self.n_px},{self.n_px},3) "
                        f"or staged ({pp},{dd}), got {img.shape}")
            if hwc:
                from ..vision.preprocess import patchify_u8

                batch[np.asarray(hwc)] = patchify_u8(
                    np.stack([images_u8[i] for i in hwc]), self._patch)
        else:
            batch = np.zeros((bucket, self.n_px, self.n_px, 3), np.uint8)
            for i, img in enumerate(images_u8):
                if img.shape != (self.n_px, self.n_px, 3):
                    raise ValueError(
                        f"image {i}: expected "
                        f"({self.n_px},{self.n_px},3), got {img.shape}")
                batch[i] = img
        with self._lock:
            return self._embed_images(self.model, jnp.asarray(batch))

    def dispatch_token_arrays(self, tokens: Sequence[np.ndarray]):
        """Stage + launch (async): int32 token rows → device array handle."""
        n = len(tokens)
        if n > self.max_batch:
            raise ValueError(f"dispatch of {n} items exceeds max_batch="
                             f"{self.max_batch}; chunk first "
                             "(embed_token_arrays does)")
        bucket = max(_next_bucket(n, self.max_batch), self.min_bucket)
        batch = np.zeros((bucket, self.context_length), np.int32)
        for i, row in enumerate(tokens):
            batch[i] = row
        with self._lock:
            return self._embed_tokens(self.model, jnp.asarray(batch))

    @staticmethod
    def fetch(handle, n: int) -> np.ndarray:
        """Block for the device result and strip bucket padding."""
        return np.asarray(handle[:n])

    def _chunked(self, dispatch, items) -> np.ndarray:
        """Run >max_batch inputs as a pipeline of max_batch dispatches
        (launch them all — async — then fetch in order)."""
        if not items:
            return np.zeros((0, self.embed_dim), np.float32)
        chunks = [items[i:i + self.max_batch]
                  for i in range(0, len(items), self.max_batch)]
        handles = [(dispatch(c), len(c)) for c in chunks]
        return np.concatenate([self.fetch(h, n) for h, n in handles])

    def embed_image_arrays(self, images_u8: Sequence[np.ndarray]) -> np.ndarray:
        """uint8 [n_px, n_px, 3] arrays → float32 [N, D] embeddings
        (inputs beyond max_batch are chunked into bucket-sized launches)."""
        return self._chunked(self.dispatch_image_arrays, list(images_u8))

    def embed_token_arrays(self, tokens: Sequence[np.ndarray]) -> np.ndarray:
        """int32 [context_length] token rows → float32 [N, D] embeddings
        (chunked like embed_image_arrays)."""
        return self._chunked(self.dispatch_token_arrays, list(tokens))

    def warmup(self, log=None) -> None:
        """Pre-compile every batch bucket for both modalities.

        A serving process must not discover compiles under load: each
        power-of-two bucket is one XLA program, so trigger them all up front
        (the persistent compilation cache makes this near-free after the
        first server start on a machine)."""
        b = self.min_bucket
        while True:
            if log:
                log(f"warmup: bucket {b}")
            if self._patch is not None:
                g = self.n_px // self._patch
                imgs = jnp.zeros((b, g * g, self._patch ** 2 * 3), jnp.uint8)
            else:
                imgs = jnp.zeros((b, self.n_px, self.n_px, 3), jnp.uint8)
            toks = jnp.zeros((b, self.context_length), jnp.int32)
            with self._lock:
                self._embed_images(self.model, imgs).block_until_ready()
                self._embed_tokens(self.model, toks).block_until_ready()
            if b >= self.max_batch:
                break
            b <<= 1

    # -- host-side conveniences ---------------------------------------------

    def prepare_image(self, data: bytes) -> np.ndarray:
        """bytes → decoded + bit-exact-PIL resize/crop uint8 [n_px, n_px, 3]."""
        return resize_crop_u8(decode_image_bytes(data), self.n_px)

    def prepare_images_batch(self, records: Sequence[bytes]) -> list:
        """Decode + bit-exact resize/crop a WHOLE request's encoded images
        in one threaded native call (the raw-JPEG serving path).

        JPEG/PNG records ride ``native.ingest_batch_mem_u8[p]`` — decode,
        PIL-exact short-side resize, center crop, and (on the staged bf16/
        int8 rungs) the patch-contiguous relayout, all inside the C++
        thread pool with the per-image pixel cap enforced from the header.
        Anything else (exotic formats, no native build) falls back to the
        per-record Python chain, preserving PIL's format coverage.  Raises
        ValueError naming the first undecodable/oversized record."""
        from .. import native

        out: list = [None] * len(records)
        nat_idx = []
        if native.available():
            nat_idx = [i for i, r in enumerate(records)
                       if r[:2] == b"\xff\xd8" or r[:8] == b"\x89PNG\r\n\x1a\n"]
        if nat_idx:
            blobs = [records[i] for i in nat_idx]
            if self._patch is not None:
                arr, ok = native.ingest_batch_mem_u8p(
                    blobs, self.n_px, self._patch,
                    max_pixels=MAX_DECODE_PIXELS)
            else:
                arr, ok = native.ingest_batch_mem_u8(
                    blobs, self.n_px, max_pixels=MAX_DECODE_PIXELS)
            if not ok.all():
                bad = nat_idx[int(np.flatnonzero(~ok)[0])]
                raise ValueError(
                    f"undecodable or oversized image record {bad}")
            for j, i in enumerate(nat_idx):
                out[i] = arr[j]
        for i, r in enumerate(records):
            if out[i] is None:
                try:
                    out[i] = self.prepare_image(r)
                except OSError as e:
                    # PIL raises UnidentifiedImageError/OSError on corrupt
                    # bytes; a bad client payload must 400, not 500
                    raise ValueError(
                        f"undecodable image record {i}: {e}") from e
        return out

    def tokenize(self, texts: List[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError("engine built without a tokenizer "
                               "(BPE vocab missing?)")
        return np.asarray(self.tokenizer(texts), np.int32)

    def score(self, image_embs: np.ndarray, text_embs: np.ndarray) -> np.ndarray:
        """Softmaxed logits-per-image (the reference README flow,
        reference: README.md:57-64): [N_img, N_txt] probabilities."""
        img = image_embs / np.linalg.norm(image_embs, axis=-1, keepdims=True)
        txt = text_embs / np.linalg.norm(text_embs, axis=-1, keepdims=True)
        logits = self._score_scale * img @ txt.T
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def info(self) -> dict:
        return {
            "model": self.cfg.name,
            "n_px": self.n_px,
            "embed_dim": self.embed_dim,
            "context_length": self.context_length,
            "compute_dtype": str(self.compute_dtype),
            "precision": self.precision,
            "max_batch": self.max_batch,
            "backend": jax.default_backend(),
            "has_tokenizer": self.tokenizer is not None,
            "mesh": (dict(self.mesh.shape) if self.mesh is not None else None),
            "device_memory": _device_memory(),
        }


def _device_memory():
    """Per-device HBM usage when the backend exposes it (TPU does; CPU
    returns None entries)."""
    out = []
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            out.append({
                "device": str(dev),
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            })
    return out or None
