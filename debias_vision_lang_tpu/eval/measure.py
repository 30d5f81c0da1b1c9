"""Bias measurement: the reference's top-level ``measure_bias`` API
(reference: debias_clip/measuring_bias.py:136-156) as a sharded
embed-then-rank pipeline.

Pipeline (collapses the reference's three hot loops — SURVEY.md §3.3):
  1. host threads decode JPEGs → uint8 batches (data/loader.py);
  2. one jitted step per batch fuses preprocess (resize/crop/normalize) with
     the image tower, batch sharded over the ``data`` mesh axis;
  3. prompts tokenized once, encoded in one batch, L2-normalized
     (reference: measuring_bias.py:75-82 — note the reference normalizes
     prompts but NOT image embeddings; reproduced);
  4. scores = prompts @ images.T in one MXU matmul; MaxSkew/NDKL via the
     jitted top-k + prefix-KL kernel (metrics/ranking.py), or the numpy
     oracle when opts.engine == "oracle".

The reference's dead ``opts`` parameter (measuring_bias.py:136,139) is live
here: batch_size, topn, evaluations, engine, num_workers, dataset, mode,
equal_split and n_samples are honored.  Signature stays
``measure_bias(cliplike, img_preproc, tokenizer, attribute, opts)``; note the
reference README advertises a 2-arg call that its own code never supported
(README.md:145 vs measuring_bias.py:139).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..core.config import Dotdict, EvalConfig
from ..core.paths import PROMPT_DATA_PATH
from ..data.loader import HostLoader
from ..metrics import oracle as metrics_oracle
from ..vision.preprocess import Preprocess, preprocess_batch


def gen_prompts(prompt_path=None) -> List[str]:
    """Evaluation prompt set: every non-blank template × every concept
    (11 × 29 = 319 for the shipped CSV; reference: measuring_bias.py:122-133)."""
    if prompt_path is None:
        from ..core.paths import resolve_asset

        prompt_path = resolve_asset("prompt_templates.csv")
    raw = pd.read_csv(prompt_path, keep_default_na=False)
    templates = [str(t).strip() for t in raw["template"].tolist()]
    concepts = [str(c).strip() for c in raw["concept"].tolist()]
    return [t.format(c) for t in templates if t for c in concepts]


def _vision_cfg_of(cliplike):
    """VisionConfig of a bundle (CLIP / DebiasCLIP / QuantizedCLIP), or
    None for models whose tower config isn't discoverable (custom
    ClipLike objects still work — they just skip layout specializations)."""
    from ..ops.quant import _bundle_cfg

    try:
        return _bundle_cfg(cliplike).vision
    except AttributeError:
        return None


def _resolve_opts(opts) -> EvalConfig:
    if opts is None:
        return EvalConfig()
    if isinstance(opts, EvalConfig):
        return opts
    fields = {f.name for f in dataclasses.fields(EvalConfig)}
    return EvalConfig(**{k: v for k, v in dict(opts).items() if k in fields})


@jax.jit
def _encode_prompts_jit(model, tokens) -> jax.Array:
    emb = model.encode_text(tokens).astype(jnp.float32)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def get_prompt_embeddings(model, tokenizer, prompts: List[str]) -> jax.Array:
    """Tokenize + encode_text + L2-normalize (reference: measuring_bias.py:75-82).
    The model rides as a pytree argument (one cached compilation)."""
    tokens = jnp.asarray(np.asarray(tokenizer(prompts)), jnp.int32)
    return _encode_prompts_jit(model, tokens)


# Module-level jits (jax caches by function identity: a per-call closure
# would retrace the full tower at EVERY measure_bias/eval invocation).  The
# model rides as a pytree ARGUMENT: weights ship as device buffers, not
# compile-time constants (required by the remote-compile path).
@functools.partial(jax.jit, static_argnames=("n_px", "compute_dtype"))
def _embed_step(model, images_u8, n_px, compute_dtype):
    if images_u8.ndim == 3:
        # patch-contiguous uint8 staging [B, P, patch²·3]: the stem runs as
        # one relayout-free matmul with the normalize folded into the
        # weights, no device preprocess — exact int8 on the quantized path
        # (ops/quant.py::patch_embed_q_p8), folded bf16 on the float path
        # (models/clip.py::encode_image_vit_p8)
        return model.encode_image(images_u8,
                                  dtype=compute_dtype).astype(jnp.float32)
    vis = _vision_cfg_of(model)
    stats = ({} if vis is None else
             {"mean": vis.image_mean, "std": vis.image_std})
    if images_u8.ndim == 5:  # video batches [B, T, H, W, 3]: map frames
        b, t = images_u8.shape[:2]
        x = preprocess_batch(images_u8.reshape((b * t,) + images_u8.shape[2:]),
                             n_px, **stats)
        x = x.reshape((b, t) + x.shape[1:])
    else:
        x = preprocess_batch(images_u8, n_px, **stats)
    return model.encode_image(x, dtype=compute_dtype).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _embed_step_pre(model, images_f32, compute_dtype):
    return model.encode_image(images_f32, dtype=compute_dtype).astype(jnp.float32)


@functools.cache
def _embed_step_sharded(mesh, n_px: int, compute_dtype, pre: bool):
    """DP embed step over the data axis (parallel.mesh.dp_shard_map — the
    shard_map pattern that keeps the fused pallas kernels per-chip)."""
    from ..parallel.mesh import dp_shard_map

    def local(model, images):
        if pre:
            return _embed_step_pre(model, images, compute_dtype)
        return _embed_step(model, images, n_px, compute_dtype)

    return dp_shard_map(mesh, local)


def get_labels_img_embeddings(
    loader: HostLoader,
    model,
    n_px: int = 224,
    mesh=None,
    progress: bool = False,
    host_transform: Optional[Callable] = None,
    dtype: str = "float32",
):
    """Embed every image; returns (labels [N], embeddings [N, D] on device).

    Fuses device preprocess + image tower under one jit; image embeddings are
    deliberately NOT normalized (reference: measuring_bias.py:85-99 stores raw
    encode_image outputs).
    """
    from ..parallel.mesh import shard_batch_arrays

    # int8 = quantized vision tower (ops/quant): dynamic-activation int8
    # matmuls, fused-block kernels on TPU — measured faster than bf16 at
    # rank-stable accuracy (tower cosine vs fp32 = 0.99990)
    from ..ops.quant import resolve_compute

    model, compute_dtype = resolve_compute(model, dtype)

    # a loader that already applies a host transform on its decode threads
    # delivers pre-transformed fixed-shape batches — don't re-apply here
    loader_applied = getattr(loader, "host_transform", None) is not None
    pre = host_transform is not None or loader_applied

    all_embs, all_labels = [], []
    iterator = loader
    if progress:
        import tqdm

        iterator = tqdm.tqdm(loader, desc="Embedding images")
    for batch in iterator:
        imgs = (np.stack([host_transform(im) for im in batch.images])
                if host_transform is not None and not loader_applied
                else batch.images)
        if mesh is not None:
            # ragged tail: pad to a multiple of the data-axis size and slice
            # the pad rows back off — NEVER silently fall back to one chip
            n_real = imgs.shape[0]
            d_sz = int(mesh.shape["data"])
            rem = n_real % d_sz
            if rem:
                pad = np.zeros((d_sz - rem,) + imgs.shape[1:], imgs.dtype)
                imgs = np.concatenate([np.asarray(imgs), pad])
            imgs = shard_batch_arrays(mesh, imgs)
            emb = _embed_step_sharded(mesh, n_px, compute_dtype, pre)(
                model, imgs)[:n_real]
        elif pre:
            emb = _embed_step_pre(model, imgs, compute_dtype)
        else:
            emb = _embed_step(model, imgs, n_px, compute_dtype)
        # embeddings STAY on device (async); no per-batch D2H sync — the
        # reference pays a D2H+H2D round-trip per batch (measuring_bias.py:95)
        all_embs.append(emb[: batch.num_valid])
        all_labels.append(batch.labels[: batch.num_valid])
    return np.concatenate(all_labels), jnp.concatenate(all_embs, axis=0)


def eval_ranking(
    labels_list,
    image_embeddings,
    prompts_embeddings,
    evaluation: str = "maxskew",
    topn: Union[int, float] = 1.0,
    engine: str = "tpu",
) -> Dict[str, float]:
    """Reference-signature ranking evaluation (measuring_bias.py:102-119):
    per-prompt metrics averaged over prompts, keys stripped of the
    evaluation prefix."""
    if engine == "oracle":
        return metrics_oracle.eval_ranking_oracle(
            np.asarray(labels_list), np.asarray(image_embeddings),
            np.asarray(prompts_embeddings), evaluation, topn)
    from ..metrics.ranking import eval_ranking as ranking_eval_ranking

    return ranking_eval_ranking(labels_list, image_embeddings,
                                prompts_embeddings, evaluation, topn)


def measure_bias(
    cliplike,
    img_preproc,
    tokenizer,
    attribute: str = "gender",
    opts: Union[dict, Dotdict, EvalConfig, None] = None,
) -> Dict[str, Dict[str, float]]:
    """Measure ranking bias of a CLIP-like model on FairFace (or UTKFace).

    Reference semantics (measuring_bias.py:139-156): FairFace val split with
    equal_split gender balancing, 319 generated prompts, MaxSkew + NDKL with
    topn defaulting to the whole dataset.  Lower = less biased.
    """
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = _resolve_opts(opts)
    extra = dict(opts) if isinstance(opts, (dict, Dotdict)) else {}
    # dtype absent from the caller's opts = the float32 default chose
    # itself; on a TPU that deserves a one-line pointer at the ladder
    # (explicit "float32" stays silent — see hint_implicit_fp32)
    from ..ops.quant import hint_implicit_fp32

    if opts is None or (isinstance(opts, (dict, Dotdict))
                        and "dtype" not in opts):
        hint_implicit_fp32("measure_bias")
    if extra:
        # fail loudly on typo'd opt keys — the reference swallows unknown
        # kwargs via **_kwargs (measuring_bias.py:104), which it documents
        # as a flaw; we don't reproduce that
        known = {f.name for f in dataclasses.fields(EvalConfig)} | {
            "dataset", "mode", "n_samples", "equal_split", "data_path",
            "num_frames", "mesh", "sharded_metrics", "cache_embeddings",
            "prompts"}
        unknown = set(extra) - known
        if unknown:
            raise ValueError(
                f"unknown measure_bias opts {sorted(unknown)}; known keys: "
                f"{sorted(known)}")
        if extra.get("prompts") is not None and not extra["prompts"]:
            # an empty battery would measure nothing (and a falsy
            # placeholder must not silently fall back to the 319 defaults)
            # — fail before any embedding work, same policy as above.
            # None is the documented "use the default battery" spelling.
            raise ValueError(
                "opts['prompts'] is empty — pass a non-empty prompt list, "
                "or None/omit the key for the default generated battery")

    # resolve the precision ladder ONCE so BOTH towers honor it:
    # "int8"/"int8-text" wrap the bundle here (prompt embeddings then run
    # through the wrapped model — int8 text only under "int8-text", since
    # QuantizedCLIP delegates text to the fp base otherwise); bf16/f32 pass
    # through unchanged.  get_labels_img_embeddings re-resolves idempotently.
    from ..ops.quant import resolve_compute, resolve_rung

    # the rung "auto" resolves to, captured BEFORE the wrap: the patch-staging
    # gate below must see "int8"/"bfloat16" (dtype='auto' on a ViT used to
    # fail the raw-string check and silently skip the P8 staged stem — the
    # measured +2.5% B/16 / +73% B/32 eval win auto exists to pick)
    rung = resolve_rung(cliplike, cfg.dtype)
    cliplike, _ = resolve_compute(cliplike, cfg.dtype)

    dataset_name = extra.get("dataset", "fairface")
    mode = extra.get("mode", "val")
    n_samples = extra.get("n_samples")
    equal_split = extra.get("equal_split", True)
    data_path = extra.get("data_path")
    if dataset_name not in ("fairface", "utkface", "video"):
        raise NotImplementedError(f"dataset={dataset_name!r}")

    # our Preprocess object → fused device path; any other callable → host path
    if isinstance(img_preproc, Preprocess):
        n_px, host_transform = img_preproc.n_px, None
    elif img_preproc is None:
        n_px, host_transform = 224, None
    else:
        n_px, host_transform = 224, img_preproc

    mesh = extra.get("mesh")
    if mesh == "auto":
        from ..parallel.mesh import default_mesh

        mesh = default_mesh()

    # optional embedding cache: re-evaluating prompt sets / topn settings on
    # the same (model, dataset) skips the expensive image-tower pass — the
    # reference's IATDataset reserves an image_embeddings slot for this idea
    # (datasets.py:22) but never implements it
    cache_path = extra.get("cache_embeddings")
    # the cached labels are ATTRIBUTE-SPECIFIC (same images, different
    # iat labels) — a gender cache silently scored as race would return
    # wrong metrics, so the dataset-selection identity rides in the file
    # and mismatches fail loudly.  Model identity stays the caller's
    # responsibility (documented above).  default=str normalizes non-JSON
    # opt values (pathlib.Path data_path, numpy n_samples); only built
    # when caching is on.
    if cache_path:
        cache_key = json.dumps({
            "attribute": attribute, "dataset": dataset_name, "mode": mode,
            # the RESOLVED rung, not the raw string: "auto" on a ViT and an
            # explicit "int8" produce identical embeddings — one cache key
            "n_samples": n_samples, "dtype": rung,
            "equal_split": equal_split, "data_path": data_path,
            "num_frames": extra.get("num_frames"),
        }, sort_keys=True, default=str)
    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path)
        stored = str(data["cache_key"]) if "cache_key" in data else None
        if stored != cache_key:
            raise ValueError(
                f"embedding cache {cache_path} was written for "
                f"{stored or 'an older layout without a cache key'} but this "
                f"call needs {cache_key} — the cached labels would be wrong; "
                "use a separate cache path per attribute/dataset config")
        labels, img_embs = data["labels"], jnp.asarray(data["embeddings"])
    else:
        # dataset + loader are built only on a cache MISS: a hit must not
        # require (or download) the underlying image files at all
        if dataset_name == "fairface":
            from ..data.datasets import FairFace

            ds = FairFace(mode=mode, iat_type=attribute, _n_samples=n_samples,
                          equal_split=equal_split, data_path=data_path)
        elif dataset_name == "utkface":
            from ..data.datasets import UTKFace

            ds = UTKFace(mode=mode, iat_type=attribute, _n_samples=n_samples,
                         equal_split=equal_split, data_path=data_path)
        else:
            from ..data.video import VideoDataset

            ds = VideoDataset(data_path=data_path, iat_type=attribute,
                              _n_samples=n_samples, equal_split=equal_split,
                              num_frames=extra.get("num_frames", 4))

        # native C++ batch ingest (decode + PIL-bit-exact resize + crop on
        # the host thread pool) when the standard device path is in play —
        # makes the eval preprocess bit-exact vs the reference AND cheaper
        # on H2D; a user-supplied callable instead runs on the decode
        # threads so batches still stack at a fixed shape
        # int8/bf16 + plain ViT at its native resolution: stage batches in
        # the patch-contiguous uint8 layout so the stem runs as one
        # relayout-free matmul with the normalize folded into the weights —
        # exact int8 on the quantized path (ops/quant.py::patch_embed_q_p8,
        # measured +2.5% e2e), folded bf16 on the float path
        # (models/clip.py::encode_image_vit_p8; u8 is exact in bf16, so
        # accuracy is not worse than preprocess+conv at the same dtype).
        # float32 keeps the preprocess+conv stem: reference-parity mode.
        patch_staging = None
        if (rung in ("int8", "int8-text", "bfloat16")
                and host_transform is None
                and dataset_name != "video"):
            vis = _vision_cfg_of(cliplike)
            if (vis is not None and vis.kind in ("vit", "slip_vit")
                    and n_px == vis.image_size
                    and n_px % vis.patch_size == 0):
                patch_staging = vis.patch_size
        loader = HostLoader(ds, batch_size=cfg.batch_size,
                            num_workers=cfg.num_workers,
                            native_n_px=n_px if host_transform is None else None,
                            native_patch=patch_staging,
                            host_transform=host_transform)
        labels, img_embs = get_labels_img_embeddings(
            loader, cliplike, n_px=n_px, mesh=mesh, progress=cfg.progress,
            dtype=cfg.dtype)
        if cache_path:
            # np.savez(path) appends ".npz" to extension-less paths, which
            # would break the os.path.exists check above — write through a
            # file object so the cache lands at the exact path given; stage
            # to .part + os.replace so an interrupted run can't leave a
            # truncated file that the exists() check would then trust
            tmp = cache_path + ".part"
            with open(tmp, "wb") as f:
                np.savez(f, labels=labels,
                         embeddings=np.asarray(img_embs), cache_key=cache_key)
            os.replace(tmp, cache_path)

    # custom prompt battery via opts["prompts"] (default: the reference's
    # 319 generated prompts).  The reference hardcodes gen_prompts()
    # (measuring_bias.py:144); a live opts key lets callers measure bias
    # over their own sensitive set — e.g. the trainer-efficacy world's
    # adjective prompts — through this exact entry point.
    prompts = extra.get("prompts")
    if prompts is None:  # empty batteries were rejected up front; only
        prompts = gen_prompts()  # None/absent means the default battery
    prompt_embs = get_prompt_embeddings(cliplike, tokenizer, prompts)

    if extra.get("sharded_metrics") and mesh is not None:
        # keep embeddings sharded end-to-end: per-shard top-k + ICI merge
        from ..metrics.distributed import sharded_eval_ranking

        # ragged N is padded (not dropped) inside sharded_ranking_metrics:
        # results are exactly the single-device engine's
        return {
            evaluation: sharded_eval_ranking(
                labels, img_embs, prompt_embs, evaluation,
                topn=cfg.topn, mesh=mesh)
            for evaluation in cfg.evaluations
        }

    return {
        evaluation: eval_ranking(labels, img_embs, prompt_embs, evaluation,
                                 topn=cfg.topn, engine=cfg.engine)
        for evaluation in cfg.evaluations
    }
