"""End-to-end training orchestration: data → alternating steps → periodic
bias eval → best-NDKL selection → checkpoints + reference-format export.

Protocol (reconstructed, SURVEY.md §3.5): batch A = FairFace train images
with protected-attribute labels vs the sensitive prompt set; batch B =
image–caption pairs (flickr30k in the paper, README.md:155) for the
contrastive term; ≤5 epochs with best-NDKL selection at eval points
(the shipped checkpoint: epoch 4, step 5334 — reference: model/clip.py:16).

When no caption corpus is available, batch B falls back to FairFace images
with captions synthesized from their label rows ("a photo of a {age} year
old {race} {gender}") — a documented stand-in that preserves image–text
alignment pressure without an external dataset.

Frozen-image configs (the reference protocol) train through the
frozen-embedding cache by default: both image streams embed exactly once
and epochs gather precomputed rows (TrainConfig.cache_frozen_embeddings;
bit-identical trajectories, ~15× steady-step speedup on TPU — PERF.md
"Device end-to-end training").
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np

from ..core.config import DebiasConfig, TrainConfig
from ..models.adversary import Adversary
from ..models.debias import DebiasCLIP, init_debias_tokens
from ..utils.observability import MetricsLogger
from .adversarial import AdversarialTrainer
from .state import export_reference_pt, save_checkpoint


def _fairface_caption(row) -> str:
    return f"a photo of a {row['age']} year old {row['race'].replace('_', ' ').lower()} {row['gender'].lower()}"


def _check_caption_corpus(n: int, batch_size: int, message: str):
    if n < batch_size:
        # drop-remainder batching would yield NOTHING and the infinite
        # stream would busy-loop forever — fail loudly instead
        raise ValueError(message)


def _caption_index_stream(batch_size, rng, pairs_ds=None, n: int = 0):
    """Infinite stream of caption-batch row indices — the SINGLE source of
    the contrastive stream's order for both the decode path
    (_caption_batches) and the frozen-embedding cache, so the two cannot
    drift apart.  One rng draw per corpus pass in either style."""
    if pairs_ds is not None:
        while True:  # one rng shuffle per pass (ImageCaptionPairs order)
            yield from pairs_ds.index_batches(batch_size, rng)
    else:
        while True:
            idx = rng.permutation(n)
            for s in range(0, n - batch_size + 1, batch_size):
                yield idx[s : s + batch_size]


def _caption_fallback_batch(fairface, sel, preprocess_px):
    """Decode one FairFace caption-fallback batch at the model resolution:
    threaded native ingest with per-row PIL fallback for files the C++
    decoder rejects — the SAME recovery the attribute batch's loader
    applies (data/loader.py::_iter_native), keeping the two streams' (and
    the embedding cache's) pixels identical row-for-row."""
    from .. import native
    from ..vision.preprocess import resize_crop_u8, to_rgb_array

    paths = [fairface._img_fnames[int(i)] for i in sel]
    if native.available():
        images, ok = native.ingest_batch_files_u8(paths, preprocess_px)
        if not ok.all():
            for j in np.nonzero(~ok)[0]:
                images[j] = resize_crop_u8(
                    to_rgb_array(fairface.load_image(int(sel[j]))),
                    preprocess_px)
        return images
    return np.stack([
        resize_crop_u8(fairface.load_image(int(i)), preprocess_px)
        for i in sel])


def _caption_batches(pairs_path, tokenizer, batch_size, fairface, preprocess_px,
                     rng):
    """Infinite iterator of (images_u8, tokens) contrastive batches."""
    if pairs_path is not None:
        from ..data.pairs import ImageCaptionPairs

        # host-resize caption images to the MODEL's resolution — a 288/336px
        # arch fed 224px captions would upscale on device and degrade the
        # contrastive batch relative to the native-n_px attribute batch
        ds = ImageCaptionPairs(pairs_path, image_size=preprocess_px)
        _check_caption_corpus(
            len(ds), batch_size,
            f"caption corpus at {pairs_path} has {len(ds)} pairs, fewer "
            f"than batch_size={batch_size}; shrink the batch or grow "
            "the corpus")
        for idx in _caption_index_stream(batch_size, rng, pairs_ds=ds):
            yield ds.load_batch(idx, tokenizer)
    else:
        n = len(fairface)
        _check_caption_corpus(
            n, batch_size,
            f"FairFace caption fallback has {n} rows, fewer than "
            f"batch_size={batch_size}; shrink the batch")
        for sel in _caption_index_stream(batch_size, rng, n=n):
            images = _caption_fallback_batch(fairface, sel, preprocess_px)
            caps = [
                _fairface_caption(fairface.labels.iloc[int(i)]) for i in sel
            ]
            yield images, np.asarray(tokenizer(caps), np.int32)


def run_training(
    arch: str = "openai/CLIP/ViT-B/16",
    attribute: str = "gender",
    num_debias_tokens: int = 2,
    debias_pos: str = "prepend",
    debias_token_init="zeros",
    epochs: Optional[int] = None,
    batch_size: Optional[int] = None,
    pairs_path: Optional[str] = None,
    data_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    eval_every: Optional[int] = None,
    eval_n_samples: Optional[int] = 2000,
    pretrained: bool = True,
    tokenizer=None,
    model=None,
    sensitive_prompts=None,
    adversary_hidden: int = 32,
    train_cfg: Optional[TrainConfig] = None,
    seed: int = 0,
    log_dir: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    progress: bool = True,
    resume: bool = False,
    mesh=None,
    embed_dtype: str = "float32",
    train_dtype: str = "float32",
    approx_frozen_scores: bool = False,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: Optional[int] = None,
    grad_clip_norm: Optional[float] = None,
    cache_frozen_embeddings: bool = True,
    embedding_cache_dir: Optional[str] = None,
) -> Dict:
    """Train the prompt array adversarially; returns a summary dict."""
    import jax

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..data.datasets import FairFace
    from ..data.loader import HostLoader
    from ..eval.measure import eval_ranking, gen_prompts, get_labels_img_embeddings, get_prompt_embeddings
    from ..models.loader import model_loader
    from ..vision.preprocess import preprocess_batch

    # caption-batch stream seeded independently of HostLoader's shuffle rng:
    # both draw permutation(len(train_ds)) per epoch, so sharing the seed
    # would keep them in lockstep and batch B would equal batch A every step
    rng = np.random.default_rng([seed, 1])

    if model is None:
        base, preprocess, tok, alias = model_loader(arch, pretrained=pretrained,
                                                    seed=seed)
        tokenizer = tokenizer or tok
        if tokenizer is None:
            raise RuntimeError("a tokenizer is required (BPE vocab missing?)")
        dcfg = DebiasConfig(
            num_debias_tokens=num_debias_tokens,
            hidden_dim=base.cfg.text.width,
            max_tokens=base.cfg.text.context_length,
            debias_pos=debias_pos,
            debias_token_init=debias_token_init,
        )
        deb = init_debias_tokens(jax.random.key(seed + 1), base.params, dcfg,
                                 tokenizer)
        model = DebiasCLIP(clip_params=base.params, debias_tokens=deb,
                           clip_cfg=base.cfg, debias_cfg=dcfg)
    else:
        # sanitized (the raw cfg name contains '/' — e.g. "ViT-B/16" — which
        # would split the export filename into a nonexistent directory)
        from ..core.registry import alias_name

        alias = alias_name(model.clip_cfg.name)
    if tokenizer is None:
        raise RuntimeError("a tokenizer is required")

    n_px = model.clip_cfg.vision.image_size

    # sensitive prompt set: the full evaluation prompt battery (319),
    # matching the adversary's default input width (ADV_N_INPUT)
    prompts = sensitive_prompts if sensitive_prompts is not None else gen_prompts()
    sens_tokens = np.asarray(tokenizer(prompts), np.int32)

    train_ds = FairFace(mode="train", iat_type=attribute, data_path=data_path)
    # adversary head matches the attribute: binary (sigmoid, the reference's
    # ADV_N_OUTPUT=1 gender setup) or one logit per class (softmax CE)
    n_output = 1 if train_ds.n_iat_classes == 2 else train_ds.n_iat_classes
    adversary = Adversary.from_cfg({
        "ADV_N_INPUT": len(prompts), "ADV_N_OUTPUT": n_output,
        "ADV_HIDDEN_SIZE": adversary_hidden, "SEED": seed,
    })

    if train_cfg is not None:
        tcfg = train_cfg
        # explicit non-default dtype kwargs win over a provided config —
        # otherwise `run_training(train_cfg=..., embed_dtype="bfloat16")`
        # would silently train fp32
        overrides = {}
        if embed_dtype != "float32":
            overrides["embed_dtype"] = embed_dtype
        if train_dtype != "float32":
            overrides["train_dtype"] = train_dtype
        if approx_frozen_scores:
            overrides["approx_frozen_scores"] = True
        if lr_schedule != "constant":
            overrides["lr_schedule"] = lr_schedule
        if warmup_steps:
            overrides["warmup_steps"] = warmup_steps
        if decay_steps is not None:
            overrides["decay_steps"] = decay_steps
        if grad_clip_norm is not None:
            overrides["grad_clip_norm"] = grad_clip_norm
        if not cache_frozen_embeddings:
            overrides["cache_frozen_embeddings"] = False
        if embedding_cache_dir is not None:
            overrides["embedding_cache_dir"] = embedding_cache_dir
        if overrides:
            tcfg = dataclasses.replace(tcfg, **overrides)
    else:
        tcfg = TrainConfig(batch_size=batch_size or 64,
                           num_epochs=epochs or 5,
                           eval_every_steps=eval_every or 500,
                           checkpoint_dir=checkpoint_dir, seed=seed,
                           embed_dtype=embed_dtype,
                           train_dtype=train_dtype,
                           approx_frozen_scores=approx_frozen_scores,
                           lr_schedule=lr_schedule,
                           warmup_steps=warmup_steps,
                           decay_steps=decay_steps,
                           grad_clip_norm=grad_clip_norm,
                           cache_frozen_embeddings=cache_frozen_embeddings,
                           embedding_cache_dir=embedding_cache_dir)
    # the loop below drives off the LOCALS — resolve them from the config so
    # a provided train_cfg's num_epochs/batch_size/eval_every_steps are
    # honored instead of silently losing to the kwarg defaults (explicit
    # kwargs still win, mirroring the dtype-override rule above)
    epochs = epochs if epochs is not None else tcfg.num_epochs
    batch_size = batch_size if batch_size is not None else tcfg.batch_size
    eval_every = eval_every if eval_every is not None else tcfg.eval_every_steps
    checkpoint_dir = checkpoint_dir or tcfg.checkpoint_dir or "checkpoints"
    if tcfg.lr_schedule != "constant" and not tcfg.decay_steps:
        # derive the cosine horizon the trainer can't know: total update
        # steps = epochs × batches per epoch (drop_remainder loader below)
        # NB: the resolved locals — they are what actually drive the loop
        # and loader below
        steps_per_epoch = max(1, len(train_ds) // batch_size)
        tcfg = dataclasses.replace(
            tcfg, decay_steps=max(tcfg.warmup_steps + 1,
                                  epochs * steps_per_epoch))
    if mesh == "auto":
        from ..parallel.mesh import default_mesh

        mesh = default_mesh()
    trainer = AdversarialTrainer.create(model, adversary, tcfg, sens_tokens,
                                        use_pallas=use_pallas, mesh=mesh)
    steps_per_epoch = max(1, len(train_ds) // batch_size)
    total_steps = epochs * steps_per_epoch
    start_epoch = 0
    if resume:
        from .state import latest_checkpoint, restore_checkpoint

        ckpt = latest_checkpoint(checkpoint_dir)
        if ckpt is not None:
            restore_checkpoint(ckpt, trainer)
            # continue the configured recipe, don't extend it: epochs already
            # completed (by restored step count) are skipped, and the
            # total_steps cap below stops the run at epochs×steps_per_epoch
            # even when the checkpoint landed mid-epoch (a mid-epoch resume
            # re-runs that epoch's early batches under a fresh shuffle, but
            # never trains MORE steps than the recipe configured)
            start_epoch = min(epochs, trainer.step_count // steps_per_epoch)

    val_ds = FairFace(mode="val", iat_type=attribute, data_path=data_path,
                      _n_samples=eval_n_samples)
    loader = HostLoader(train_ds, batch_size=batch_size, drop_remainder=True,
                        shuffle=True, seed=seed, native_n_px=n_px)
    logger = MetricsLogger(log_dir or os.path.join(checkpoint_dir, "logs"))

    import jax.numpy as jnp

    _stats = {"mean": model.clip_cfg.vision.image_mean,
              "std": model.clip_cfg.vision.image_std}

    @jax.jit
    def prep(images_u8):
        return preprocess_batch(images_u8, n_px, **_stats)

    # Frozen-tower embedding cache (TrainConfig.cache_frozen_embeddings):
    # with a frozen image path, every epoch re-decodes and re-embeds the
    # SAME rows — instead, embed the train rows and the caption corpus ONCE
    # (same jitted embed program, same per-row outputs) and train epochs
    # from gathered embedding rows via trainer.step_from_embeddings.  Batch
    # sequences are identical to the decode path by construction: both
    # consume the same index sources (HostLoader._epoch_plan,
    # _caption_index_stream).  The step_count guard keeps a resumed-and-
    # already-complete recipe lazy like the decode path — no point paying
    # the full precompute pass to then train zero steps.
    cache_embs = (bool(getattr(tcfg, "cache_frozen_embeddings", True))
                  and not trainer.trains_image
                  and trainer.step_count < total_steps)

    def _embed_rows(images_u8) -> np.ndarray:
        e = trainer.fns.embed_images(
            trainer.model.clip_params,
            trainer._shard(prep(jnp.asarray(images_u8))))
        return np.asarray(e, np.float32)

    disk_state = None  # {"train": hit|miss, "captions": hit|miss|train-rows}
    if cache_embs:
        # Optional DISK persistence across run_training calls (sweep
        # workflow — train/embcache.py documents the key/safety model):
        # content-fingerprinted, so a different checkpoint, dataset, or
        # embed dtype misses instead of silently reusing wrong rows.
        disk_dir = getattr(tcfg, "embedding_cache_dir", None)
        base_key = train_key = train_path = None
        if disk_dir:
            from . import embcache as _ec

            disk_state = {"train": "miss", "captions": "miss"}
            base_key = {
                "v": 1, "arch": model.clip_cfg.name, "n_px": n_px,
                "embed_dtype": tcfg.embed_dtype,
                "params": _ec.params_fingerprint(trainer.model.clip_params),
            }
            train_key = {**base_key,
                         "rows": _ec.dataset_fingerprint(train_ds)}
            train_path = _ec.cache_path(disk_dir, "train_rows", train_key)
            hit = _ec.cache_load(train_path, train_key)
            if hit is not None and len(hit["embeddings"]) == len(train_ds):
                train_embs = hit["embeddings"]
                disk_state["train"] = "hit"

        if disk_state is None or disk_state["train"] != "hit":
            # attribute rows in dataset order (fresh unshuffled loader — the
            # training loader's rng must only advance once per training
            # epoch)
            src = HostLoader(train_ds, batch_size=batch_size,
                             drop_remainder=False, shuffle=False,
                             native_n_px=n_px)
            if progress:
                import tqdm

                src = tqdm.tqdm(src, desc="embed cache: train rows")
            rows, seen = [], 0
            for b in src:
                rows.append(_embed_rows(b.images)[: b.num_valid])
                seen += b.num_valid
            train_embs = np.concatenate(rows, axis=0)
            assert seen == len(train_ds)
            if disk_dir:
                _ec.cache_store(train_path, train_key, embeddings=train_embs)

        if pairs_path is not None:
            from ..data.pairs import ImageCaptionPairs

            cap_ds = ImageCaptionPairs(pairs_path, image_size=n_px)
            _check_caption_corpus(
                len(cap_ds), batch_size,
                f"caption corpus at {pairs_path} has {len(cap_ds)} "
                f"pairs, fewer than batch_size={batch_size}; shrink "
                "the batch or grow the corpus")
            cap_key = cap_path = None
            cap_embs_all = None
            if disk_dir:
                cap_key = {**base_key,
                           "captions_csv": _ec.file_sha256(
                               os.path.join(pairs_path, "captions.csv"))}
                cap_path = _ec.cache_path(disk_dir, "caption_rows", cap_key)
                hit = _ec.cache_load(cap_path, cap_key)
                if hit is not None and len(hit["embeddings"]) == len(cap_ds):
                    cap_embs_all = hit["embeddings"]
                    disk_state["captions"] = "hit"
            if cap_embs_all is None:
                emb_rows = []
                starts = range(0, len(cap_ds), batch_size)
                if progress:
                    import tqdm

                    starts = tqdm.tqdm(starts,
                                       desc="embed cache: caption rows")
                for s in starts:
                    idx = np.arange(s, min(s + batch_size, len(cap_ds)))
                    images, _ = cap_ds.load_batch(idx, tokenizer)
                    if len(idx) < batch_size:  # pad: keep one compiled shape
                        pad = batch_size - len(idx)
                        images = np.concatenate(
                            [images, np.zeros((pad,) + images.shape[1:],
                                              images.dtype)])
                    emb_rows.append(_embed_rows(images)[: len(idx)])
                cap_embs_all = np.concatenate(emb_rows, axis=0)
                if disk_dir:
                    _ec.cache_store(cap_path, cap_key,
                                    embeddings=cap_embs_all)
            # tokens are NOT persisted: the tokenizer is an opaque callable
            # (no fingerprint), and tokenizing the corpus is cheap — one
            # whole-corpus call produces exactly the per-batch rows the
            # decode path would (row-wise op)
            cap_tokens_all = np.asarray(
                tokenizer([cap_ds.caption(i) for i in range(len(cap_ds))]),
                np.int32)
            caption_idx_iter = _caption_index_stream(batch_size, rng,
                                                     pairs_ds=cap_ds)
        else:
            # FairFace caption fallback: same images as the attribute rows
            # (HostLoader and _caption_fallback_batch decode identically,
            # per-row PIL recovery included) — reuse their embeddings;
            # only the synthesized captions are new
            _check_caption_corpus(
                len(train_ds), batch_size,
                f"FairFace caption fallback has {len(train_ds)} rows, "
                f"fewer than batch_size={batch_size}; shrink the batch")
            cap_embs_all = train_embs
            if disk_state is not None:  # no second disk file: rows shared
                disk_state["captions"] = "train-rows"
            cap_tokens_all = np.asarray(
                tokenizer([_fairface_caption(train_ds.labels.iloc[i])
                           for i in range(len(train_ds))]), np.int32)
            caption_idx_iter = _caption_index_stream(batch_size, rng,
                                                     n=len(train_ds))
    else:
        caption_iter = _caption_batches(pairs_path, tokenizer, batch_size,
                                        train_ds, n_px, rng)

    _eval_cache: dict = {}

    def evaluate_ndkl() -> float:
        # frozen-image configs: the val-set image embeddings cannot change
        # between evals (only the prompt array does) — decode+embed once
        # and reuse; layer-training configs re-embed every eval
        if trainer.trains_image or "img" not in _eval_cache:
            val_loader = HostLoader(val_ds, batch_size=256, num_workers=6,
                                    native_n_px=n_px)
            labels, img_embs = get_labels_img_embeddings(val_loader, model,
                                                         n_px=n_px)
            if not trainer.trains_image:
                _eval_cache["img"] = (labels, img_embs)
        else:
            labels, img_embs = _eval_cache["img"]
        prompt_embs = get_prompt_embeddings(model, tokenizer, prompts)
        out = eval_ranking(labels, img_embs, prompt_embs, "ndkl", topn=1.0)
        return float(out["eq_opp"])

    for epoch in range(start_epoch, epochs):
        it = loader.iter_index_batches() if cache_embs else loader
        if progress:
            import tqdm

            it = tqdm.tqdm(it, total=len(loader), desc=f"epoch {epoch}")
        for batch in it:
            if trainer.step_count >= total_steps:
                break  # recipe complete (mid-epoch resume re-entry)
            if cache_embs:
                # batch.images holds ROW INDICES (iter_index_batches) —
                # gather the precomputed embedding rows, no decode/embed
                cap_idx = next(caption_idx_iter)
                metrics = trainer.step_from_embeddings(
                    train_embs[batch.images],
                    batch.labels.astype(np.float32),
                    cap_embs_all[cap_idx],
                    cap_tokens_all[cap_idx],
                )
            else:
                cap_images, cap_tokens = next(caption_iter)
                metrics = trainer.step(
                    prep(jnp.asarray(batch.images)),
                    batch.labels.astype(np.float32),
                    prep(jnp.asarray(cap_images)),
                    cap_tokens,
                )
            logger.log(metrics, step=trainer.step_count)
            if eval_every and trainer.step_count % eval_every == 0:
                ndkl = evaluate_ndkl()
                is_best = trainer.maybe_update_best(ndkl)
                logger.log({"ndkl_eq_opp": ndkl, "is_best": is_best},
                           step=trainer.step_count)
                save_checkpoint(checkpoint_dir, trainer)

    final_ndkl = evaluate_ndkl()
    trainer.maybe_update_best(final_ndkl)
    save_checkpoint(checkpoint_dir, trainer)
    pt_path = export_reference_pt(
        trainer, os.path.join(checkpoint_dir,
                              f"best_ndkl_{alias}_embeddings.pt"))
    logger.close()
    return {
        "best_ndkl": trainer.best_ndkl,
        "final_ndkl": final_ndkl,
        "steps": trainer.step_count,
        "export": pt_path,
        "checkpoint_dir": checkpoint_dir,
        # True when the frozen-tower embedding cache carried the epochs
        # (TrainConfig.cache_frozen_embeddings ∧ frozen image path)
        "embed_cache": cache_embs,
        # per-corpus hit/miss when TrainConfig.embedding_cache_dir persisted
        # the rows to disk (None: disk persistence off or cache inactive)
        "embed_cache_disk": disk_state,
    }
