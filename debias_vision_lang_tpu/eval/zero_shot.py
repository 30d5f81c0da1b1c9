"""Zero-shot classification harness.

The reference's headline table reports ImageNet zero-shot accuracy (68.1%
CLIP / 67.6% DebiasCLIP — reference: README.md:32-36) but ships no harness
for it.  This one is dataset-agnostic: class names + prompt templates →
zero-shot classifier weights (mean of the normalized per-template text
embeddings, the standard CLIP recipe), then batched image classification
with top-k accuracy, sharded over the data mesh like the bias pipeline.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# The short standard template set; use `imagenet_templates()` (the full
# 80-template OpenAI protocol list, shipped at
# assets/zero_shot_templates_imagenet.txt) for exact paper-protocol
# replication of the README's 68.1% table.
DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a photo of the large {}.",
    "a photo of the small {}.",
    "itap of a {}.",
    "a {} in a video game.",
)


def imagenet_templates() -> tuple:
    """The 80 OpenAI CLIP ImageNet prompt templates (public protocol data,
    from CLIP's Prompt_Engineering notebook), shipped as a packaged asset.
    Class names are dataset-derived (folder names) or caller-provided; the
    canonical OpenAI-cleaned 1,000-name list is fetched alongside the other
    network-gated assets."""
    from ..core.paths import resolve_asset

    path = resolve_asset("zero_shot_templates_imagenet.txt")
    with open(path) as f:
        templates = tuple(line.strip() for line in f if line.strip())
    assert len(templates) == 80, f"expected 80 templates, got {len(templates)}"
    return templates


def build_zero_shot_classifier(
    model,
    tokenizer: Callable,
    class_names: Sequence[str],
    templates: Sequence[str] = DEFAULT_TEMPLATES,
    batch_size: int = 256,
) -> jax.Array:
    """Returns [n_classes, embed_dim] L2-normalized classifier weights.

    Classes are encoded ``batch_size // len(templates)`` at a time in one
    fused text-tower call (1,000 ImageNet classes × 80 templates would
    otherwise be 1,000 sequential [80, 77] device calls)."""
    import functools

    n_templates = len(templates)
    per_call = max(1, batch_size // n_templates)

    @functools.partial(jax.jit, static_argnames=("k",))
    def class_weights(m, tokens, k):
        emb = m.encode_text(tokens).astype(jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.reshape(k, n_templates, -1).mean(axis=1)
        return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)

    weights = []
    for s in range(0, len(class_names), per_call):
        group = class_names[s : s + per_call]
        prompts = [t.format(cls) for cls in group for t in templates]
        tokens = jnp.asarray(np.asarray(tokenizer(prompts)), jnp.int32)
        weights.append(class_weights(model, tokens, len(group)))
    return jnp.concatenate(weights)


def classify(
    image_embeddings: jax.Array, classifier: jax.Array, top_k: int = 5
) -> jax.Array:
    """[N, D] embeddings × [C, D] classifier → [N, top_k] predicted classes."""
    img = image_embeddings / jnp.linalg.norm(image_embeddings, axis=-1, keepdims=True)
    logits = img @ classifier.T
    return jax.lax.top_k(logits, min(top_k, classifier.shape[0]))[1]


def zero_shot_accuracy(
    model,
    tokenizer: Callable,
    loader,
    class_names: Sequence[str],
    templates: Sequence[str] = DEFAULT_TEMPLATES,
    n_px: int = 224,
    mesh=None,
    progress: bool = False,
    dtype: Optional[str] = None,
) -> Dict[str, float]:
    """Top-1/top-5 zero-shot accuracy over a HostLoader of labeled images.

    ``dtype``: "float32" | "bfloat16" | "int8" (quantized vision tower —
    the classifier builds at full precision) | "int8-text" (the classifier
    text encodes also run the int8 text tower) | "auto" (fastest measured
    rung per model family — ops/quant.py::resolve_rung).  ``None`` (the
    default) runs float32 — reference parity — with a one-line hint at the
    ladder when that default picks itself on a TPU backend."""
    from ..vision.preprocess import preprocess_batch

    from ..ops.quant import hint_implicit_fp32, resolve_compute

    if dtype is None:
        dtype = "float32"
        hint_implicit_fp32("zero_shot_accuracy")

    # resolve the ladder FIRST so "int8-text" reaches the classifier build;
    # for plain "int8" the wrapped bundle delegates text to the fp base, so
    # the classifier still builds at full precision
    model, compute_dtype = resolve_compute(model, dtype)
    classifier = build_zero_shot_classifier(model, tokenizer, class_names, templates)

    if mesh == "auto":
        from ..parallel.mesh import default_mesh

        mesh = default_mesh()

    if mesh is not None:
        # DP over the data axis, same shard_map pattern as the bias embed
        # path (keeps fused pallas kernels per-chip); model+classifier ride
        # replicated as one pytree
        from ..parallel.mesh import dp_shard_map, shard_batch_arrays

        def _local(mc, images_u8):
            m, clf = mc
            from .measure import _vision_cfg_of

            vis = _vision_cfg_of(m)
            stats = ({} if vis is None else
                     {"mean": vis.image_mean, "std": vis.image_std})
            x = preprocess_batch(images_u8, n_px, **stats)
            emb = m.encode_image(x, dtype=compute_dtype).astype(jnp.float32)
            return classify(emb, clf, top_k=5)

        _sharded = dp_shard_map(mesh, _local)
        d_sz = int(mesh.shape["data"])

        def step(m, clf, images_u8):
            n_real = images_u8.shape[0]
            rem = n_real % d_sz
            if rem:  # pad to a data-axis multiple; pad rows sliced off below
                pad = np.zeros((d_sz - rem,) + images_u8.shape[1:],
                               images_u8.dtype)
                images_u8 = np.concatenate([np.asarray(images_u8), pad])
            return _sharded((m, clf), shard_batch_arrays(mesh, images_u8))[:n_real]
    else:
        @jax.jit
        def step(m, clf, images_u8):
            from .measure import _vision_cfg_of

            vis = _vision_cfg_of(m)
            stats = ({} if vis is None else
                     {"mean": vis.image_mean, "std": vis.image_std})
            x = preprocess_batch(images_u8, n_px, **stats)
            emb = m.encode_image(x, dtype=compute_dtype).astype(jnp.float32)
            return classify(emb, clf, top_k=5)

    it = loader
    if progress:
        import tqdm

        it = tqdm.tqdm(loader, desc="Zero-shot eval")
    correct1 = correct5 = total = 0
    for batch in it:
        preds = np.asarray(step(model, classifier, batch.images))[: batch.num_valid]
        labels = np.asarray(batch.labels)[: batch.num_valid]
        correct1 += int((preds[:, 0] == labels).sum())
        correct5 += int((preds == labels[:, None]).any(axis=1).sum())
        total += batch.num_valid
    if total == 0:
        raise ValueError(
            "zero_shot_accuracy: the loader yielded no images — empty "
            "dataset or data path with no image files?")
    return {"top1": correct1 / total, "top5": correct5 / total, "n": total}
