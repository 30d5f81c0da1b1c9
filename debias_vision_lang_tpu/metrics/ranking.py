"""Jitted, vectorized ranking-bias metrics (MaxSkew, NDKL) for TPU.

Replaces the reference's per-prompt pandas/python pipeline — a tqdm loop over
319 prompts, each building a DataFrame, calling ``nlargest`` and iterating
rows in Python (reference: debias_clip/measuring_bias.py:29-37,57,113-117) —
with one fused computation:

    scores   = image_embeddings @ prompt_embeddings.T      (one MXU matmul)
    top-k    = lax.top_k over the image axis, batched over prompts
    prefixes = one-hot label counts + cumsum (replaces the iterrows loop)
    NDKL     = discounted prefix-KL via precomputed 1/log2(i+1) weights
    MaxSkew  = log p_top − log p_desired at the top_n prefix

Everything is fixed-shape: top_n, n_classes are static arguments, so the
whole evaluation jit-compiles once per configuration and vmaps over prompts.

Tie policy (documented divergence): ``lax.top_k`` keeps exactly top_n items,
breaking ties by lowest index; the reference's ``nlargest(keep="all")``
*extends* the list through boundary ties (can exceed top_n — verified,
SURVEY.md §6).  For continuous cosine scores exact boundary ties have measure
zero; the numpy oracle (metrics/oracle.py) preserves the reference behavior
exactly, and tests pin both the agreement (no ties) and the divergence (ties).
"""

from __future__ import annotations

import functools
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from .oracle import resolve_topn


def _safe_log(x: jax.Array) -> jax.Array:
    """log with a zero-safe branch (no NaN forward, no NaN gradient —
    the reference's eager np.log(0) warning path, done right)."""
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), 0.0)


def desired_distributions(labels: jax.Array, n_classes: int) -> Dict[str, jax.Array]:
    """eq_opp = uniform; dem_par = empirical frequencies with zero-count
    clamping (reference: measuring_bias.py:26-27)."""
    counts = jnp.sum(jax.nn.one_hot(labels, n_classes, dtype=jnp.float32), axis=0)
    n = labels.shape[0]
    return {
        "eq_opp": jnp.full((n_classes,), 1.0 / n_classes, jnp.float32),
        "dem_par": jnp.maximum(counts, 1.0) / n,
    }


def metrics_from_top_labels(
    top_labels: jax.Array,
    desired: Dict[str, jax.Array],
    top_n: int,
    n_classes: int,
    norm_top_n: int = None,
) -> Dict[str, jax.Array]:
    """Metric core over already-ranked label lists.

    top_labels: [P, k] labels of the ranked list per prompt (descending
    score); desired: the two target distributions.  Shared by the
    single-device and the sharded (top-k-merge) paths.

    ``norm_top_n``: the REQUESTED top-n used in the normalizers — when the
    request exceeds the dataset size the reference still normalizes by the
    request (Z over 1..top_n at measuring_bias.py:39; p = count/top_n at :61)
    while ranking only the N available rows; ``top_labels`` then has k = N
    columns but Z and the skew denominators use ``norm_top_n``.
    """
    k = top_labels.shape[1]
    norm_top_n = norm_top_n if norm_top_n is not None else top_n
    onehot = jax.nn.one_hot(top_labels, n_classes, dtype=jnp.float32)  # [P, k, C]
    prefix_counts = jnp.cumsum(onehot, axis=1)  # [P, k, C]

    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)  # [k]
    prefix_p = prefix_counts / ranks[None, :, None]  # [P, k, C]

    # NDKL: Σ_i KL(prefix_i ‖ q) / log2(i+1), / Z(norm_top_n)
    log_p = _safe_log(prefix_p)
    discounts = 1.0 / jnp.log2(ranks + 1.0)  # [k]
    z = jnp.sum(1.0 / jnp.log2(jnp.arange(1, norm_top_n + 1, dtype=jnp.float32) + 1.0))
    out: Dict[str, jax.Array] = {}
    for name, q in desired.items():
        kl_terms = jnp.where(
            prefix_p > 0, prefix_p * (log_p - _safe_log(q)[None, None, :]), 0.0
        )
        kl_per_rank = jnp.sum(kl_terms, axis=-1)  # [P, k]
        out[f"ndkl_{name}"] = jnp.sum(kl_per_rank * discounts[None, :], axis=-1) / z

    # MaxSkew at the full kept prefix, normalized by the requested top-n
    p_top = prefix_counts[:, -1, :] / norm_top_n  # [P, C]
    p_top = jnp.where(p_top == 0, 1.0 / norm_top_n, p_top)  # zero clamp
    for name, q in desired.items():
        skew = jnp.log(p_top) - jnp.log(q)[None, :]  # [P, C]
        # reference max starts from 0 → never negative
        out[f"maxskew_{name}"] = jnp.maximum(jnp.max(skew, axis=-1), 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("top_n", "n_classes"))
def ranking_metrics(
    scores: jax.Array,
    labels: jax.Array,
    top_n: int,
    n_classes: int,
) -> Dict[str, jax.Array]:
    """All four sub-metrics for a batch of prompts at once.

    scores: [P, N] (P prompts × N images), labels: [N] int.
    Returns dict of [P] arrays: maxskew_eq_opp, maxskew_dem_par,
    ndkl_eq_opp, ndkl_dem_par.  ``top_n`` larger than N keeps all N rows but
    normalizes by the request (reference semantics — see metrics_from_top_labels).
    """
    desired = desired_distributions(labels, n_classes)
    k = min(top_n, scores.shape[1])
    _, top_idx = jax.lax.top_k(scores, k)  # [P, k]
    top_labels = labels[top_idx]  # [P, k]
    return metrics_from_top_labels(top_labels, desired, k, n_classes,
                                   norm_top_n=top_n)


def eval_ranking(
    labels,
    image_embeddings,
    prompt_embeddings,
    evaluation: str = "maxskew",
    topn: Union[int, float] = 1.0,
) -> Dict[str, float]:
    """Drop-in analogue of the reference ``eval_ranking``
    (measuring_bias.py:102-119): per-prompt metrics averaged over prompts.
    One matmul + one jitted metric kernel instead of a Python loop.
    """
    assert evaluation in ("maxskew", "ndkl")
    labels = jnp.asarray(np.asarray(labels), jnp.int32)
    img = jnp.asarray(image_embeddings, jnp.float32)
    prm = jnp.asarray(prompt_embeddings, jnp.float32)
    top_n = resolve_topn(topn, img.shape[0])
    n_classes = int(np.asarray(labels).max()) + 1
    scores = prm @ img.T  # [P, N]
    metrics = ranking_metrics(scores, labels, top_n, n_classes)
    prefix = evaluation + "_"
    return {
        k[len(prefix):]: float(jnp.mean(v))
        for k, v in metrics.items()
        if k.startswith(prefix)
    }
