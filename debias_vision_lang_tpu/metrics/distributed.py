"""Distributed embed-then-rank: per-shard top-k with an ICI all-gather merge.

The single-device metric path replicates the image-embedding matrix; at
FairFace scale that is fine, but the TPU-native design (SURVEY.md §5:
"psum-based global top-k merge for ranking metrics across shards") keeps
image embeddings SHARDED over the data mesh axis end-to-end:

  per chip:  scores_local = prompts @ img_shard.T          (local MXU matmul)
             (vals, idx)  = top_k(scores_local, k_local)   (local ranking)
  ICI:       all_gather of the k_local candidate (value, label) pairs
             psum of local label counts → global desired distributions
  per chip:  top_k over the C·k_local merged candidates → exact global top-k
             prefix-KL / skew on the merged label lists

The merge is exact because the global top-k is contained in the union of the
per-shard top-k's.  Everything runs inside one ``shard_map`` — XLA lays the
collectives on ICI; no host gathering of embeddings.
"""

from __future__ import annotations

import functools
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .oracle import resolve_topn
from .ranking import (canonicalize_zeros, desired_from_counts,
                      metrics_from_top_labels)


@functools.lru_cache(maxsize=64)
def _sharded_metrics_fn(mesh, axis: str, top_n: int, n_classes: int,
                        n_real: int, k_local: int):
    """Build (and cache) the jitted shard_map kernel.

    lru_cache keyed on (mesh, shapes, budgets): without it every
    sharded_ranking_metrics call — e.g. the two evaluations of one
    measure_bias(sharded_metrics=True) run — re-traced and re-compiled the
    whole merge kernel (jax.jit caches by function identity, so a fresh
    closure per call defeats it).  Mesh is hashable by devices+axis names.

    ``n_real``: number of REAL (non-pad) rows globally — pad rows (ragged-N
    padding to a multiple of the axis size) carry score −inf and are
    excluded from both the desired-distribution counts and the kept list.
    ``k_local``: per-shard candidate budget (tie-extended); the host wrapper
    escalates to n_local when the returned overflow flag is set.
    """
    n_shards = mesh.shape[axis]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(None, None)),
        out_specs=(P(), P()),
        # outputs ARE replicated (they only depend on all_gather/psum
        # results); the varying-mesh-axes inference can't prove it
        check_vma=False,
    )
    def fn(img_shard: jax.Array, labels_shard: jax.Array,
           valid_shard: jax.Array, prompts: jax.Array):
        n_local = img_shard.shape[0]
        k = min(k_local, n_local)
        scores = canonicalize_zeros(prompts @ img_shard.T)  # [Pn, N_local]
        scores = jnp.where(valid_shard[None, :], scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k)  # [Pn, k]
        cand_labels = labels_shard[idx]

        # global label counts for the desired distributions (real rows only)
        local_counts = jnp.sum(
            jax.nn.one_hot(labels_shard, n_classes, dtype=jnp.float32)
            * valid_shard[:, None], axis=0)
        counts = jax.lax.psum(local_counts, axis)
        desired = desired_from_counts(counts, jnp.sum(counts), n_classes)

        # merge candidates across shards (contains the exact global kept
        # list: every kept entry beats each shard's k-th candidate or the
        # shard overflow flag fires)
        vals_all = jax.lax.all_gather(vals, axis)  # [C, Pn, k]
        labels_all = jax.lax.all_gather(cand_labels, axis)
        p_n = vals.shape[0]
        vals_m = vals_all.transpose(1, 0, 2).reshape(p_n, n_shards * k)
        labels_m = labels_all.transpose(1, 0, 2).reshape(p_n, n_shards * k)
        m_total = n_shards * k
        top_vals, top_pos = jax.lax.top_k(vals_m, m_total)  # full merged sort
        top_labels = jnp.take_along_axis(labels_m, top_pos, axis=1)

        # boundary-tie-extended kept mask (nlargest keep="all")
        kt = min(top_n, n_real)
        threshold = top_vals[:, kt - 1]  # [Pn]
        kept = top_vals >= threshold[:, None]
        # a shard whose LAST candidate still clears the threshold may hold
        # more tied rows beyond its budget → escalate
        if k < n_local:
            shard_last = vals_all[:, :, -1]  # [C, Pn]
            overflow = jnp.any(shard_last >= threshold[None, :])
        else:
            overflow = jnp.asarray(False)

        metrics = metrics_from_top_labels(top_labels, desired, n_classes,
                                          norm_top_n=top_n, kept_mask=kept)
        # identical on every shard: outputs are replicated
        return {k_: v for k_, v in metrics.items()}, overflow

    return jax.jit(fn)


def sharded_ranking_metrics(
    image_embeddings: jax.Array,
    labels: jax.Array,
    prompt_embeddings: jax.Array,
    top_n: int,
    n_classes: int,
    mesh,
    axis: str = "data",
) -> Dict[str, jax.Array]:
    """Exact global MaxSkew/NDKL with image embeddings sharded over ``axis``.

    Ragged N is handled exactly: when N is not divisible by the axis size,
    the embedding/label arrays are padded to the next multiple with rows
    that score −inf (excluded from the desired distributions and the kept
    list) — results are identical to the single-device engine.

    Boundary ties follow pandas ``nlargest(keep="all")``: the kernel keeps
    a tie-extended candidate budget per shard and reports overflow; this
    wrapper escalates the budget to the full shard (always exact) when ties
    exceed it.
    """
    from .ranking import TIE_PAD

    n = int(image_embeddings.shape[0])
    n_shards = mesh.shape[axis]
    img = jnp.asarray(image_embeddings, jnp.float32)
    lbl = jnp.asarray(np.asarray(labels), jnp.int32)
    valid = np.ones(n, bool)
    if n % n_shards != 0:
        pad = n_shards - n % n_shards
        img = jnp.concatenate([img, jnp.zeros((pad, img.shape[1]), img.dtype)])
        lbl = jnp.concatenate([lbl, jnp.zeros((pad,), lbl.dtype)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])

    img = jax.device_put(img, NamedSharding(mesh, P(axis, None)))
    lbl = jax.device_put(lbl, NamedSharding(mesh, P(axis)))
    vld = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P(axis)))
    prm = jax.device_put(jnp.asarray(prompt_embeddings, jnp.float32),
                         NamedSharding(mesh, P(None, None)))

    n_local = img.shape[0] // n_shards
    kt = min(top_n, n)
    k_local = min(kt + TIE_PAD, n_local)
    fn = _sharded_metrics_fn(mesh, axis, top_n, n_classes, n, k_local)
    metrics, overflow = fn(img, lbl, vld, prm)
    if k_local < n_local and bool(overflow):
        fn = _sharded_metrics_fn(mesh, axis, top_n, n_classes, n, n_local)
        metrics, _ = fn(img, lbl, vld, prm)
    return metrics


def sharded_eval_ranking(
    labels,
    image_embeddings,
    prompt_embeddings,
    evaluation: str = "maxskew",
    topn: Union[int, float] = 1.0,
    mesh=None,
    axis: str = "data",
) -> Dict[str, float]:
    """Drop-in sharded analogue of eval_ranking (same output dict)."""
    assert evaluation in ("maxskew", "ndkl")
    if mesh is None:
        from ..parallel.mesh import default_mesh

        mesh = default_mesh()
    from .oracle import validate_dense_labels

    # shape only — np.asarray here would all-gather a device-sharded matrix
    # to the host (and fail on multi-host non-addressable arrays)
    n = image_embeddings.shape[0]
    top_n = resolve_topn(topn, n)
    n_classes = validate_dense_labels(labels)
    metrics = sharded_ranking_metrics(
        jnp.asarray(image_embeddings), labels, jnp.asarray(prompt_embeddings),
        top_n, n_classes, mesh, axis)
    prefix = evaluation + "_"
    return {k[len(prefix):]: float(jnp.mean(v))
            for k, v in metrics.items() if k.startswith(prefix)}
