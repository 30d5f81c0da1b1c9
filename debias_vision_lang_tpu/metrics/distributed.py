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
from .ranking import metrics_from_top_labels


def _sharded_metrics_fn(mesh, axis: str, top_n: int, n_classes: int):
    n_shards = mesh.shape[axis]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None)),
        out_specs=P(),
        # outputs ARE replicated (they only depend on all_gather/psum
        # results); the varying-mesh-axes inference can't prove it
        check_vma=False,
    )
    def fn(img_shard: jax.Array, labels_shard: jax.Array, prompts: jax.Array):
        n_local = img_shard.shape[0]
        k = min(top_n, n_local)
        scores = prompts @ img_shard.T  # [Pn, N_local]
        vals, idx = jax.lax.top_k(scores, k)  # [Pn, k]
        cand_labels = labels_shard[idx]

        # global label counts for the desired distributions
        local_counts = jnp.sum(
            jax.nn.one_hot(labels_shard, n_classes, dtype=jnp.float32), axis=0)
        counts = jax.lax.psum(local_counts, axis)
        n_total = jnp.sum(counts)
        desired = {
            "eq_opp": jnp.full((n_classes,), 1.0 / n_classes, jnp.float32),
            "dem_par": jnp.maximum(counts, 1.0) / n_total,
        }

        # merge candidates across shards (exact global top-k)
        vals_all = jax.lax.all_gather(vals, axis)  # [C, Pn, k]
        labels_all = jax.lax.all_gather(cand_labels, axis)
        p_n = vals.shape[0]
        vals_m = vals_all.transpose(1, 0, 2).reshape(p_n, n_shards * k)
        labels_m = labels_all.transpose(1, 0, 2).reshape(p_n, n_shards * k)
        k_global = min(top_n, n_shards * k)
        top_vals, top_pos = jax.lax.top_k(vals_m, k_global)
        top_labels = jnp.take_along_axis(labels_m, top_pos, axis=1)

        metrics = metrics_from_top_labels(top_labels, desired, k_global,
                                          n_classes, norm_top_n=top_n)
        # identical on every shard: outputs are replicated
        return {k_: v for k_, v in metrics.items()}

    return fn


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

    Constraint: the per-shard candidate count min(top_n, N_local) must reach
    the global top-k — guaranteed because the union of shard top-k's always
    contains the global top-k when each shard keeps min(top_n, N_local).
    N must be divisible by the axis size (pad embeddings with -inf-scoring
    rows upstream if needed).
    """
    n = image_embeddings.shape[0]
    n_shards = mesh.shape[axis]
    if n % n_shards != 0:
        raise ValueError(f"N={n} not divisible by mesh axis {axis}={n_shards}")

    img = jax.device_put(jnp.asarray(image_embeddings, jnp.float32),
                         NamedSharding(mesh, P(axis, None)))
    lbl = jax.device_put(jnp.asarray(np.asarray(labels), jnp.int32),
                         NamedSharding(mesh, P(axis)))
    prm = jax.device_put(jnp.asarray(prompt_embeddings, jnp.float32),
                         NamedSharding(mesh, P(None, None)))
    fn = _sharded_metrics_fn(mesh, axis, top_n, n_classes)
    return fn(img, lbl, prm)


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
    n = np.asarray(image_embeddings).shape[0]
    top_n = resolve_topn(topn, n)
    n_classes = int(np.asarray(labels).max()) + 1
    metrics = sharded_ranking_metrics(
        jnp.asarray(image_embeddings), labels, jnp.asarray(prompt_embeddings),
        top_n, n_classes, mesh, axis)
    prefix = evaluation + "_"
    return {k[len(prefix):]: float(jnp.mean(v))
            for k, v in metrics.items() if k.startswith(prefix)}
