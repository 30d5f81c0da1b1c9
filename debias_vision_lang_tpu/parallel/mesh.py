"""Device mesh + sharding helpers.

The reference has no distributed machinery (single ``device`` strings
everywhere — reference: debias_clip/measuring_bias.py:148,
model/model.py:134-136; SURVEY.md §2c).  Here parallelism is first-class:
one ``jax.sharding.Mesh`` threaded through embed/eval/train, with XLA
collectives over ICI as the communication backend (the NCCL-equivalent is
the compiler, not a transport library).

Default topology: 2-D ``(data, model)`` mesh.  CLIP-B/L fits one chip, so
``model=1`` by default (pure DP); the model axis exists so tensor-parallel
shardings (attention heads / MLP hidden) can be enabled without code changes.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh.  Default: all devices on the data axis."""
    explicit = devices is not None
    devices = list(devices if explicit else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    d, m = shape
    if d * m != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    if not explicit:
        # topology-aware assignment: on multi-chip slices the naive
        # enumeration order can put mesh neighbors on non-adjacent chips,
        # sending collectives across slow ICI hops
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh((d, m)), axis_names)
        except Exception:
            pass  # fall back below (e.g. exotic device sets)
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, axis_names)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host (DCN) runtime initialization — the standard
    ``jax.distributed.initialize`` handshake that makes every host's chips
    visible to one global mesh (SURVEY §2c: single-host multi-chip over
    ICI is the primary topology; this is the across-hosts extension, and
    ``create_mesh()``/``default_mesh()`` then span all processes' devices
    automatically because ``jax.devices()`` is global).

    Safe-by-default: initializes ONLY when a coordinator is named — via
    the ``coordinator_address`` argument or ``$JAX_COORDINATOR_ADDRESS``
    (with ``$JAX_NUM_PROCESSES`` / ``$JAX_PROCESS_ID``) — so single-host
    runs are a no-op, not a hang waiting for peers.  Idempotent.  Returns
    True when a multi-process runtime is active after the call."""
    import os

    if jax.process_count() > 1:
        return True
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord is None:
        return False
    if num_processes is None:
        env_n = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env_n) if env_n else None
    if process_id is None:
        env_i = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env_i) if env_i else None
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


@functools.lru_cache(maxsize=1)
def default_mesh() -> Mesh:
    return create_mesh()


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_params(params, mesh: Mesh):
    """Place a param pytree fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(params, sharding)


def dp_shard_map(mesh: Mesh, fn):
    """jit(shard_map) data-parallel wrapper: replicated first argument
    (model/params pytree), batch-sharded second argument and output.

    This is THE pattern for running the fused-block pallas kernels under a
    mesh: GSPMD cannot partition a pallas custom call (plain jit with
    shardings would all-gather the batch onto every chip), so shard_map
    hands each device its local block.  ``check_vma=False`` because the
    local fn may contain nested jits.  Used by the eval embed path, the
    serving engine, and the trainer's frozen embed."""
    from jax.sharding import PartitionSpec

    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(DATA_AXIS)),
        out_specs=PartitionSpec(DATA_AXIS), check_vma=False))


def shard_batch_arrays(mesh: Mesh, *arrays):
    """device_put each array with its batch dim sharded over ``data``.

    The batch dim MUST already be a multiple of the data-axis size — this
    helper does NOT pad (device_put raises on indivisible shardings).
    Ragged tails are padded and sliced off by the callers that can mask
    them (eval/measure, eval/zero_shot, serve/engine); loaders emit fixed
    shapes.
    """
    out = []
    for a in arrays:
        out.append(jax.device_put(a, batch_sharding(mesh, np.ndim(a))))
    return tuple(out) if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# Tensor-parallel partition specs for the stacked transformer params
# ---------------------------------------------------------------------------


def clip_param_pspecs(params, model_axis: str = MODEL_AXIS):
    """PartitionSpec pytree for a CLIP param tree.

    Megatron-style TP over the stacked resblocks (leading dim = layers):
      wqkv [L, D, 3D]  → shard output dim (column-parallel)
      wo   [L, D, D]   → shard input dim (row-parallel; XLA inserts psum)
      mlp w1 [L, D, 4D] → column;  w2 [L, 4D, D] → row
    Everything else replicated.  With mesh model=1 these are no-ops.
    """

    def resblock_specs(rb):
        return {
            "ln_1": jax.tree.map(lambda _: P(), rb["ln_1"]),
            "attn": {
                "wqkv": P(None, None, model_axis),
                "bqkv": P(None, model_axis),
                "wo": P(None, model_axis, None),
                "bo": P(None, None),
            },
            "ln_2": jax.tree.map(lambda _: P(), rb["ln_2"]),
            "mlp": {
                "w1": P(None, None, model_axis),
                "b1": P(None, model_axis),
                "w2": P(None, model_axis, None),
                "b2": P(None, None),
            },
        }

    def tower_specs(tower):
        specs = jax.tree.map(lambda _: P(), tower)
        if isinstance(tower, dict) and "resblocks" in tower:
            specs["resblocks"] = resblock_specs(tower["resblocks"])
        return specs

    specs = {}
    for key, sub in params.items():
        if key in ("visual", "text") and isinstance(sub, dict):
            specs[key] = tower_specs(sub)
        else:
            specs[key] = jax.tree.map(lambda _: P(), sub)
    return specs


def shard_clip_params(params, mesh: Mesh):
    """Place CLIP params with TP specs over the mesh."""
    specs = clip_param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def quantized_resblock_pspecs(model_axis: str = MODEL_AXIS):
    """Megatron TP specs for a QUANTIZED stacked-resblock tree
    (ops/quant.py::quantize_resblocks layout: each matmul weight is a
    ``{"q": int8, "scale": fp32}`` pair).

    Column-parallel weights (wqkv [L, D, 3D], w1 [L, D, F]) shard the
    output dim of BOTH q and its per-output-channel scale [L, 1, out];
    row-parallel weights (wo [L, D, D], w2 [L, F, D]) shard q's input dim
    while the scale stays replicated (it is per-OUTPUT-channel, identical
    across input shards — each device dequantizes its int32 partial with
    the same scale and XLA psums the partials, which commutes because the
    scale factors out of the sum)."""
    col = {"q": P(None, None, model_axis),
           "scale": P(None, None, model_axis)}
    row = {"q": P(None, model_axis, None), "scale": P(None, None, None)}
    ln = {"scale": P(None, None), "bias": P(None, None)}
    return {
        "ln_1": ln,
        "ln_2": ln,
        "attn": {"wqkv": col, "bqkv": P(None, model_axis),
                 "wo": row, "bo": P(None, None)},
        "mlp": {"w1": col, "b1": P(None, model_axis),
                "w2": row, "b2": P(None, None)},
    }


def quantized_tower_pspecs(tower_q, model_axis: str = MODEL_AXIS):
    """PartitionSpec pytree for a quantized tower tree: resblocks get the
    Megatron TP specs, everything else (quantized stem, embeddings, LNs,
    projection, a video tree's temporal_attn) replicated."""
    specs = jax.tree.map(lambda _: P(), tower_q)
    if isinstance(tower_q, dict) and "resblocks" in tower_q:
        specs["resblocks"] = quantized_resblock_pspecs(model_axis)
    return specs


def shard_quantized_clip(qmodel, mesh: Mesh):
    """TP-place a ``QuantizedCLIP``: visual_q/text_q resblocks
    Megatron-sharded over ``model``, everything else (quantized stems,
    the fp base bundle) replicated.  Returns a new bundle; the original
    is untouched (jax arrays are immutable)."""
    from ..ops.quant import _rebuild_quantized

    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    visual_q = put(qmodel.visual_q, quantized_tower_pspecs(qmodel.visual_q))
    text_q = (put(qmodel.text_q, quantized_tower_pspecs(qmodel.text_q))
              if qmodel.text_q is not None else None)
    base = replicate_params(qmodel.base, mesh)
    return _rebuild_quantized((base, visual_q, text_q))
