"""Disk persistence for the frozen-tower training embedding cache.

`TrainConfig.cache_frozen_embeddings` (train/loop.py) already embeds the
attribute rows and the caption corpus exactly once per `run_training` call.
This module makes that one pass reusable ACROSS calls — the hyperparameter
sweep workflow (the reference's protocol sweeps adversarial weight / lr /
prompt counts over the same frozen tower and data, README.md:148-157 and
the paper's grids): with `TrainConfig.embedding_cache_dir` set, the second
and later sweep points skip the decode+embed pass entirely.

Safety model — STRICTER than the eval-side `cache_embeddings` (which trusts
a user-owned path and keys on config only, eval/measure.py:317): these rows
feed gradient updates, so the key fingerprints CONTENT:

* the image-tower parameters (every leaf's path, shape, dtype, and bytes —
  a different checkpoint, a different random init, or a dtype-cast tower
  all miss),
* the dataset rows (file-name list + encoded labels; caption corpora hash
  the captions CSV bytes),
* the resolved embed dtype and resolution.

A mismatched or unreadable file is treated as a MISS (recomputed and
atomically overwritten via .part + os.replace), never trusted: unlike the
eval cache there is no user-chosen path to honor — filenames here embed the
key hash, so a mismatch means corruption or a hash collision, and
recomputation is always correct.  Fingerprinting costs one pass over the
tower bytes (~1-2 s at ViT-B/16 scale) — noise against the minutes of
decode+embed it saves.

Residual risk (documented, same as the eval cache): image file CONTENT is
not hashed — rows are identified by file name + label.  Regenerating a
world in place with different pixels under identical names defeats both
caches; use a fresh directory per world (build_world and the benchmarks
already do).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional

import numpy as np

__all__ = [
    "params_fingerprint", "dataset_fingerprint", "file_sha256",
    "cache_load", "cache_store", "cache_path",
]


def params_fingerprint(params) -> str:
    """sha256 over every leaf's (path, shape, dtype, bytes), path-sorted —
    deterministic across processes for the same pytree."""
    from jax.tree_util import tree_flatten_with_path

    h = hashlib.sha256()
    leaves, _ = tree_flatten_with_path(params)
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        a = np.asarray(leaf)
        h.update(str(path).encode())
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def dataset_fingerprint(ds) -> str:
    """sha256 over the dataset's row identity: ordered file names + encoded
    labels (gen_labels output).  Captures sort/_n_samples/equal_split/seed
    effects through their RESULT rather than re-deriving the config."""
    h = hashlib.sha256()
    for f in ds._img_fnames:
        h.update(str(f).encode())
        h.update(b"\0")
    h.update(np.ascontiguousarray(np.asarray(ds.iat_labels)).tobytes())
    return h.hexdigest()


def file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _key_json(key_fields: Dict) -> str:
    return json.dumps(key_fields, sort_keys=True, default=str)


def cache_path(cache_dir: str, kind: str, key_fields: Dict) -> str:
    """Deterministic file path: the key hash is IN the name, so distinct
    configs coexist in one directory (sweep-friendly)."""
    digest = hashlib.sha256(_key_json(key_fields).encode()).hexdigest()[:32]
    return os.path.join(cache_dir, f"{kind}_{digest}.npz")


def cache_load(path: str, key_fields: Dict) -> Optional[Dict[str, np.ndarray]]:
    """The stored arrays on a validated hit; None on ANY miss (absent,
    unreadable, or key-mismatched — a mismatch under a matching filename is
    corruption, and recomputing is always correct)."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as data:
            if "cache_key" not in data or str(data["cache_key"]) != \
                    _key_json(key_fields):
                return None
            return {k: data[k] for k in data.files if k != "cache_key"}
    except Exception:
        return None


def cache_store(path: str, key_fields: Dict, **arrays) -> None:
    """Atomic staged write (.part + os.replace) — an interrupted run can't
    leave a truncated file a later exists() would trust."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        np.savez(f, cache_key=_key_json(key_fields), **arrays)
    os.replace(tmp, path)
