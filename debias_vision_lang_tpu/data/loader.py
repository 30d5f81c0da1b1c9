"""Host-ingest loader: threaded image decode → fixed-shape device batches.

Replaces the reference's ``DataLoader(batch_size=256, num_workers=6)``
(reference: debias_clip/measuring_bias.py:142) with a TPU-appropriate
pipeline: PIL JPEG decode on host threads (libjpeg releases the GIL), images
stacked as raw uint8 [B, H, W, 3] (4× less host→device traffic than float32),
the resize/crop/normalize chain fused on-device (vision/preprocess.py), and
optional ``NamedSharding`` placement so each batch lands already sharded over
the data mesh.

The last partial batch is padded to the fixed batch size (static shapes for
XLA) and accompanied by a validity count so consumers can drop the padding.
"""

from __future__ import annotations

import concurrent.futures
from typing import Iterator, NamedTuple

import numpy as np


class Batch(NamedTuple):
    # uint8 [B, H, W, 3]; [B, T, H, W, 3] for video; or patch-contiguous
    # [B, P, patch²·3] when native_patch staging is on
    images: np.ndarray
    labels: np.ndarray  # int32 [B]
    num_valid: int  # <= B; rest is padding


class HostLoader:
    """Iterates a dataset (needs ``load_image(i)`` and ``iat_labels``) in
    fixed-size batches with ``num_workers`` decode threads and double-buffered
    prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int = 256,
        num_workers: int = 6,
        prefetch: int = 2,
        drop_remainder: bool = False,
        shuffle: bool = False,
        seed: int = 0,
        native_n_px: int | None = None,
        native_patch: int | None = None,
        host_transform=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        # host_transform: user-supplied per-image preprocess callable
        # (reference-style ``img_preproc``), applied on the decode threads so
        # every image reaches np.stack at a fixed shape — raw variable-size
        # images would crash the stack (same defect class the native_n_px
        # fallback below guards against)
        if host_transform is not None and native_n_px is not None:
            raise ValueError(
                "host_transform and native_n_px are mutually exclusive: a "
                "custom host preprocess replaces the native resize path")
        self.host_transform = host_transform
        # native_n_px: when set and the native ingest runtime is available,
        # whole batches are decoded + PIL-exact-resized + center-cropped to
        # [B, n_px, n_px, 3] uint8 by the C++ thread pool (native/ingest.cc)
        # — no Python in the per-image loop, and H2D ships n_px² uint8
        # instead of raw-size images.  The device preprocess then only
        # normalizes (resize of an already-n_px image is the identity).
        self.native_n_px = native_n_px
        # native_patch: stage batches PATCH-CONTIGUOUSLY as uint8
        # [B, (n_px/patch)², patch²·3] instead of [B, n_px, n_px, 3] — the
        # layout the exact int8 ViT stem consumes with zero device relayout
        # (ops/quant.py::patch_embed_q_p8).  Same byte count; the native
        # runtime writes it for free at decode time, the Python fallback
        # rearranges per image (vision/preprocess.py::patchify_u8).
        if native_patch is not None:
            if native_n_px is None:
                raise ValueError("native_patch requires native_n_px")
            if native_n_px % native_patch != 0:
                raise ValueError(
                    f"native_n_px={native_n_px} not divisible by "
                    f"native_patch={native_patch}")
        self.native_patch = native_patch
        # Cap decode threads at 2× the core count: oversubscribed decode
        # threads starve the device-runtime client threads (measured 40×
        # slowdown at 12 workers on a 1-core host — PERF.md).  The reference's
        # num_workers=6 (measuring_bias.py:142) is a request, not a mandate.
        import os as _os

        self.num_workers = max(1, min(num_workers, 2 * (_os.cpu_count() or 1)))
        self.prefetch = max(prefetch, 1)
        self.drop_remainder = drop_remainder
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _native_active(self) -> bool:
        if self.native_n_px is None:
            return False
        if not getattr(self.dataset, "_img_fnames", None):
            return False
        from .. import native

        return native.available()

    def _epoch_plan(self):
        """One epoch's (order, bounds): a fresh permutation when shuffling
        (advances the loader rng exactly once per epoch), plus the batch
        boundary list after drop_remainder filtering.  Single source of the
        iteration order for BOTH the decode iterator (__iter__) and the
        index iterator (iter_index_batches) — the frozen-embedding cache
        relies on the two producing identical sequences for a given seed."""
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        bounds = [
            (s, min(s + self.batch_size, n))
            for s in range(0, n, self.batch_size)
        ]
        if self.drop_remainder:
            bounds = [(s, e) for s, e in bounds if e - s == self.batch_size]
        return order, bounds

    def iter_index_batches(self) -> Iterator[Batch]:
        """One epoch of Batch tuples whose ``images`` field holds ROW INDICES
        (int64 [B]) instead of decoded pixels — the training loop's
        frozen-embedding cache gathers precomputed embedding rows with them.
        Same order, batching and labels as __iter__ would produce this
        epoch.  Padding SEMANTICS diverge from __iter__ by necessity: pad
        positions hold index 0 (there is no "zero image" index), where
        __iter__ pads with zero canvases — a drop_remainder=False consumer
        MUST mask by ``num_valid`` before using gathered rows or pad
        positions become live duplicates of row 0 (the training loop always
        iterates drop_remainder=True, so it never sees padding here)."""
        order, bounds = self._epoch_plan()
        for s, e in bounds:
            idx = order[s:e].astype(np.int64)
            labels = np.asarray(
                [self.dataset.iat_labels[int(i)] for i in idx], np.int32)
            num_valid = e - s
            if num_valid < self.batch_size:
                pad = self.batch_size - num_valid
                idx = np.concatenate([idx, np.zeros(pad, np.int64)])
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
            yield Batch(idx, labels, num_valid)

    def __iter__(self) -> Iterator[Batch]:
        order, bounds = self._epoch_plan()
        if not bounds:
            return
        if self._native_active():
            yield from self._iter_native(order, bounds)
            return

        last = bounds[-1][1]
        # Per-image decode futures with a sliding submission window: the pool
        # only ever runs leaf decode tasks (no nested submission → no
        # thread-pool deadlock), while `prefetch` batches stay in flight.
        window = self.prefetch * self.batch_size
        if self.host_transform is not None:
            ht = self.host_transform

            def load_one(i: int):
                return np.asarray(ht(self.dataset.load_image(i)))
        elif self.native_n_px is not None:
            # native runtime unavailable but a target size was requested:
            # apply the bit-exact host resize/crop per image so the shape
            # contract ([B, n_px, n_px, 3]) holds — without it np.stack
            # crashes on variable-size datasets (e.g. ImageNet)
            from ..vision.preprocess import (patchify_u8, resize_crop_u8,
                                             to_rgb_array)

            n_px = self.native_n_px
            patch = self.native_patch

            def load_one(i: int):
                arr = to_rgb_array(self.dataset.load_image(i))
                if arr.ndim == 4:  # video: [T, H, W, 3] → per-frame
                    if patch is not None:
                        raise ValueError(
                            "native_patch staging does not support video "
                            "batches")
                    if arr.shape[1] == n_px and arr.shape[2] == n_px:
                        return arr
                    return np.stack([resize_crop_u8(f, n_px) for f in arr])
                if not (arr.shape[0] == n_px and arr.shape[1] == n_px):
                    arr = resize_crop_u8(arr, n_px)
                return arr if patch is None else patchify_u8(arr, patch)
        else:
            def load_one(i: int):
                return self.dataset.load_image(i)

        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            futures = {}
            next_submit = 0

            def top_up(until: int):
                nonlocal next_submit
                while next_submit < min(until, last):
                    futures[next_submit] = pool.submit(
                        load_one, int(order[next_submit])
                    )
                    next_submit += 1

            top_up(window)
            for s, e in bounds:
                top_up(e + window)
                images = [futures.pop(i).result() for i in range(s, e)]
                labels = np.asarray(
                    [self.dataset.iat_labels[int(order[i])] for i in range(s, e)],
                    np.int32,
                )
                num_valid = e - s
                if num_valid < self.batch_size:  # pad to fixed shape
                    pad = self.batch_size - num_valid
                    images = images + [np.zeros_like(images[0])] * pad
                    labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                yield Batch(np.stack(images), labels, num_valid)

    def _iter_native(self, order: np.ndarray, bounds) -> Iterator[Batch]:
        """Batch-at-a-time ingest through the C++ runtime: one call decodes,
        resizes (PIL bit-exact fixed point) and crops a whole batch on the
        native thread pool; a single-slot executor keeps the next batch in
        flight while the device consumes the current one (the native call
        releases the GIL)."""
        import concurrent.futures

        from .. import native

        n_px = self.native_n_px

        def make(s: int, e: int) -> Batch:
            idx = [int(order[i]) for i in range(s, e)]
            paths = [self.dataset._img_fnames[i] for i in idx]
            if self.native_patch is not None:
                imgs, ok = native.ingest_batch_files_u8p(
                    paths, n_px, patch=self.native_patch,
                    nthreads=self.num_workers)
            else:
                imgs, ok = native.ingest_batch_files_u8(
                    paths, n_px, nthreads=self.num_workers)
            if not ok.all():
                # unsupported format / corrupt file: per-image PIL fallback
                from ..vision.preprocess import (patchify_u8, resize_crop_u8,
                                                 to_rgb_array)

                for j in np.nonzero(~ok)[0]:
                    arr = to_rgb_array(self.dataset.load_image(idx[j]))
                    arr = resize_crop_u8(arr, n_px)
                    imgs[j] = (arr if self.native_patch is None
                               else patchify_u8(arr, self.native_patch))
            labels = np.asarray([self.dataset.iat_labels[i] for i in idx],
                                np.int32)
            num_valid = e - s
            if num_valid < self.batch_size:
                pad = self.batch_size - num_valid
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], np.uint8)])
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
            return Batch(imgs, labels, num_valid)

        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            pending = [pool.submit(make, s, e)
                       for s, e in bounds[: self.prefetch]]
            nxt = self.prefetch
            for _ in range(len(bounds)):
                batch = pending.pop(0).result()
                if nxt < len(bounds):
                    pending.append(pool.submit(make, *bounds[nxt]))
                    nxt += 1
                yield batch


def shard_batch(batch: Batch, mesh=None, data_axis: str = "data"):
    """Place a host batch onto the device mesh, batch dim sharded over
    ``data_axis``.  Without a mesh, plain device_put.

    Thin Batch-shaped front over ``parallel.mesh.shard_batch_arrays`` (the
    single implementation every in-package consumer uses)."""
    import jax

    if mesh is None:
        return jax.device_put(batch.images), jax.device_put(batch.labels)
    if data_axis != "data":
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(data_axis))
        return (jax.device_put(batch.images, sharding),
                jax.device_put(batch.labels, sharding))
    from ..parallel.mesh import shard_batch_arrays

    return shard_batch_arrays(mesh, batch.images, batch.labels)
