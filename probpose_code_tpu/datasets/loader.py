"""Batching and prefetching data loader (host side).

Replaces the reference's torch DataLoader + pseudo_collate: samples from the
pipeline are collated into one dict of dense NumPy arrays (ready for a
single host->device transfer) plus the list of PoseDataSample metadata.

Workers follow the reference's subprocess model (torch DataLoader
``num_workers`` — every shipped recipe sets 2..10): with ``num_workers > 1``
the pipeline runs in forked worker processes, sidestepping the GIL that made
thread workers LOSE on pipeline-heavy Python code (measured 262 -> 216
crops/s/core going 1 -> 2 threads). ``num_workers <= 1`` keeps the cheap
in-process path with a prefetch thread. Workers are forked (Linux COW: no
dataset pickling) and must never touch jax — they only run NumPy/cv2/codec
code; batches return to the parent via a pickling queue, preserving batch
order like torch's reordering buffer.

Fork hazard: forking after the JAX backend is initialized is not guaranteed
safe (CPython 3.12 warns; JAX is multithreaded and a forked child can
inherit a held lock — one deadlock observed in practice after heavy
device use on the axon backend). The same caveat applies to torch
DataLoader with CUDA-initialized parents. If workers hang at 0 % CPU,
construct the loader (forcing the first fork) before the first device
computation, or fall back to ``num_workers=0``.
"""

from __future__ import annotations

import multiprocessing
import os
import random
import threading
import traceback
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from probpose_code_tpu.structures import PoseDataSample


def collate_pose_samples(samples: List[dict]) -> Dict:
    """Collate pipeline outputs into dense arrays + data_samples list.

    Keys produced (when present in the samples):
    - inputs: (B, H, W, 3) float32 image batch (BGR, 0-255)
    - heatmaps: (B, K, Hh, Wh); keypoint_weights: (B, K)
    - keypoint_x_labels / keypoint_y_labels for SimCC
    - in_image / annotated / keypoints_visibility: (B, K)
    - data_samples: list of PoseDataSample
    """
    samples = [s for s in samples if s is not None]
    assert samples, "empty batch after pipeline drops"
    batch: Dict = {}
    if "canvas" in samples[0]:
        # deferred-warp batch: uint8 canvases + warp matrices; the jitted
        # train step warps on device (TopdownAffine(device_warp=True)).
        # All-rotation-free batches use the ``_sep`` keys, dispatching to the
        # separable MXU warp (a distinct jit trace keyed by batch structure).
        sep = all(s.get("warp_separable", False) for s in samples)
        suffix = "_sep" if sep else ""
        batch["canvas" + suffix] = np.stack([s["canvas"] for s in samples])
        batch["warp_mat" + suffix] = np.stack([s["warp_mat"] for s in samples]).astype(np.float32)
    else:
        inputs = np.stack([s["inputs"] for s in samples])
        # uint8 crops stay uint8: 4x less host->device traffic; the jitted
        # program's normalize casts on device
        batch["inputs"] = inputs if inputs.dtype == np.uint8 else inputs.astype(np.float32)
    if "device_kpts_hm" in samples[0]:
        # deferred-encode batch (GenerateTarget(device=True)): heatmap-space
        # keypoints; target maps are rendered on device (ops.encode)
        batch["kpts_hm"] = np.stack(
            [np.asarray(s["device_kpts_hm"]).reshape(-1, 2) for s in samples]
        ).astype(np.float32)
        batch["kpts_visible"] = np.stack(
            [np.asarray(s["device_kpts_visible"]).reshape(-1) for s in samples]
        ).astype(np.float32)
    data_samples = [s["data_samples"] for s in samples]
    batch["data_samples"] = data_samples

    ds0: PoseDataSample = data_samples[0]

    def stack_label(name):
        vals = [np.asarray(d.gt_instance_labels[name]) for d in data_samples]
        v = np.stack(vals)
        # labels carry an instance dim of 1 for topdown: (B, 1, ...) -> (B, ...)
        if v.ndim >= 3 and v.shape[1] == 1:
            v = v[:, 0]
        return v

    is_cid = "instance_heatmaps" in ds0.gt_fields
    is_ae = "keypoint_indices" in ds0.gt_instance_labels
    for name in (
        "keypoint_weights", "keypoint_labels", "keypoint_x_labels", "keypoint_y_labels",
        "keypoints_visible_weights",
        "lifting_target_label", "lifting_target_weight", "trajectory_weights",
    ):
        if name in ds0.gt_instance_labels and not ((is_cid or is_ae) and name == "keypoint_weights"):
            batch[name] = stack_label(name).astype(np.float32)

    if is_ae:
        # AE: per-instance (N, K, 2) tag indices and (N, K) weights vary per
        # image — pad indices to the batch max (the [..., 1] valid flag is 0
        # on padding) and reduce weights to per-channel for the dense MSE
        idx_list = [np.asarray(d.gt_instance_labels.keypoint_indices).reshape(-1, *np.asarray(d.gt_instance_labels.keypoint_indices).shape[-2:]) for d in data_samples]
        kw_list = [np.asarray(d.gt_instance_labels.keypoint_weights).reshape(len(i), -1) if "keypoint_weights" in d.gt_instance_labels else np.ones(i.shape[:2], np.float32) for d, i in zip(data_samples, idx_list)]
        M = max(1, max(len(i) for i in idx_list))
        K = idx_list[0].shape[1]
        idx_pad = np.zeros((len(idx_list), M, K, 2), np.int64)
        kw_batch = np.zeros((len(idx_list), K), np.float32)
        for b, (ii, ww) in enumerate(zip(idx_list, kw_list)):
            n = len(ii)
            if n:
                idx_pad[b, :n] = ii
                kw_batch[b] = ww.max(axis=0)
        batch["keypoint_indices"] = idx_pad
        batch["keypoint_weights"] = kw_batch

    if "heatmaps" in ds0.gt_fields:
        batch["heatmaps"] = np.stack([np.asarray(d.gt_fields.heatmaps) for d in data_samples]).astype(np.float32)
    for name in ("heatmap_weights", "displacements", "displacement_weights"):
        # SPR/DEKR dense targets live in gt_fields at fixed shapes
        if name in ds0.gt_fields:
            batch[name] = np.stack(
                [np.asarray(d.gt_fields[name]) for d in data_samples]
            ).astype(np.float32)
    if is_cid:
        # CID: per-image instance counts vary — pad to the batch max and
        # carry a validity mask (cid_head_loss masks on instance_valid)
        # codec contract (reference decoupled_heatmap.py encode): flat
        # (N*K, H, W) decoupled heatmaps + (N*K,) weights + (N, 2) roots
        coords = [np.asarray(d.gt_instance_labels.instance_coords).reshape(-1, 2)
                  for d in data_samples]
        hms = [np.asarray(d.gt_fields.instance_heatmaps) for d in data_samples]
        kws = [
            np.asarray(d.gt_instance_labels.keypoint_weights).reshape(-1)
            if "keypoint_weights" in d.gt_instance_labels
            else np.ones(h.shape[0], np.float32)
            for d, h in zip(data_samples, hms)
        ]
        B = len(hms)
        M = max(1, max(len(c) for c in coords))
        Hh, Wh = hms[0].shape[-2:]
        K = max(1, max(h.shape[0] // max(1, len(c)) for h, c in zip(hms, coords)))
        inst_hms = np.zeros((B, M, K, Hh, Wh), np.float32)
        inst_coords = np.zeros((B, M, 2), np.int64)
        inst_valid = np.zeros((B, M), np.float32)
        inst_kw = np.zeros((B, M, K), np.float32)
        for b, (h, c, w) in enumerate(zip(hms, coords, kws)):
            n = len(c)
            if n:
                inst_hms[b, :n] = h.reshape(n, K, Hh, Wh)
                inst_coords[b, :n] = c
                inst_valid[b, :n] = 1.0
                inst_kw[b, :n] = w.reshape(n, K)
        batch["instance_heatmaps"] = inst_hms
        batch["instance_coords"] = inst_coords
        batch["instance_valid"] = inst_valid
        batch["keypoint_weights"] = inst_kw
    if "heatmap_mask" in ds0.gt_fields:
        # valid-region mask at heatmap resolution (BottomupGetHeatmapMask) —
        # consumed by dekr_head_loss / cid losses as (B, Hh, Wh)
        batch["heatmap_mask"] = np.stack(
            [np.asarray(d.gt_fields.heatmap_mask) for d in data_samples]
        ).astype(np.float32)

    def stack_instance(name, squeeze=True):
        vals = [np.asarray(d.gt_instances[name]) for d in data_samples]
        v = np.stack(vals)
        if squeeze and v.ndim >= 3 and v.shape[1] == 1:
            v = v[:, 0]
        return v

    if "in_image" in ds0.gt_instances:
        batch["in_image"] = stack_instance("in_image").astype(np.float32)
    if "keypoints_visible" in ds0.gt_instances:
        batch["annotated"] = stack_instance("keypoints_visible").astype(np.float32)
    if "keypoints_visibility" in ds0.gt_instances:
        batch["keypoints_visibility"] = stack_instance("keypoints_visibility").astype(np.float32)
    return batch


_FORK_AVAILABLE = hasattr(os, "fork")

# serializes the seeded pipeline section of the in-process path so per-task
# RNG seeding cannot interleave across prefetch threads
_RNG_LOCK = threading.Lock()


def _process_worker_loop(dataset, collate_fn, in_q, out_q):
    """Worker body: pull (batch_id, index chunk, task_seed), run the
    pipeline + collate, push (batch_id, batch, error). Runs in a forked
    child — NumPy/cv2/codec code only, never jax."""
    # single-threaded math libs: N workers x M BLAS threads oversubscribes
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    import random

    while True:
        item = in_q.get()
        if item is None:
            return
        bid, chunk, task_seed = item
        try:
            # per-TASK seeding: augmentation draws depend on (seed, epoch,
            # batch id), not on which worker ran it — batch content is
            # identical for any num_workers (torch reseeds per worker and
            # loses this property)
            np.random.seed(task_seed % (2**32))
            random.seed(task_seed)
            samples = [dataset[int(i)] for i in chunk]
            out_q.put((bid, collate_fn(samples), None))
        except Exception:
            out_q.put((bid, None, traceback.format_exc()))


class _WorkerPool:
    """Persistent forked worker pool (torch persistent_workers semantics):
    forked once, reused across epochs — fork startup is paid once, and the
    dataset rides Linux COW with no pickling. Children hold a snapshot of
    the dataset; per-epoch state (shuffling, augmentation seeds) flows
    through the task tuples."""

    def __init__(self, dataset, collate_fn, num_workers: int):
        ctx = multiprocessing.get_context("fork")
        self.in_q = ctx.SimpleQueue()
        self.out_q = ctx.SimpleQueue()
        self.workers = [
            ctx.Process(
                target=_process_worker_loop,
                args=(dataset, collate_fn, self.in_q, self.out_q),
                daemon=True,
            )
            for _ in range(num_workers)
        ]
        for w in self.workers:
            w.start()

    def alive(self) -> bool:
        return all(w.is_alive() for w in self.workers)

    def close(self) -> None:
        try:
            for _ in self.workers:
                self.in_q.put(None)
            for w in self.workers:
                w.join(timeout=5.0)
                if w.is_alive():
                    w.terminate()
        except Exception:
            pass


class DataLoader:
    """Iterable over collated batches with shuffling and prefetch.

    ``num_workers > 1`` forks that many pipeline worker processes (reference:
    torch DataLoader subprocess workers, ``num_workers`` in every recipe);
    ``num_workers <= 1`` runs the pipeline in-process behind a prefetch
    thread."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        collate_fn=collate_pose_samples,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        with_data_samples: bool = True,
    ):
        # training loops consume only the dense arrays; dropping the
        # PoseDataSample list saves its per-batch pickle cost through the
        # process-worker queue (the dominant IPC overhead)
        if not with_data_samples:
            inner = collate_fn

            def collate_fn(samples, _inner=inner):
                batch = _inner(samples)
                batch.pop("data_samples", None)
                return batch

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self.epoch = 0
        # multi-host sharding (reference: torch DistributedSampler +
        # DistSamplerSeedHook, ``configs/_base_/default_runtime.py:16``):
        # every process loads a disjoint interleaved subset; the shared seed
        # keeps the global permutation identical across hosts. ``batch_size``
        # stays per-process; the global batch spans process_count shards.
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count
        self._pool: Optional[_WorkerPool] = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _task_seed(self, bid: int) -> int:
        # augmentation draws depend on (seed, epoch, batch id), not on which
        # worker ran the batch — content is identical for any num_workers
        # (torch reseeds per worker and loses this property)
        return ((self.seed + 1) * 1_000_003 + self.epoch) * 131_071 + bid

    def __len__(self) -> int:
        return len(self._index_batches())

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        indices = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(indices)
        if self.process_count > 1:
            if self.shuffle or self.drop_last:
                # training: pad to a multiple of (batch * count) by wrapping
                # (DistributedSampler round_up semantics), then interleave
                step = self.batch_size * self.process_count
                pad = (-len(indices)) % step
                if pad:
                    indices = np.concatenate([indices, indices[:pad]])
            indices = indices[self.process_index::self.process_count]
        batches = []
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        if self.num_workers > 1 and _FORK_AVAILABLE:
            yield from self._iter_processes(batches)
            return
        yield from self._iter_threads(batches)

    def _iter_threads(self, batches) -> Iterator[Dict]:
        """In-process path with a small prefetch thread pool (num_workers<=1
        or platforms without fork).

        Uses the same per-task seeding as the process workers so batch
        content is identical whether the pipeline runs in-process or in N
        forked workers. The seeded section is serialized under a lock (batch
        loads were already serial through the GIL on Python-level transform
        code) and the ambient RNG state is restored, so the loader's draws
        are invisible to the caller's RNG stream. On non-fork platforms with
        num_workers > 1 the sample loads of concurrent batches interleave, so
        per-task seeding — and the worker-count-independence property — is
        skipped there."""
        seeded = self.num_workers <= 1
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:

            def load_batch(bid_chunk):
                bid, idx_chunk = bid_chunk
                if not seeded:
                    samples = list(pool.map(self.dataset.__getitem__, idx_chunk))
                    return self.collate_fn(samples)
                with _RNG_LOCK:
                    np_state = np.random.get_state()
                    py_state = random.getstate()
                    np.random.seed(self._task_seed(bid) % (2**32))
                    random.seed(self._task_seed(bid))
                    try:
                        samples = [self.dataset[int(i)] for i in idx_chunk]
                    finally:
                        np.random.set_state(np_state)
                        random.setstate(py_state)
                return self.collate_fn(samples)

            # simple sliding-window prefetch
            from collections import deque

            futures = deque()
            submitter = iter(enumerate(batches))
            with ThreadPoolExecutor(max_workers=self.prefetch) as batch_pool:
                for _ in range(self.prefetch):
                    chunk = next(submitter, None)
                    if chunk is not None:
                        futures.append(batch_pool.submit(load_batch, chunk))
                while futures:
                    fut = futures.popleft()
                    chunk = next(submitter, None)
                    if chunk is not None:
                        futures.append(batch_pool.submit(load_batch, chunk))
                    yield fut.result()

    def _iter_processes(self, batches) -> Iterator[Dict]:
        """Persistent forked worker processes, one whole batch per task,
        results reordered to the deterministic batch order (torch DataLoader
        semantics). Workers never touch jax/TPU state."""
        if self._pool is None or not self._pool.alive():
            if self._pool is not None:
                self._pool.close()
            self._pool = _WorkerPool(self.dataset, self.collate_fn, self.num_workers)
        pool = self._pool

        def task(bid: int):
            return (bid, np.asarray(batches[bid], np.int64), self._task_seed(bid))

        drained = False
        submitted = inflight = next_out = 0
        stash: Dict[int, Dict] = {}
        window = self.num_workers + max(1, self.prefetch)
        try:
            while submitted < len(batches) and inflight < window:
                pool.in_q.put(task(submitted))
                submitted += 1
                inflight += 1
            while next_out < len(batches):
                if next_out in stash:
                    batch = stash.pop(next_out)
                    next_out += 1
                    yield batch
                    continue
                bid, batch, err = pool.out_q.get()
                inflight -= 1
                if err is not None:
                    raise RuntimeError(f"dataloader worker failed on batch {bid}:\n{err}")
                if submitted < len(batches):
                    pool.in_q.put(task(submitted))
                    submitted += 1
                    inflight += 1
                stash[bid] = batch
            drained = True
        finally:
            if not drained:
                # abandoned mid-epoch (error or early break): the queues
                # still hold tasks/results — drop the pool rather than
                # resynchronize
                pool.close()
                self._pool = None

    def close(self) -> None:
        """Shut down persistent worker processes (safe to call repeatedly)."""
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def __del__(self):  # best-effort; daemons die with the parent anyway
        try:
            self.close()
        except Exception:
            pass
