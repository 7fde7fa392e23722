"""Batch assembly + background prefetch (host-side).

Replaces the reference's torch DataLoader worker processes
(data/dataloader.py:55-84, num_workers=8) with a thread pool decoding the
next iterations' frames while the device steps — cv2 releases the GIL during
decode/resize so threads scale. Batches are stacked numpy dicts in the
[shard, video, frame] layout the pairing contract requires, with crop
intrinsics already in NDC units (the reference converts on device every step,
trainer.py:98-101).
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

from selfcorr_tpu.configs import Config

_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_load(vid, fid):
    return _WORKER_DATASET.load_item(vid, fid)


def _worker_ping(_):
    import time
    time.sleep(0.3)  # keep the slot busy so the pool spawns ALL workers
    return 0


_SCRUBBED_PYTHON = None


def _scrubbed_python() -> str:
    """Wrapper executable that scrubs TPU env vars, then execs python.

    The sandbox's sitecustomize registers the TPU PJRT plugin at EVERY
    interpreter start when PALLAS_AXON_POOL_IPS is set, so decode workers
    would contend with the main process's chip. The scrub must happen in
    the CHILD before its interpreter starts; doing it there (rather than
    mutating the parent's os.environ around spawn) is race-free for any
    concurrent parent thread reading JAX_PLATFORMS.

    NOTE the deliberate PROCESS-GLOBAL side effect: ctx.set_executable()
    (below) mutates module state in multiprocessing.spawn, not a per-context
    slot, so every later spawn-based child in this process — including
    workers the pool respawns lazily after a crash — also execs through the
    wrapper with JAX_PLATFORMS=cpu. That is exactly what we want here (no
    child of a trainer process should ever grab the TPU chip); a hypothetical
    spawn child that DOES need the TPU would have to re-set JAX_PLATFORMS
    itself. The wrapper file is removed at interpreter exit.
    """
    global _SCRUBBED_PYTHON
    if _SCRUBBED_PYTHON is None:
        import atexit
        import stat
        import sys
        import tempfile
        fd, path = tempfile.mkstemp(prefix="selfcorr_worker_py_",
                                    suffix=".sh")
        with os.fdopen(fd, "w") as f:
            f.write("#!/bin/sh\n"
                    "unset PALLAS_AXON_POOL_IPS\n"
                    "export JAX_PLATFORMS=cpu\n"
                    f"exec {sys.executable} \"$@\"\n")
        os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR)

        def _cleanup(p=path):
            try:
                os.unlink(p)
            except OSError:
                pass

        atexit.register(_cleanup)
        _SCRUBBED_PYTHON = path
    return _SCRUBBED_PYTHON

_BATCH_KEYS = ("img", "mask", "depth", "occ", "pp_crop", "foc_crop")
_META_KEYS = ("center", "length", "foc", "pp", "idx", "frame_idx")
_GT_KEYS = ("rot_gt", "trans_gt", "scale_gt", "kp", "sfm_pose")


def stack_items(items):
    batch = {}
    for k in _BATCH_KEYS + _META_KEYS + _GT_KEYS:
        if k in items[0]:
            batch[k] = np.stack([it[k] for it in items]).astype(
                items[0][k].dtype if hasattr(items[0][k], "dtype")
                else np.float32)
    return batch


class TrainLoader:
    """Iterates `total_iters` batches from a dataset with
    sample_plan(step) + load_item(vid, fid)."""

    def __init__(self, dataset, cfg: Config, num_workers: int | None = None,
                 prefetch: int = 2, device_put_fn=None,
                 use_processes: bool = False, host_transform=None,
                 row_range: tuple[int, int] | None = None):
        """use_processes: decode in worker PROCESSES (like the reference's
        torch DataLoader, dataloader.py:64 num_workers) so the GIL-heavy
        numpy/cv2 work cannot stall the main thread's step dispatch; falls
        back to threads if the dataset does not pickle.
        device_put_fn: optional host->device transfer applied in the producer
        thread, so the upload overlaps the device step.
        host_transform: optional batch -> batch applied in the producer
        thread after stacking (e.g. compact-dtype packing).
        row_range: multi-host [start, stop) slice of the GLOBAL sample plan
        this process decodes (parallel.process_row_range) — every process
        generates the same deterministic plan and loads only its own rows,
        the DistributedSampler equivalent (reference dataloader.py:57-64)."""
        self.dataset = dataset
        self.cfg = cfg
        self.host_transform = host_transform
        self.row_range = row_range
        n_workers = num_workers or cfg.num_workers
        self._procs = False
        if use_processes and n_workers > 0:
            try:
                import multiprocessing as mp
                import pickle
                pickle.dumps(dataset)  # surfaces unpicklable datasets now
                # spawn workers through the env-scrubbing wrapper so even
                # lazily (re)spawned workers never register the TPU backend
                ctx = mp.get_context("spawn")
                ctx.set_executable(_scrubbed_python())
                self.pool = ProcessPoolExecutor(
                    n_workers, mp_context=ctx,
                    initializer=_init_worker, initargs=(dataset,))
                # surface spawn failures NOW (unpicklable __main__, broken
                # wrapper exec, ...) so the threads fallback below triggers
                list(self.pool.map(_worker_ping, range(n_workers),
                                   chunksize=1))
                self._procs = True
            except Exception as e:
                print(f"[loader] process pool unavailable ({e}); "
                      f"falling back to threads")
                self.pool = ThreadPoolExecutor(n_workers)
        else:
            self.pool = ThreadPoolExecutor(max(n_workers, 1))
        self.prefetch = prefetch
        self.device_put_fn = device_put_fn
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _load_fn(self):
        return _worker_load if self._procs else self.dataset.load_item

    def _plan(self, step: int):
        plan = self.dataset.sample_plan(step)
        if self.row_range is not None:
            plan = plan[self.row_range[0]:self.row_range[1]]
        return plan

    def _make_batch(self, step: int):
        fn = self._load_fn()
        items = [f.result() for f in
                 [self.pool.submit(fn, *vf) for vf in self._plan(step)]]
        return stack_items(items)

    def _submit(self, step: int):
        fn = self._load_fn()
        return [self.pool.submit(fn, *vf) for vf in self._plan(step)]

    def _producer(self):
        # keep the NEXT step's decode jobs in flight while the current batch
        # is stacked and queued, so assembly latency overlaps the device step
        total = self.cfg.total_iters
        pending = self._submit(0)
        for step in range(total):
            if self._stop.is_set():
                return
            nxt = self._submit(step + 1) if step + 1 < total else None
            batch = stack_items([f.result() for f in pending])
            if self.host_transform is not None:
                batch = self.host_transform(batch)
            if self.device_put_fn is not None:
                batch = self.device_put_fn(batch)
            pending = nxt
            self.q.put(batch)
        self.q.put(None)

    def __iter__(self):
        while True:
            batch = self.q.get()
            if batch is None:
                return
            yield batch

    def close(self):
        self._stop.set()


class TestLoader:
    """Sequential fixed-size batches; the tail batch is padded by repeating
    the last sample (static shapes for jit) with a validity mask.

    row_range (multi-host): [lo, hi) global-batch rows THIS process decodes
    (see parallel.process_row_range) — every process iterates the same
    global batch schedule but loads/yields only its own rows; shard_batch
    assembles the global device batch from the per-process slices."""

    def __init__(self, dataset, cfg: Config, batch_size: int | None = None,
                 num_workers: int | None = None,
                 row_range: tuple[int, int] | None = None):
        self.dataset = dataset
        self.cfg = cfg
        self.bsz = batch_size or cfg.batch_size
        self.row_range = row_range
        self.pool = ThreadPoolExecutor(num_workers or cfg.num_workers)
        order = np.arange(len(dataset))
        if cfg.shuffle_test:
            np.random.RandomState(cfg.seed).shuffle(order)
        self.order = order

    def __len__(self):
        return -(-len(self.dataset) // self.bsz)

    def __iter__(self):
        n = len(self.dataset)
        for start in range(0, n, self.bsz):
            idx = self.order[start: start + self.bsz]
            valid = np.ones(self.bsz, bool)
            if len(idx) < self.bsz:
                valid[len(idx):] = False
                idx = np.concatenate(
                    [idx, np.full(self.bsz - len(idx), idx[-1])])
            if self.row_range is not None:
                lo, hi = self.row_range
                idx = idx[lo:hi]
                valid = valid[lo:hi]
            items = list(self.pool.map(self.dataset.load_item, idx))
            batch = stack_items(items)
            batch["valid"] = valid
            yield batch
