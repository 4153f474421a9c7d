"""Multi-process prefetching data loader.

Our own runtime component (the reference leans on torch's DataLoader): worker
processes pull sample indices from a task queue, run dataset.__getitem__ +
transform, and push transformed samples back; the parent assembles batches with
the collate fn. Supports:

  * epoch-seeded shuffling (``set_epoch``, like DistributedSampler.set_epoch),
  * rank/world sharding for data-parallel hosts,
  * worker-seeded augmentation RNG (deterministic given (seed, epoch, idx)),
  * BOUNDED in-flight dispatch: at most ``max_inflight`` samples are queued or
    buffered at any time, so a slow consumer cannot grow the result queue
    without bound (full-COCO epochs stay at flat RSS),
  * ``spawn`` worker context by default: the parent holds JAX/XLA thread
    pools, and POSIX ``fork`` from a multi-threaded process can deadlock the
    child; the data modules import no JAX so spawned workers start cheaply.

Workers are only started when ``num_workers > 0``; otherwise loading is inline
(useful for tests and debugging).
"""

import multiprocessing as mp
import queue

import numpy as np


def _worker_loop(dataset, base_seed, task_q, result_q):
    # cv2's internal thread pool is useless in a 1-sample-at-a-time worker
    # (and does not survive fork); disable it.
    try:
        import cv2
        cv2.setNumThreads(0)
    except Exception:
        pass
    while True:
        task = task_q.get()
        if task is None:
            break
        gen, job_id, idx, epoch = task
        if getattr(dataset, "transform", None) is not None and \
                hasattr(dataset.transform, "reseed"):
            dataset.transform.reseed(
                (base_seed * 1_000_003 + epoch * 97 + idx) % (2 ** 31)
            )
        try:
            sample = dataset[idx]
            result_q.put((gen, job_id, sample, None))
        except Exception as e:  # surface worker errors in the parent
            result_q.put((gen, job_id, None, repr(e)))


class DataLoader:
    # Result-queue poll interval: each expiry re-checks worker liveness so a
    # worker killed by the OS (OOM, segfault) raises instead of hanging the
    # epoch. Class attribute so tests can shrink it.
    _RESULT_POLL_S = 30.0

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=0,
                 collate_fn=None, drop_last=False, pad_last=False, seed=0,
                 rank=0, world_size=1, prefetch_factor=2, mp_context="spawn",
                 **unused):
        # pad_last: wrap-pad the final batch to full batch_size (keeps compiled
        # shapes static); padded samples get info['_pad']=True so eval skips them.
        # In-flight work is BOUNDED: at most ``max_inflight`` samples are
        # dispatched-but-unconsumed, so worker prefetch cannot outrun the
        # consumer and grow the result queue without bound (flat RSS on
        # full-COCO epochs). ``prefetch_factor`` is per worker, like torch.
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.collate_fn = collate_fn if collate_fn is not None else (lambda b: b)
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.prefetch_factor = prefetch_factor
        self.mp_context = mp_context
        self.max_inflight = batch_size + max(1, num_workers) * prefetch_factor
        self.inflight_peak = 0  # observability: max in-flight seen (tests)
        self.epoch = 0
        self._workers = []
        self._task_q = None
        self._result_q = None
        # Incremented per __iter__: results tagged with an older generation
        # (from an iterator abandoned mid-epoch) are discarded, never served
        # as the new iteration's samples.
        self._gen = 0

    # -- distributed sampler semantics (reference DistributedSampler injection,
    #    trainer/builder.py:102-104)
    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1_000_003 + self.epoch)
            order = rng.permutation(n)
        if self.world_size > 1:
            # pad to a multiple of world_size (wrap-around) then stride-shard
            total = int(np.ceil(n / self.world_size)) * self.world_size
            order = np.concatenate([order, order[: total - n]])
            order = order[self.rank::self.world_size]
        return order

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _fetch(self, idx):
        """Load one sample inline with the deterministic (seed, epoch, idx)
        augmentation RNG — the same function worker processes apply."""
        if getattr(self.dataset, "transform", None) is not None and \
                hasattr(self.dataset.transform, "reseed"):
            self.dataset.transform.reseed(
                (self.seed * 1_000_003 + self.epoch * 97 + int(idx)) % (2 ** 31)
            )
        return self.dataset[int(idx)]

    def _ensure_workers(self):
        if self._workers or self.num_workers == 0:
            return
        # spawn by default: the parent holds JAX/XLA + cv2 thread pools and
        # fork from a multi-threaded process can deadlock the child
        ctx = mp.get_context(self.mp_context)
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        for _ in range(self.num_workers):
            # all workers share the loader seed: augmentation RNG is a pure
            # function of (seed, epoch, sample idx), independent of which
            # worker handles the sample
            p = ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self.seed, self._task_q, self._result_q),
                daemon=True,
            )
            p.start()
            self._workers.append(p)

    def shutdown(self):
        for _ in self._workers:
            self._task_q.put(None)
        for p in self._workers:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._workers = []

    def _sample_stream(self, all_jobs):
        """Yield the samples for ``all_jobs`` (dataset indices) in order.

        Inline when ``num_workers == 0``; otherwise windowed dispatch over the
        worker pool: at most ``max_inflight`` samples are queued or in the
        reorder buffer, and each consumed sample releases the next job."""
        if self.num_workers == 0:
            for idx in all_jobs:
                yield self._fetch(idx)
            return

        self._ensure_workers()
        self._gen += 1
        gen = self._gen
        dispatched = 0
        consumed = 0

        def pump():
            nonlocal dispatched
            while (dispatched < len(all_jobs)
                   and dispatched - consumed < self.max_inflight):
                self._task_q.put(
                    (gen, dispatched, all_jobs[dispatched], self.epoch)
                )
                dispatched += 1
            self.inflight_peak = max(self.inflight_peak, dispatched - consumed)

        pump()
        buf = {}
        for next_job in range(len(all_jobs)):
            while next_job not in buf:
                try:
                    rgen, jid, sample, err = self._result_q.get(
                        timeout=self._RESULT_POLL_S)
                except queue.Empty:
                    # A worker killed by the OS (OOM, segfault) can't
                    # report its job; without this check the epoch hangs
                    # forever on a silent get().
                    dead = [p for p in self._workers if not p.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f"DataLoader worker(s) died: "
                            f"{[p.exitcode for p in dead]}")
                    continue
                if rgen != gen:
                    continue  # leftover from an abandoned iterator
                if err is not None:
                    raise RuntimeError(f"DataLoader worker failed: {err}")
                buf[jid] = sample
            yield buf.pop(next_job)
            consumed += 1
            pump()

    def __iter__(self):
        indices = self._indices()
        nb = len(self)
        batches = []
        pad_counts = []
        for i in range(nb):
            b = list(indices[i * self.batch_size:(i + 1) * self.batch_size])
            pad = 0
            if self.pad_last and len(b) < self.batch_size:
                pad = self.batch_size - len(b)
                b = b + list(indices[:pad])
            batches.append(b)
            pad_counts.append(pad)

        def finalize(samples, pad):
            if pad:
                for s in samples[len(samples) - pad:]:
                    if "info" in s:
                        s["info"] = dict(s["info"], _pad=True)
            return self.collate_fn(samples)

        stream = self._sample_stream(
            [int(idx) for batch_idx in batches for idx in batch_idx])
        for batch_idx, pad in zip(batches, pad_counts):
            yield finalize([next(stream) for _ in batch_idx], pad)


class AspectRatioGroupedDataloader(DataLoader):
    """Groups samples into portrait/landscape buckets and emits homogeneous
    batches (reference data/dataloader.py:6-57). Registered for parity; unused
    by shipped configs.

    Samples ride the same multiprocess prefetch stream as ``DataLoader``
    (grouping consumes decoded samples in index order, so the windowed worker
    dispatch applies unchanged) with the deterministic (seed, epoch, idx)
    augmentation RNG. ``len()`` is an upper bound: bucket boundaries depend on
    the aspect-ratio sequence, so the exact batch count is only known after
    iteration."""

    def __iter__(self):
        groups = [[], []]
        indices = self._indices()
        for sample in self._sample_stream([int(i) for i in indices]):
            h, w = sample["image"].shape[:2]
            groups[0 if h > w else 1].append(sample)
            for g in groups:
                if len(g) >= self.batch_size:
                    yield self.collate_fn(g[: self.batch_size])
                    del g[: self.batch_size]
        leftover = groups[0] + groups[1]
        while leftover and not self.drop_last:
            yield self.collate_fn(leftover[: self.batch_size])
            leftover = leftover[self.batch_size:]
