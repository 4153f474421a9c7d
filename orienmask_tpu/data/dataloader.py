"""Multi-process prefetching data loader.

Our own runtime component (the reference leans on torch's DataLoader): worker
processes pull sample indices from a task queue, run dataset.__getitem__ +
transform, and push transformed samples back; the parent assembles batches with
the collate fn. Supports:

  * epoch-seeded shuffling (``set_epoch``, like DistributedSampler.set_epoch),
  * rank/world sharding for data-parallel hosts,
  * worker-seeded augmentation RNG (deterministic given (seed, epoch, worker)).

Workers are only forked when ``num_workers > 0``; otherwise loading is inline
(useful for tests and debugging).
"""

import multiprocessing as mp

import numpy as np


class _Worker(mp.Process):
    def __init__(self, dataset, base_seed, task_q, result_q):
        super().__init__(daemon=True)
        self.dataset = dataset
        self.base_seed = base_seed
        self.task_q = task_q
        self.result_q = result_q

    def run(self):
        # Workers are forked from a parent that may hold cv2/XLA thread pools;
        # cv2's internal pool does not survive fork — disable it (per-op numpy
        # work dominates anyway, and the parent machine is single-core).
        try:
            import cv2
            cv2.setNumThreads(0)
        except Exception:
            pass
        while True:
            task = self.task_q.get()
            if task is None:
                break
            job_id, idx, epoch = task
            if getattr(self.dataset, "transform", None) is not None and \
                    hasattr(self.dataset.transform, "reseed"):
                self.dataset.transform.reseed(
                    (self.base_seed * 1_000_003 + epoch * 97 + idx) % (2 ** 31)
                )
            try:
                sample = self.dataset[idx]
                self.result_q.put((job_id, sample, None))
            except Exception as e:  # surface worker errors in the parent
                self.result_q.put((job_id, None, repr(e)))


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=0,
                 collate_fn=None, drop_last=False, pad_last=False, seed=0,
                 rank=0, world_size=1, **unused):
        # pad_last: wrap-pad the final batch to full batch_size (keeps compiled
        # shapes static); padded samples get info['_pad']=True so eval skips them.
        # All sample jobs of an epoch are dispatched to the workers up front, so
        # prefetch depth is bounded only by worker throughput (the queues hold
        # transformed samples; at COCO sizes this is a few GB of headroom max).
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
        self.epoch = 0
        self._workers = []
        self._task_q = None
        self._result_q = None

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
        self._task_q = mp.Queue()
        self._result_q = mp.Queue()
        for _ in range(self.num_workers):
            # all workers share the loader seed: augmentation RNG is a pure
            # function of (seed, epoch, sample idx), independent of which
            # worker handles the sample
            p = _Worker(self.dataset, self.seed, self._task_q, self._result_q)
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

        if self.num_workers == 0:
            for batch_idx in batches:
                samples = [self._fetch(idx) for idx in batch_idx]
                yield finalize(samples, pad_counts.pop(0))
            return

        self._ensure_workers()
        # dispatch all jobs up front; assemble in order with a reorder buffer
        job = 0
        for batch_idx in batches:
            for idx in batch_idx:
                self._task_q.put((job, int(idx), self.epoch))
                job += 1
        buf = {}
        next_job = 0
        for batch_idx in batches:
            samples = []
            for _ in batch_idx:
                while next_job not in buf:
                    jid, sample, err = self._result_q.get()
                    if err is not None:
                        raise RuntimeError(f"DataLoader worker failed: {err}")
                    buf[jid] = sample
                samples.append(buf.pop(next_job))
                next_job += 1
            yield finalize(samples, pad_counts.pop(0))


class AspectRatioGroupedDataloader(DataLoader):
    """Groups samples into portrait/landscape buckets and emits homogeneous
    batches (reference data/dataloader.py:6-57). Registered for parity; unused
    by shipped configs.

    Samples load inline (single process — grouping needs the decoded image
    shape before batching, so the prefetch pool does not apply) with the same
    deterministic (seed, epoch, idx) augmentation RNG as ``DataLoader``.
    ``len()`` is an upper bound: bucket boundaries depend on the aspect-ratio
    sequence, so the exact batch count is only known after iteration."""

    def __iter__(self):
        groups = [[], []]
        indices = self._indices()
        for idx in indices:
            sample = self._fetch(idx)
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
