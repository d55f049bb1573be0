"""Multi-process data loader.

Reference semantics: torch DataLoader with `num_workers` worker processes
(reference data/build.py:160-182 passes DATALOADER.NUM_WORKERS). This is a
from-scratch equivalent shaped for the TPU input problem (SURVEY.md hard
part #6): a single Python thread cannot decode+resize+rasterize fast enough
to feed a chip, so fetching AND collation both run in worker processes and
the main process only unpickles ready-made fixed-shape numpy batches.

Design:
  * `num_workers == 0` -> fully inline (deterministic, used by tests).
  * `num_workers >= 1` -> that many `fork` workers (children never touch
    JAX; `MASKRCNN_TPU_WORKER_START=spawn` rebuilds the dataset per worker
    via the pickled factory instead, for environments where forking the
    TPU-client process is not allowed).
  * The main process walks the batch sampler and round-robins (seq, indices)
    tasks over per-worker queues; results are re-ordered by seq so the
    stream is identical to the inline loader's, regardless of worker timing.
  * Workers inherit/construct the collator, so per-worker state (the mask
    patch cache, see collate.BatchCollator) amortizes across epochs.
"""

import multiprocessing as mp
import os
import queue as queue_mod
import threading


def _worker_loop(dataset, collator, factory, task_q, result_q):
    if dataset is None:
        dataset, collator = factory()
    while True:
        task = task_q.get()
        if task is None:
            return
        seq, batch_idx = task
        try:
            items = [dataset[i] for i in batch_idx]
            result_q.put((seq, collator(items), None))
        except Exception as e:  # surface worker errors to the main process
            result_q.put((seq, None, "{}: {}".format(type(e).__name__, e)))


class DataLoader:
    """Prefetching loader over (dataset, batch_sampler, collator).

    factory: optional zero-arg picklable callable returning
    (dataset, collator) — required only for spawn-mode workers.
    """

    def __init__(self, dataset, batch_sampler, collator, num_workers=0,
                 prefetch_per_worker=2, factory=None):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collator = collator
        self.num_workers = max(0, int(num_workers))
        self.prefetch = max(1, prefetch_per_worker)
        self.factory = factory

    def __len__(self):
        return len(self.batch_sampler)

    # -- inline ---------------------------------------------------------

    def _iter_inline(self):
        for batch_idx in self.batch_sampler:
            items = [self.dataset[i] for i in batch_idx]
            yield self.collator(items)

    # -- multi-process ----------------------------------------------------

    def _iter_workers(self):
        start = os.environ.get("MASKRCNN_TPU_WORKER_START", "fork")
        if start == "spawn" and self.factory is None:
            start = "fork"
        ctx = mp.get_context(start)
        n = self.num_workers
        task_qs = [ctx.SimpleQueue() for _ in range(n)]
        result_q = ctx.SimpleQueue()
        payload = (None, None, self.factory) if start == "spawn" else (
            self.dataset, self.collator, None
        )
        workers = [
            ctx.Process(
                target=_worker_loop,
                args=payload + (task_qs[w], result_q),
                daemon=True,
            )
            for w in range(n)
        ]
        for w in workers:
            w.start()

        sampler_it = enumerate(iter(self.batch_sampler))
        pending = {}  # seq -> collated (arrived out of order)
        try:
            in_flight = 0
            dispatched = 0
            next_seq = 0
            exhausted = False
            # prime the pipeline
            while not exhausted and in_flight < n * self.prefetch:
                try:
                    seq, batch_idx = next(sampler_it)
                except StopIteration:
                    exhausted = True
                    break
                task_qs[seq % n].put((seq, list(batch_idx)))
                dispatched += 1
                in_flight += 1
            while next_seq < dispatched or not exhausted:
                while next_seq in pending:
                    yield pending.pop(next_seq)
                    next_seq += 1
                if next_seq >= dispatched and exhausted:
                    break
                seq, collated, err = result_q.get()
                if err is not None:
                    raise RuntimeError(
                        "data worker failed on batch {}: {}".format(seq, err)
                    )
                in_flight -= 1
                pending[seq] = collated
                if not exhausted:
                    try:
                        s2, batch_idx = next(sampler_it)
                        task_qs[s2 % n].put((s2, list(batch_idx)))
                        dispatched += 1
                        in_flight += 1
                    except StopIteration:
                        exhausted = True
        finally:
            for q in task_qs:
                q.put(None)
            for w in workers:
                w.join(timeout=5)
                if w.is_alive():
                    w.terminate()

    # -- threaded fallback (sandboxes that forbid subprocesses) -----------

    def _iter_threaded(self):
        q = queue_mod.Queue(maxsize=self.num_workers * self.prefetch)

        def produce():
            try:
                for batch_idx in self.batch_sampler:
                    items = [self.dataset[i] for i in batch_idx]
                    q.put(self.collator(items))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    def __iter__(self):
        if self.num_workers == 0:
            return self._iter_inline()
        try:
            return self._iter_workers()
        except (OSError, PermissionError):
            return self._iter_threaded()
