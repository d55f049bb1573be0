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
  * Batches travel through POSIX shared memory, not pickled pipes: each
    worker owns `prefetch` fixed-size SHM slots, writes every batch array
    into its slot (one copy), and sends only (shape, dtype, offset) metadata
    over the queue. The main process yields zero-copy numpy views into the
    slot; the slot is recycled when the NEXT batch is requested, i.e. a
    yielded batch is valid until the following __next__ — the training loop
    transfers it to device immediately, so no extra host copy ever happens.
    A batch that overflows its slot (not expected with bucketed shapes)
    falls back to the pickled path transparently.
"""

import multiprocessing as mp
import os
import queue as queue_mod
import sys
import threading

import numpy as np

# Default SHM slot: fits a bucketed batch of 16 uint8 1344x1344 images plus
# padded gt fields with room to spare; build.py passes an exact bound.
_DEFAULT_SLOT_BYTES = 128 * 1024 * 1024


def _write_slot(buf, out):
    """Pack a dict of numpy arrays into an SHM buffer; returns metadata
    (or None if it does not fit)."""
    off = 0
    meta = {}
    for k, v in out.items():
        v = np.ascontiguousarray(v)
        if off + v.nbytes > len(buf):
            return None
        dst = np.frombuffer(buf, dtype=v.dtype, count=v.size, offset=off)
        np.copyto(dst.reshape(v.shape), v)
        meta[k] = (v.shape, v.dtype.str, off)
        off += v.nbytes
    return meta


def _read_slot(buf, meta):
    return {
        k: np.frombuffer(buf, dtype=np.dtype(d), offset=off,
                         count=int(np.prod(shape)) if shape else 1
                         ).reshape(shape)
        for k, (shape, d, off) in meta.items()
    }


def _worker_loop(dataset, collator, factory, task_q, result_q, slot_names,
                 worker_seed):
    import random as _random

    from multiprocessing import shared_memory

    # fork inherits the parent's RNG state: without reseeding, every worker
    # applies IDENTICAL augmentation draws (scale/flip/jitter), collapsing
    # augmentation diversity by a factor of num_workers (torch DataLoader
    # seeds base_seed + worker_id for the same reason)
    _random.seed(worker_seed)
    np.random.seed(worker_seed % (2 ** 32))

    if dataset is None:
        dataset, collator = factory()
    slots = [shared_memory.SharedMemory(name=n) for n in slot_names]
    warned_overflow = False
    try:
        while True:
            task = task_q.get()
            if task is None:
                return
            seq, slot_id, batch_idx = task
            try:
                items = [dataset[i] for i in batch_idx]
                out = collator(items)
                try:
                    meta = (
                        _write_slot(slots[slot_id].buf, out)
                        if isinstance(out, dict) else None
                    )
                except (TypeError, ValueError):  # non-array batch contents
                    meta = None
                if meta is None:  # overflow / non-dict: pickled fallback
                    if isinstance(out, dict) and not warned_overflow:
                        # no silent caps: an overflow (e.g. float32 batches
                        # with a uint8-sized slot) degrades EVERY batch to
                        # the pickled path — say so once
                        warned_overflow = True
                        sys.stderr.write(
                            "maskrcnn_tpu loader: collated batch overflows "
                            "the {} MB SHM slot; using the pickled fallback "
                            "(pass a larger slot_bytes to DataLoader)\n".format(
                                slots[slot_id].size >> 20
                            )
                        )
                    result_q.put((seq, slot_id, None, out, None))
                else:
                    result_q.put((seq, slot_id, meta, None, None))
            except Exception as e:  # surface worker errors to the main process
                result_q.put(
                    (seq, slot_id, None, None,
                     "{}: {}".format(type(e).__name__, e))
                )
    finally:
        for s in slots:
            s.close()


class DataLoader:
    """Prefetching loader over (dataset, batch_sampler, collator).

    factory: optional zero-arg picklable callable returning
    (dataset, collator) — required only for spawn-mode workers.
    """

    def __init__(self, dataset, batch_sampler, collator, num_workers=0,
                 prefetch_per_worker=2, factory=None,
                 slot_bytes=_DEFAULT_SLOT_BYTES):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collator = collator
        self.num_workers = max(0, int(num_workers))
        self.prefetch = max(1, prefetch_per_worker)
        self.factory = factory
        self.slot_bytes = int(slot_bytes)

    def __len__(self):
        return len(self.batch_sampler)

    # -- inline ---------------------------------------------------------

    def _iter_inline(self):
        for batch_idx in self.batch_sampler:
            items = [self.dataset[i] for i in batch_idx]
            yield self.collator(items)

    # -- multi-process ----------------------------------------------------

    def _iter_workers(self):
        """Eagerly allocates SHM and starts workers (so environments that
        forbid either raise HERE, inside __iter__'s try, and fall back to
        the threaded loader), then returns the streaming generator."""
        from multiprocessing import shared_memory

        start = os.environ.get("MASKRCNN_TPU_WORKER_START", "fork")
        if start == "spawn" and self.factory is None:
            start = "fork"
        ctx = mp.get_context(start)
        n = self.num_workers
        # the held-slot recycling protocol needs >= 2 slots per worker to
        # keep a task in flight while the caller consumes a batch
        prefetch = max(2, self.prefetch)
        task_qs = [ctx.SimpleQueue() for _ in range(n)]
        result_q = ctx.Queue()  # not SimpleQueue: liveness checks need timeout
        # per-worker SHM slot ring: worker w, slot s <-> shms[w][s]
        shms = [
            [
                shared_memory.SharedMemory(create=True, size=self.slot_bytes)
                for _ in range(prefetch)
            ]
            for _ in range(n)
        ]
        payload = (None, None, self.factory) if start == "spawn" else (
            self.dataset, self.collator, None
        )
        import random as _random

        base_seed = _random.getrandbits(48)
        workers = []
        try:
            for w in range(n):
                p = ctx.Process(
                    target=_worker_loop,
                    args=payload + (
                        task_qs[w], result_q, [s.name for s in shms[w]],
                        base_seed + w,
                    ),
                    daemon=True,
                )
                p.start()
                workers.append(p)
        except BaseException:
            for p in workers:
                p.terminate()
            for row in shms:
                for s in row:
                    s.close()
                    s.unlink()
            raise
        return self._worker_stream(
            prefetch, task_qs, result_q, shms, workers
        )

    def _worker_stream(self, prefetch, task_qs, result_q, shms, workers):
        n = self.num_workers
        sampler_it = enumerate(iter(self.batch_sampler))
        free = [list(range(prefetch)) for _ in range(n)]  # per worker
        task_of = {}  # seq -> (worker, slot)
        pending = {}  # seq -> (meta, collated) arrived out of order
        held = None  # (worker, slot) of the batch the caller is consuming

        def dispatch():
            # one task to any worker with a free slot; False if none/exhausted
            for w in range(n):
                if free[w]:
                    try:
                        seq, batch_idx = next(sampler_it)
                    except StopIteration:
                        return False
                    slot = free[w].pop()
                    task_of[seq] = (w, slot)
                    task_qs[w].put((seq, slot, list(batch_idx)))
                    return True
            return None  # all busy

        def get_result():
            # bounded wait + worker-liveness check: a worker killed by the
            # kernel (OOM, SIGBUS on /dev/shm exhaustion) must not hang the
            # training loop silently
            while True:
                try:
                    return result_q.get(timeout=10.0)
                except queue_mod.Empty:
                    for w in workers:
                        if not w.is_alive():
                            raise RuntimeError(
                                "data worker pid {} died (exitcode {}) — "
                                "likely OOM or /dev/shm exhaustion; lower "
                                "DATALOADER.NUM_WORKERS or the loader "
                                "slot_bytes".format(w.pid, w.exitcode)
                            )

        try:
            exhausted = False
            while not exhausted:  # prime: fill every slot
                r = dispatch()
                if r is False:
                    exhausted = True
                elif r is None:
                    break
            next_seq = 0
            while task_of or pending:
                while next_seq in pending:
                    meta, collated = pending.pop(next_seq)
                    w, slot = task_of.pop(next_seq)
                    if meta is not None:
                        collated = _read_slot(shms[w][slot].buf, meta)
                    # recycle the previously yielded batch's slot, hand out
                    # this one; views stay valid until the next __next__ (the
                    # consumer must finish its device transfer — or copy —
                    # before asking for the next batch; engine/trainer.py
                    # blocks on the transfer for exactly this reason)
                    if held is not None:
                        hw, hs = held
                        free[hw].append(hs)
                        if not exhausted and dispatch() is False:
                            exhausted = True
                    held = (w, slot)
                    yield collated
                    next_seq += 1
                if not task_of and not pending:
                    break
                seq, slot_id, meta, collated, err = get_result()
                if err is not None:
                    raise RuntimeError(
                        "data worker failed on batch {}: {}".format(seq, err)
                    )
                pending[seq] = (meta, collated)
        finally:
            for q in task_qs:
                q.put(None)
            for w in workers:
                w.join(timeout=5)
                if w.is_alive():
                    w.terminate()
            for row in shms:
                for s in row:
                    try:
                        s.close()
                    except BufferError:
                        # caller still holds views into the final batch; the
                        # mapping is reclaimed when those arrays are GC'd
                        pass
                    try:
                        s.unlink()
                    except FileNotFoundError:
                        pass

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
