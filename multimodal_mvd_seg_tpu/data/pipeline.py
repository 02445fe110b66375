"""Host-side batch production with device prefetch.

Replaces the reference's batchgenerators NonDetMultiThreadedAugmenter worker
processes (reference custom_transforms/limited_length_multithreaded_augmenter.py
+ nnUNetTrainer.get_dataloaders :595-645). Here the host only *samples patches*
(cheap memory-mapped slicing in threads); all augmentation math runs on-device
inside the jitted train step. Batches are staged onto devices ahead of time
(double-buffered) with an optional sharding so the global batch lands already
distributed across the mesh."""

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from .sampler import PatchSampler


class PrefetchLoader:
    """Infinite iterator of device-resident (data, seg) batches."""

    def __init__(self, sampler: PatchSampler, seed: int = 0,
                 num_threads: int = 4, prefetch: int = 4,
                 sharding=None):
        self.sampler = sampler
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.sharding = sharding
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = []
        self._step_lock = threading.Lock()
        self._step = 0
        self._started = False
        self._worker_error = None

    def _worker(self, wid: int):
        try:
            while not self._stop.is_set():
                with self._step_lock:
                    step = self._step
                    self._step += 1
                rng = np.random.RandomState(
                    (self.seed * 1000003 + step) % (2 ** 31 - 1))
                batch = self.sampler.generate_batch(rng)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # liveness: surface worker deaths
            self._worker_error = e

    def check_workers_alive_and_busy(self):
        """Raise if a producer thread died (equivalent of the reference's
        check_workers_alive_and_busy / 'worker is 6 feet under' RuntimeError,
        utilities/file_path_utilities.py + default_preprocessor.py:248-256)."""
        if self._worker_error is not None:
            raise RuntimeError(
                "a background data worker died") from self._worker_error
        if self._started and self._threads and \
                not any(t.is_alive() for t in self._threads):
            raise RuntimeError("all background data workers are dead")

    def start(self):
        if self._started:
            return
        self._started = True
        for i in range(self.num_threads):
            t = threading.Thread(target=self._worker, args=(i,), daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self):
        self._stop.set()
        # drain so workers blocked on put() can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self) -> Iterator:
        self.start()
        while True:
            try:
                batch = self._q.get(timeout=60.0)
            except queue.Empty:
                self.check_workers_alive_and_busy()
                continue
            data, seg, *rest = batch
            if self.sharding is not None and jax.process_count() > 1:
                # multi-host: this process produced only ITS slice of the
                # global batch (the trainer sizes the sampler per host);
                # assemble the global sharded array from the local shard —
                # the jax.distributed equivalent of the reference's
                # per-rank DDP batch partition (nnUNetTrainer.py:304-349)
                data = jax.make_array_from_process_local_data(
                    self.sharding, data)
                seg = jax.make_array_from_process_local_data(
                    self.sharding, seg)
            elif self.sharding is not None:
                data = jax.device_put(data, self.sharding)
                seg = jax.device_put(seg, self.sharding)
            else:
                data = jax.device_put(data)
                seg = jax.device_put(seg)
            yield (data, seg, *rest) if rest else (data, seg)

    def __next__(self):
        if not hasattr(self, "_iter"):
            self._iter = iter(self)
        return next(self._iter)


class LimitedLenWrapper:
    """Iterator with a fixed number of steps per epoch (reference
    LimitedLenWrapper over the multithreaded augmenter)."""

    def __init__(self, loader, num_steps: int):
        self.loader = iter(loader)
        self.num_steps = num_steps

    def __iter__(self):
        for _ in range(self.num_steps):
            yield next(self.loader)
