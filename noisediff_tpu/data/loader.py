"""Threaded prefetching batch loader.

Replaces the reference's torch DataLoader + create_dataloader policy
(dataloader/__init__.py:7-25): drop_last for training, per-process batch =
global batch / process_count under distribution, deterministic epoch-seeded
shuffle via ShardedIterSampler. Decoding runs in worker threads (rawpy and
numpy release the GIL) while the accelerator consumes the previous batch.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .sampler import ShardedIterSampler


def collate(samples) -> dict:
    """Stack a list of per-item dicts into a batch dict (numpy)."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(first, (int, np.integer)):
            out[key] = np.asarray(vals, np.int32)
        elif isinstance(first, (float, np.floating)):
            out[key] = np.asarray(vals, np.float32)
        else:  # strings and other metadata stay as lists
            out[key] = list(vals)
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 2,
        seed: int = 0,
        sampler: Optional[ShardedIterSampler] = None,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.sampler = sampler
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return list(self.sampler)
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx.tolist()

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 1 or len(batches) <= 1:
            for b in batches:
                yield collate([self.dataset[i] for i in b])
            return

        # thread pool fills an ordered bounded queue of collated batches
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                import concurrent.futures as cf

                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    futs = []
                    for b in batches:
                        if stop.is_set():
                            break
                        futs.append(
                            pool.submit(lambda bb: collate([self.dataset[i] for i in bb]), b)
                        )
                    for f in futs:
                        if stop.is_set():
                            break
                        out_q.put(("ok", f.result()))
            except BaseException as exc:  # propagate worker failures
                out_q.put(("err", exc))
            finally:
                out_q.put(("done", None))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = out_q.get()
                if kind == "done":
                    break
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()


def create_dataloader(
    dataset,
    *,
    phase: str,
    batch_size: int,
    num_workers: int,
    dist: bool = False,
    world_size: int = 1,
    rank: int = 0,
    seed: int = 0,
) -> DataLoader:
    """Policy parity with reference create_dataloader (dataloader/__init__.py:7-25):
    train => drop_last, sharded sampler when distributed (global batch divided
    across processes), shuffle otherwise; test => batch 1, no shuffle."""
    if phase == "train":
        if dist:
            assert batch_size % world_size == 0
            sampler = ShardedIterSampler(len(dataset), world_size, rank, seed=seed)
            return DataLoader(
                dataset,
                batch_size=batch_size // world_size,
                shuffle=False,
                drop_last=True,
                num_workers=num_workers,
                sampler=sampler,
                seed=seed,
            )
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=num_workers,
            seed=seed,
        )
    return DataLoader(dataset, batch_size=1, shuffle=False, num_workers=1, seed=seed)
