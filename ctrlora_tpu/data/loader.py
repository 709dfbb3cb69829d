"""Threaded prefetching data loader producing device-ready batches.

Replaces the reference's torch DataLoader + collate
(scripts/train_ctrlora_*.py:57-60, datasets/dataset_collate.py): worker
threads decode/crop images while the TPU trains, prompts are tokenized on
the host, and each host materializes only its slice of the global batch
(deterministic per-host sharding instead of DistributedSampler).

Batch dict: jpg [B,H,W,3] f32, hint [B,H,W,3] f32, token_ids [B,77] i32,
task_idx [B] i32.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from ctrlora_tpu.utils.tokenizer import CLIPTokenizer, default_tokenizer


class Loader:
    def __init__(
        self,
        datasets: Sequence,  # list of dataset objects (one per task)
        schedule,  # MultiTaskSchedule / SingleTaskSchedule
        tokenizer: Optional[CLIPTokenizer] = None,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        host_id: int = 0,
        host_count: int = 1,
        max_length: Optional[int] = None,
    ):
        self.datasets = list(datasets)
        self.schedule = schedule
        self.tokenizer = tokenizer or default_tokenizer()
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self.host_id = host_id
        self.host_count = host_count
        self.max_length = max_length
        gb = schedule.batch_size
        assert gb % host_count == 0, "global batch must divide across hosts"
        self.local_batch = gb // host_count

    def _load_batch(self, step: int) -> Dict[str, np.ndarray]:
        task, indices = self.schedule.batch_for_step(step)
        lo = self.host_id * self.local_batch
        local = indices[lo : lo + self.local_batch]
        ds = self.datasets[task]
        examples = []
        for j, idx in enumerate(local):
            # per-example rng: deterministic in (seed, step, global position)
            rng = np.random.default_rng((self.seed, 0xDA7A, step, lo + j))
            examples.append(ds.get(int(idx), rng))
        ids = self.tokenizer(
            [e["txt"] for e in examples], max_length=self.max_length
        )
        # stack every array field the dataset emits: jpg/hint for pixel
        # datasets, jpg_moments/hint_moments for latent-cached ones
        batch = {
            k: np.stack([e[k] for e in examples])
            for k in examples[0]
            if k != "txt"
        }
        batch["token_ids"] = ids
        batch["task_idx"] = np.full((len(examples),), task, np.int32)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iterate(0)

    def iterate(self, start_step: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite iterator from a given step (resume-friendly)."""
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        pending: "queue.Queue" = queue.Queue()
        step = start_step
        try:
            for _ in range(self.prefetch):
                pending.put((step, pool.submit(self._load_batch, step)))
                step += 1
            while True:
                s, fut = pending.get()
                pending.put((step, pool.submit(self._load_batch, step)))
                step += 1
                yield fut.result()
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                # generator finalization can run during interpreter teardown,
                # where concurrent.futures' module globals are already None
                pass
