"""Grain streaming input pipeline (optional fast path).

The BASELINE north star calls for the prep scripts to "collapse into a
streaming Grain/tf.data loader with on-device feature extraction". This
module adapts :class:`~mm_s2ut.data.dataset.SpeechToSpeechDataset` to a
Grain `IterDataset`: Grain worker processes do host-side decode+collate
of bucketed index batches; the device fbank frontend stays in the task
layer (on-device). Falls back cleanly when grain is unavailable — the
built-in prefetch-thread pipeline (data/prefetch.py) is the default and
is sufficient because the heavy decode already runs GIL-free in C++.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def grain_available() -> bool:
    try:
        import grain  # noqa: F401

        return True
    except Exception:
        return False


class _BatchSource:
    """Random-access source of (bucket, indices) batch descriptors for one
    epoch — Grain shards/prefetches over this."""

    def __init__(self, dataset, batcher, epoch: int, shuffle: bool):
        self.dataset = dataset
        self.batches: List[Tuple[Any, np.ndarray]] = list(
            batcher.epoch(epoch, shuffle=shuffle)
        )

    def __len__(self) -> int:
        return len(self.batches)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        bucket, idx = self.batches[i]
        batch = self.dataset.collate_native(idx, bucket.src_len, bucket.tgt_len)
        if batch is None:
            items = [self.dataset[int(j)] for j in idx]
            batch = self.dataset.collate(
                items, src_pad=bucket.src_len, tgt_pad=bucket.tgt_len
            )
        return batch


def grain_batch_iterator(
    dataset,
    batcher,
    epoch: int = 0,
    shuffle: bool = True,
    num_workers: int = 2,
    prefetch: int = 4,
) -> Iterator[Dict[str, np.ndarray]]:
    """Host batches via Grain workers (decode+collate off the main
    process), in the same order/format as the built-in pipeline."""
    import grain.python as grain_py

    source = _BatchSource(dataset, batcher, epoch, shuffle)
    sampler = grain_py.IndexSampler(
        num_records=len(source),
        shard_options=grain_py.NoSharding(),
        shuffle=False,  # order fixed by the (seeded) batcher
        num_epochs=1,
    )
    loader = grain_py.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[],
        worker_count=num_workers,
        read_options=grain_py.ReadOptions(prefetch_buffer_size=prefetch),
    )
    yield from loader
