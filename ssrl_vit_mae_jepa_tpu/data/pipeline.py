"""Host→device input pipeline: epoch batching + double-buffered prefetch.

Replaces the reference's 4-worker torch DataLoader + pinned-memory H2D copies
(``src/data.py:86-99``) with a TPU-idiomatic pipeline:

- the host only gathers raw **uint8 NHWC** batches from the memmap (4× less
  H2D traffic than float32) — all augmentation runs on device inside the
  jitted step (``ops.augment``),
- a background thread keeps ``depth`` batches in flight with
  ``jax.device_put`` against the batch ``NamedSharding``, so the transfer of
  batch k+1 overlaps with the compute of batch k,
- batch shapes are **static**: the final partial batch is padded and carries
  a per-example ``weight`` mask so losses/metrics stay exact (the reference's
  variable last batch would force an XLA recompile per epoch-end).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10


class HostLoader:
    """Deterministic epoch iterator over a dataset subset.

    Yields dict batches: ``image`` (B, 96, 96, 3) uint8, ``label`` (B,) int32,
    ``weight`` (B,) float32 (0.0 on padding rows).
    """

    def __init__(
        self,
        dataset: STL10,
        indices: np.ndarray,
        batch_size: int,
        shuffle: bool,
        seed: int = 73,
        pad_last: bool = True,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.pad_last = pad_last
        self.drop_last = drop_last
        #: host-side pipelining depth (mapped from the reference's
        #: ``num_workers`` knob by the loader factories)
        self.prefetch_depth = 2

    @property
    def num_examples(self) -> int:
        return len(self.indices)

    def __len__(self) -> int:
        n, b = len(self.indices), self.batch_size
        return n // b if self.drop_last else -(-n // b)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        idx = self.indices
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch_idx))
            idx = rng.permutation(idx)
        b = self.batch_size
        n_batches = len(self)
        for i in range(n_batches):
            sel = idx[i * b : (i + 1) * b]
            real = len(sel)
            if real < b and self.pad_last:
                pad = np.resize(sel, b - real)  # wrap-around fill, weight 0
                sel = np.concatenate([sel, pad])
            images = self.dataset.images_nhwc(sel)
            labels = self.dataset.labels[sel].astype(np.int32)
            weight = np.zeros(len(sel), np.float32)
            weight[:real] = 1.0
            yield {"image": images, "label": labels, "weight": weight}


def device_prefetch(
    iterator: Iterator[Dict[str, np.ndarray]],
    shardings: Optional[Dict[str, jax.sharding.Sharding]] = None,
    depth: int = 2,
) -> Iterator[Dict[str, jax.Array]]:
    """Background-thread prefetcher: device_put up to ``depth`` batches ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    err: list = []

    multihost = jax.process_count() > 1

    def put(batch):
        if shardings is None:
            return jax.device_put(batch)
        if multihost:
            from ssrl_vit_mae_jepa_tpu.parallel.multihost import global_batch

            return global_batch(batch, shardings)
        return {
            k: jax.device_put(v, shardings.get(k)) if shardings.get(k) is not None
            else jax.device_put(v)
            for k, v in batch.items()
        }

    stop = threading.Event()

    def worker():
        try:
            for batch in iterator:
                item = put(batch)
                # bounded put: if the consumer abandons the generator the
                # thread must exit instead of pinning `depth`+1 device
                # batches for the process lifetime
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # pragma: no cover - propagated below
            err.append(e)
        finally:
            # bounded put for the sentinel too: never DISCARD a queued
            # batch to make room (that silently drops the epoch's last
            # batches when the queue is full at iterator exhaustion) —
            # wait for the consumer, give up only if it abandoned us
            while True:
                try:
                    q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer done or abandoned (close()/GC/exception): release the
        # worker and drop its queued batches
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        # a worker put in flight during the drain can still land after it;
        # wait for the thread to exit, then re-drain so no device batch
        # stays pinned in the queue past generator teardown
        t.join(timeout=2.0)
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
