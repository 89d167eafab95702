"""Host->device prefetching input pipeline.

The reference relies on ``torch.utils.data.DataLoader(num_workers=8,
pin_memory=True)`` (`/root/reference/models/baseline.py:1256-1262`). The
TPU-native equivalent: a thread pool decodes/augments on host CPU while a
double-buffered ``jax.device_put`` keeps the next batch in flight, so the
device never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax
import numpy as np


def threaded_batches(make_iter: Callable[[], Iterator[dict]],
                     num_threads: int = 4, buffer_size: int = 8
                     ) -> Iterator[dict]:
    """Run ``make_iter()`` iterators in ``num_threads`` worker threads.

    Ordering across threads is nondeterministic (like a torch DataLoader
    with workers>1); each thread owns an independent iterator, so callers
    should pass sharded/strided iterator factories for exact-once semantics
    or accept resampling (fine for the infinite shuffled train stream).
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()
    _SENTINEL = object()

    def worker(tid: int) -> None:
        try:
            for item in make_iter():
                if stop.is_set():
                    return
                q.put(item)
        finally:
            q.put(_SENTINEL)

    threads = [threading.Thread(target=worker, args=(t,), daemon=True)
               for t in range(num_threads)]
    for t in threads:
        t.start()

    finished = 0
    try:
        while finished < num_threads:
            item = q.get()
            if item is _SENTINEL:
                finished += 1
                continue
            yield item
    finally:
        stop.set()


def device_prefetch(batches: Iterator[dict], size: int = 2,
                    sharding=None) -> Iterator[dict]:
    """Keep ``size`` batches resident on device ahead of consumption."""
    buf = []

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in batches:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


def synthetic_batches(batch_size: int, img_height: int, img_width: int,
                      num_source: int = 2, seed: int = 0,
                      translate: bool = True) -> Iterator[dict]:
    """Infinite synthetic KITTI-like stream (for benches/smoke training).

    Sources are sub-pixel translated copies of the target so the photometric
    loss has real signal and training visibly descends.
    """
    rng = np.random.RandomState(seed)
    k = np.array([[img_width * 0.58, 0, img_width / 2.0],
                  [0, img_height * 1.92, img_height / 2.0],
                  [0, 0, 1]], np.float32)
    while True:
        tgt = rng.randint(0, 256, (batch_size, img_height, img_width, 3),
                          dtype=np.uint8)
        if translate:
            src = np.concatenate(
                [np.roll(tgt, 2, axis=2), np.roll(tgt, -2, axis=2)], axis=-1)
        else:
            src = rng.randint(
                0, 256,
                (batch_size, img_height, img_width, 3 * num_source),
                dtype=np.uint8)
        yield {"tgt": tgt, "src": src,
               "intrinsics": np.tile(k[None], (batch_size, 1, 1))}
