"""Device-side batch prefetching.

Wraps a host DataLoader so the next `depth` batches are already transferred
(sharded) onto the mesh while the current step runs — the host→HBM copy
overlaps compute instead of serializing with it (the reference blocked the
step on collate + H2D every iteration, engine.py:24/dataset collate).
"""

from __future__ import annotations

import collections
from typing import Iterator

from clip_event_tpu.parallel.mesh import shard_batch


def device_prefetch(loader, mesh, depth: int = 2) -> Iterator:
    """Yields (device_batch, meta) with `depth` transfers in flight."""
    queue = collections.deque()
    it = iter(loader)

    def enqueue(n):
        for _ in range(n):
            try:
                batch, meta = next(it)
            except StopIteration:
                return
            queue.append((shard_batch(batch, mesh), meta))

    enqueue(depth)
    while queue:
        item = queue.popleft()
        enqueue(1)
        yield item
