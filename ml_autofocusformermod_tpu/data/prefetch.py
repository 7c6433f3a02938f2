"""Device prefetch: overlap host batch production and H2D transfer with
device compute.

The reference hides input latency behind torch's DataLoader worker pool +
CUDA's async H2D copies (``data/build.py:33-46``). On TPU the equivalent
idiom (cf. ``flax.jax_utils.prefetch_to_device``) is to run the host side
of the pipeline — decode/augment iteration AND the ``shard_batch``
device_put — a fixed number of steps ahead on a background thread. JAX
dispatch is async, so once the transfer is *enqueued* ahead of time the
train step never waits on the host; without this, each step's H2D sits
serially between two dispatches in the epoch loop.

Depth 2 is the sweet spot: one batch in flight on the wire while the
device chews the previous one. More only adds HBM pressure.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

from ..parallel import mesh as pmesh

__all__ = ["prefetch_to_mesh"]

_END = object()


def prefetch_to_mesh(
    iterable: Iterable,
    mesh,
    size: int = 2,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Iterate ``iterable``, yielding batches already sharded over ``mesh``.

    ``transform`` (optional) runs on the producer thread on the raw host
    batch before the device put (e.g. eval-shape padding). Exceptions from
    the producer (loader or transform) re-raise in the consumer at the
    point of ``next()``; the producer thread is a daemon, so an abandoned
    iterator (early ``break``) cannot hang interpreter exit — it parks on
    the bounded queue and dies with the process.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, size))

    def produce() -> None:
        try:
            for batch in iterable:
                if transform is not None:
                    batch = transform(batch)
                q.put(pmesh.shard_batch(mesh, batch))
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised by consumer
            q.put(e)

    t = threading.Thread(target=produce, daemon=True, name="prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
