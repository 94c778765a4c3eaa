"""Host/device pipelining for the input pipeline.

The trainer's step k should never wait on host work for batch k+1
(SURVEY.md §7 hard part 4): a daemon thread runs the (masking) batch
iterator and the ``device_put`` ahead of consumption, keeping up to
``depth`` device-resident batches in a bounded queue. ``device_put`` is
async in jax, so the transfer for batch k+1 overlaps step k's compute;
the thread overlaps the *host-side* masking/slicing too.
"""

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_END = object()


def prefetch(iterator: Iterable,
             put_fn: Optional[Callable] = None,
             depth: int = 2) -> Iterator:
    """Iterate ``iterator`` in a daemon thread, applying ``put_fn`` (e.g.
    the trainer's device placement) in that thread, yielding results in
    order. At most ``depth`` items are in flight. Exceptions from the
    producer re-raise at the consuming ``next()`` call.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def produce():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                q.put(put_fn(item) if put_fn is not None else item)
            q.put(_END)
        except BaseException as exc:  # noqa: BLE001 — re-raised at consumer
            q.put(exc)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer stopped early (break / validation_steps cap): unblock and
        # retire the producer
        stop.set()
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=0.1)
