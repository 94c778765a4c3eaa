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


def fetch_pipelined(items: Iterable, dispatch: Callable, fetch: Callable,
                    workers: int = 2) -> Iterator:
    """The output-side twin of :func:`prefetch`: ``dispatch(item)`` runs
    on the CALLING thread (jax dispatch order must be deterministic — on
    multi-host every process must enqueue the same computations in the
    same order) while ``fetch(token)`` — the device->host sync — runs on
    ``workers`` threads. Yields fetch results in dispatch order.

    On a high-latency link (the tunneled v5e pays ~28 ms per fetch round
    trip vs ~9 ms of eval compute) this overlaps each batch's fetch with
    the next batches' dispatch: measured 37.3 -> 22.0 ms/batch for
    ML-20M-scale evaluation and 81.5 -> 31.4 ms/batch for bulk serving.
    ``workers=0`` degrades to strictly sequential dispatch->fetch.
    """
    if workers <= 0:
        for item in items:
            yield fetch(dispatch(item))
        return
    import concurrent.futures as cf
    pending = []
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        for item in items:
            token = dispatch(item)
            pending.append(ex.submit(fetch, token))
            while pending and pending[0].done():
                yield pending.pop(0).result()
        for f in pending:
            yield f.result()
