"""Process-parallel input production for the detection pipeline.

The reference parallelizes decode/augment/label inside tf.data's C++
runtime (`/root/reference/src/dataloader.py:251-266,487-526`:
``parallel interleave`` + ``map(num_parallel_calls)``). The rebuild's host
work is numpy/cv2, so true parallelism needs worker *processes*: this
module fans one `InputReader` out over ``num_proc`` forked workers, each
producing the round-robin share of batches whose global sequence number is
``wid (mod num_proc)``. Every worker replays the identical RNG stream
(`InputReader._batches(wid, nproc)`), so the in-order merge is
bit-identical to single-process mode — determinism is preserved.

Workers run numpy/cv2 only (no JAX calls): with ``fast_input`` the anchor
labeling happens on-device inside the jitted train step, and otherwise
`build_labels` executes on the parent. Fork is used on POSIX (the cheap,
PyTorch-DataLoader-style default; the inherited JAX/TPU client is never
touched in the children).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as queuelib
from typing import Iterator, Optional

_END = "__udal_end__"


def _worker_main(reader, config, batch_size: int, wid: int, nproc: int,
                 q) -> None:
    """Worker body: produce this worker's batch subsequence into `q`.

    host_labels=False keeps workers JAX-free (compact groundtruth only);
    the parent finalizes per-level targets where needed.
    """
    try:
        for batch in reader._batches(config, batch_size, wid=wid,
                                     nproc=nproc, host_labels=False):
            q.put(batch)
        q.put(_END)
    except BaseException as e:  # noqa: BLE001 - surfaced on the consumer
        try:
            q.put(("__udal_error__", f"{type(e).__name__}: {e}"))
        except Exception:  # noqa: BLE001 - queue already closed
            pass


class MultiProcessProducer:
    """Ordered round-robin merge of ``num_proc`` worker processes.

    Iterating yields batches in exactly the order `InputReader._batches`
    would produce them single-process. `close()` (also called on GC and
    generator finalization in `InputReader.__call__`) terminates workers.
    """

    def __init__(self, reader, config, batch_size: int, num_proc: int,
                 prefetch: int = 2, start_method: Optional[str] = None):
        self._config = config
        self._finalize = not reader._fast_input
        start_method = start_method or os.environ.get(
            "UDAL_MP_START", "fork" if os.name == "posix" else "spawn")
        ctx = mp.get_context(start_method)
        self._queues = [ctx.Queue(maxsize=max(1, prefetch))
                        for _ in range(num_proc)]
        self._procs = []
        for wid in range(num_proc):
            p = ctx.Process(
                target=_worker_main,
                args=(reader, config, batch_size, wid, num_proc,
                      self._queues[wid]),
                daemon=True, name=f"udal-input-{wid}")
            p.start()
            self._procs.append(p)
        self._num_proc = num_proc
        self._closed = False

    def __iter__(self) -> Iterator:
        seq = 0
        while True:
            q = self._queues[seq % self._num_proc]
            while True:
                try:
                    item = q.get(timeout=5.0)
                    break
                except queuelib.Empty:
                    w = self._procs[seq % self._num_proc]
                    if not w.is_alive():
                        raise RuntimeError(
                            f"input worker {seq % self._num_proc} died "
                            f"(exitcode {w.exitcode})") from None
            if isinstance(item, str) and item == _END:
                return
            if isinstance(item, tuple) and len(item) == 2 and \
                    isinstance(item[0], str) and item[0] == "__udal_error__":
                raise RuntimeError(f"input worker failed: {item[1]}")
            if self._finalize:
                item = self._build_host_labels(item)
            yield item
            seq += 1

    def _build_host_labels(self, batch):
        """Classic-mode finalization in the parent: compact worker
        groundtruth → per-level anchor targets (`data.labels.build_labels`
        is jitted JAX and must not run in a forked worker)."""
        import numpy as np

        from udal_tpu.data.labels import build_labels

        images, labels = batch
        built = build_labels(self._config, labels.pop("gt_boxes"),
                             labels.pop("gt_classes"),
                             labels.pop("gt_pseudo", None))
        labels.update({k: np.asarray(v) for k, v in built.items()})
        return images, labels

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for p in self._procs:
            if p.is_alive():
                p.terminate()
        for p in self._procs:
            p.join(timeout=2.0)
        for q in self._queues:
            try:
                q.close()
                q.cancel_join_thread()
            except Exception:  # noqa: BLE001 - best-effort teardown
                pass

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass
