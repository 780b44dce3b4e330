"""Training metrics logging: JSONL + optional TensorBoard events.

Parity with the reference's TensorBoard observability
(`/root/reference/src/train_lib.py:291-617`): scalar metrics per step/epoch.
JSONL is the primary machine-readable artifact; TensorBoard event files are
written when TensorFlow is importable (it is not required).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:  # noqa: BLE001 - TB is best-effort
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))
                self._tb.flush()

    def write_image(self, step: int, tag: str, image) -> None:
        """Write an HWC uint8 image summary (TensorBoard when available).

        Parity with the reference's TB image suites
        (`train_lib.py:291-617`); PNG fallbacks are handled by the caller.
        """
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        img = np.asarray(image)[None]
        with self._tb.as_default():
            tf.summary.image(tag, img, step=int(step))
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
