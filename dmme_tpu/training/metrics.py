"""Scalar metric logging — async-friendly host writer.

Replaces the reference's W&B/TensorBoard logging (``self.log`` +
WandbLogger) with a dependency-free JSONL writer + stdout echo. Metric
arrays are fetched with ``jax.device_get`` only at log boundaries so the
training loop never blocks on per-step transfers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        name: str = "metrics",
        tensorboard: bool = False,
    ):
        self._file = None
        self._tb = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
            if tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(
                        os.path.join(log_dir, "tb")
                    )
                except Exception:
                    self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any], echo: bool = True) -> None:
        record = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in record.items():
                    if k not in ("step", "time") and isinstance(v, float):
                        tf.summary.scalar(k, v, step=step)
            self._tb.flush()
        if echo:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
                if k != "step"
            )
            print(f"[step {step}] {parts}", file=sys.stderr)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
