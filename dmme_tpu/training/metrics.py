"""Scalar/image metric logging front-end.

``MetricLogger`` is what the fit loop talks to: it composes the pluggable
backends in :mod:`dmme_tpu.training.loggers` (JSONL always when a log_dir is
given; real TensorBoard event files on request — written by the in-repo
dependency-free encoder; W&B when installed) and echoes to stderr. Metric
arrays are fetched with ``jax.device_get`` only at log boundaries so the
training loop never blocks on per-step transfers.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Dict, Optional, Sequence


class MetricLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        name: str = "metrics",
        tensorboard: bool = False,
        loggers: Optional[Sequence[Any]] = None,
    ):
        """``loggers`` overrides the default backend choice entirely; else
        JSONL (if log_dir) + TensorBoard (if requested) are attached."""
        from dmme_tpu.training.loggers import (
            JsonlLogger,
            MultiLogger,
            TensorBoardLogger,
        )

        if loggers is None:
            loggers = []
            if log_dir is not None:
                loggers.append(JsonlLogger(log_dir, name))
                if tensorboard:
                    loggers.append(TensorBoardLogger(log_dir + "/tb"))
        self._multi = MultiLogger(loggers)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any], echo: bool = True) -> None:
        record = {}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        self._multi.log_metrics(record, step)
        if echo:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            )
            print(f"[step {step}] time={time.time() - self._t0:.3f} {parts}",
                  file=sys.stderr)

    def log_image(self, tag: str, image, step: int) -> None:
        self._multi.log_image(tag, image, step)

    def close(self) -> None:
        self._multi.finalize()
