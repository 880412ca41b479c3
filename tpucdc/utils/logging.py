"""Metric logging: JSONL always, clu/TensorBoard when available
(SURVEY.md C24, §5.5 — every eval emits rows BASELINE.md can be regenerated
from)."""

from __future__ import annotations

import json
import pathlib
import sys
import time
from typing import Any, Optional


class MetricLogger:
    """step-keyed metric writer: JSONL file + optional clu summary writer +
    stderr echo. Callable as ``writer(step, metrics_dict)`` (the signature
    pipelines.train.fit expects)."""

    def __init__(self, logdir: str | pathlib.Path,
                 use_clu: bool = True, echo: bool = True):
        self.logdir = pathlib.Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "metrics.jsonl", "a", buffering=1)
        self._echo = echo
        self._clu = None
        if use_clu:
            try:
                from clu import metric_writers
                self._clu = metric_writers.SummaryWriter(str(self.logdir))
            except Exception:
                self._clu = None

    def __call__(self, step: int, metrics: dict[str, Any]) -> None:
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()
                    if isinstance(v, (int, float))})
        self._jsonl.write(json.dumps(row) + "\n")
        if self._clu is not None:
            self._clu.write_scalars(
                step, {k: v for k, v in row.items()
                       if k not in ("step", "time")})
        if self._echo:
            parts = " ".join(f"{k}={v:.4g}" for k, v in row.items()
                             if k not in ("step", "time"))
            print(f"[step {step}] {parts}", file=sys.stderr)

    def write_row(self, row: dict) -> None:
        """Free-form JSONL row (eval results)."""
        self._jsonl.write(json.dumps(row, default=float) + "\n")

    def close(self):
        self._jsonl.close()
        if self._clu is not None:
            self._clu.close()
